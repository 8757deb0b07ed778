"""EAGLE-3 draft-head training — TPU-native re-design of the reference's
DeepSpeed pipeline (`EAGLE-3H/eagle/traineagle3/`):

  * frozen target forward produces the 3-layer feature stream + soft targets
    (dataprepare, traineagle3/cnets.py:691-709);
  * the head trains through `length` (default 7) chained prediction steps: at
    step s the attention sees the step-0 keys causally (with s banned
    diagonals) plus the position-aligned keys of steps 1..s-1, exactly the
    reference's cache_hidden attention (traineagle3/cnets.py:243-322);
  * per-step soft cross-entropy against the target distribution restricted to
    the draft vocabulary via d2t/t2d (traineagle3/cnets.py:762-841);
  * distribution: SPMD data parallelism — batches sharded over the mesh
    `data` axis; gradient averaging is the pjit-inserted all-reduce (replaces
    DeepSpeed ZeRO-2 / NCCL, traineagle3/main.py:213-221);
  * optimizer: optax AdamW + linear-warmup cosine decay (replaces
    WarmupDecayLR); checkpoint/auto-resume via orbax (replaces
    save_16bit_model / find_max_state_with_file, main.py:239-347).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..engine.kvcache import init_cache
from ..models import transformer
from ..models.eagle import EagleConfig, EagleParams, _rms
from ..ops.linear import apply_linear


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    steps: int = 7            # chained prediction depth (self.length)
    lr: float = 5e-5
    warmup_steps: int = 2000
    total_steps: int = 100_000
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 0.5
    max_len: int = 2048


class TrainState(NamedTuple):
    params: EagleParams
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tc.lr, tc.warmup_steps, tc.total_steps)
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(sched, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay),
    )


def init_train_state(params: EagleParams, tc: TrainConfig,
                     zero_mesh=None) -> TrainState:
    """zero_mesh: when given, the Adam moment pytree is laid out with
    ZeRO-equivalent shardings over the mesh `data` axis (see
    zero_opt_shardings) instead of replicated."""
    opt = make_optimizer(tc)
    trainable, _ = _split_trainable(params)
    opt_state = opt.init(trainable)
    if zero_mesh is not None:
        opt_state = jax.device_put(opt_state,
                                   zero_opt_shardings(opt_state, zero_mesh))
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.int32(0))


def zero_opt_shardings(opt_state, mesh, axis: str = "data"):
    """ZeRO-equivalent optimizer-state shardings (SURVEY §2.5: the TPU-native
    replacement for DeepSpeed ZeRO-2, ref traineagle3/main.py:213-221 +
    train/ds_config.json "stage": 2).

    For each moment/leaf, shard the LARGEST dim divisible by the data-axis
    size over `data`; scalars and indivisible leaves replicate. With the
    train step's output constrained to these shardings, XLA partitions the
    optimizer elementwise update across the data axis and inserts the
    reduce-scatter (grads -> moment shards) + all-gather (param update) that
    DeepSpeed implements by hand — each device holds 1/N of the Adam state.
    Only shapes are consulted, so this works on traced values too."""
    from jax.sharding import NamedSharding, PartitionSpec

    n = mesh.shape[axis]

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        best, best_d = 0, None
        for d, s in enumerate(shape):
            if s % n == 0 and s > best:
                best, best_d = s, d
        spec = [None] * len(shape)
        if best_d is not None and n > 1:
            spec[best_d] = axis
        return NamedSharding(mesh, PartitionSpec(*spec))

    return jax.tree.map(leaf, opt_state)


def _split_trainable(params: EagleParams):
    """embed/d2t/t2d are frozen buffers (ref: cnets.py:24 requires_grad off)."""
    frozen_names = {"embed", "d2t", "t2d"}
    trainable = {k: v for k, v in params._asdict().items()
                 if k not in frozen_names}
    frozen = {k: v for k, v in params._asdict().items() if k in frozen_names}
    return trainable, frozen


def _merge(trainable: dict, frozen: dict) -> EagleParams:
    return EagleParams(**{**trainable, **frozen})


def multi_step_head_loss(ecfg: EagleConfig, params: EagleParams,
                         features: jax.Array, target_logits: jax.Array,
                         input_ids: jax.Array, loss_mask: jax.Array,
                         steps: int) -> Tuple[jax.Array, dict]:
    """The reference's multi-step training forward (traineagle3/cnets.py:
    713-850), functional.

    features: [B, T, 3*Dt] target feature stream (positions 0..T-1);
    target_logits: [B, T, V] target logits ALREADY shifted left by one
      (dataprepare's padding(left=False));
    input_ids: [B, T] tokens shifted left by one;
    loss_mask: [B, T].
    """
    B, T, _ = features.shape
    D = ecfg.hidden_size
    H, Hkv, hd = ecfg.num_heads, ecfg.num_kv_heads, ecfg.head_dim
    Vd = ecfg.draft_vocab_size

    hidden = apply_linear(params.fc, features.astype(ecfg.dtype))
    # draft-vocab gather indices: target id of draft slot j is j + d2t[j]
    dv_ids = jnp.arange(Vd, dtype=jnp.int32) + params.d2t

    causal = jnp.tril(jnp.ones((T, T), bool))
    pos = jnp.arange(T)[None, :]

    def rope(x, positions):
        freqs = 1.0 / (ecfg.rope_theta **
                       (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
        ang = positions[..., None].astype(jnp.float32) * freqs
        cos, sin = jnp.cos(ang)[:, :, None, :], jnp.sin(ang)[:, :, None, :]
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, -1)
        return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                               -1).astype(x.dtype)

    cache_k, cache_v = [], []
    losses, accs = [], []
    ids, tgt, lm = input_ids, target_logits, loss_mask
    mask0 = causal

    for s in range(steps):
        emb = jnp.take(params.embed, ids, axis=0).astype(ecfg.dtype)
        x = jnp.concatenate([_rms(emb, params.ln_input, ecfg.rms_norm_eps),
                             _rms(hidden, params.ln_hidden, ecfg.rms_norm_eps)],
                            -1)
        q = apply_linear(params.wq, x).reshape(B, T, H, hd)
        k = apply_linear(params.wk, x).reshape(B, T, Hkv, hd)
        v = apply_linear(params.wv, x).reshape(B, T, Hkv, hd)
        q = rope(q, pos + s)
        k = rope(k, pos + s)
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        cache_k.append(k)
        cache_v.append(v)

        # scores vs step-0 keys (full causal-with-banned-diagonals)...
        s0 = jnp.einsum("bthd,bshd->bhts", q, cache_k[0],
                        preferred_element_type=jnp.float32) * hd ** -0.5
        s0 = jnp.where(mask0[None, None], s0, -1e30)
        cols = [s0]
        # ...plus position-aligned keys of steps 1..s
        for i in range(1, s + 1):
            si = jnp.sum(q * cache_k[i], axis=-1) * hd ** -0.5   # [B, T, H]
            cols.append(jnp.swapaxes(si, 1, 2)[..., None])       # [B, H, T, 1]
        scores = jnp.concatenate(cols, axis=-1)
        w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
        att = jnp.einsum("bhts,bshd->bthd", w[..., :T], cache_v[0])
        for i in range(1, s + 1):
            wi = jnp.swapaxes(w[..., T + i - 1], 1, 2)           # [B, T, H]
            att = att + wi[..., None] * cache_v[i]
        out = hidden + apply_linear(params.wo, att.reshape(B, T, H * hd))
        h2 = _rms(out, params.ln_post, ecfg.rms_norm_eps)
        out = out + apply_linear(params.wdown,
                                 jax.nn.silu(apply_linear(params.wgate, h2))
                                 * apply_linear(params.wup, h2))

        logits = apply_linear(params.lm_head,
                              _rms(out, params.norm, ecfg.rms_norm_eps))
        logits = logits.astype(jnp.float32)

        tgt_f = jax.lax.stop_gradient(tgt.astype(jnp.float32))
        tgt_max = jnp.argmax(tgt_f, -1)
        in_draft = params.t2d[tgt_max]
        pmask = (in_draft & (lm > 0)).astype(jnp.float32)
        tgt_draft = jnp.take(tgt_f, dv_ids, axis=-1)
        tgt_p = jax.nn.softmax(tgt_draft, -1)
        logp = jax.nn.log_softmax(logits, -1)
        loss = -jnp.mean(jnp.sum(tgt_p * logp, -1) * pmask)
        losses.append(loss)
        acc = jnp.sum((jnp.argmax(logits, -1) == jnp.argmax(tgt_p, -1))
                      * pmask) / (jnp.sum(lm) + 1e-6)
        accs.append(acc)
        if s == 0:
            # top-k probes on the first step's logits (the engine's
            # first-draft position; ref main.py:345-379)
            from .probes import top_k_accuracy
            topk = top_k_accuracy(logits, tgt_draft, pmask)

        if s != steps - 1:
            hidden = out
            # shift stream left by one (padding(left=False))
            ids = jnp.concatenate([ids[:, 1:], jnp.zeros((B, 1), ids.dtype)], 1)
            tgt = jnp.concatenate([tgt[:, 1:], jnp.zeros_like(tgt[:, :1])], 1)
            lm = jnp.concatenate([lm[:, 1:], jnp.zeros_like(lm[:, :1])], 1)
            # ban one more diagonal (traineagle3/cnets.py:845-849)
            i0 = jnp.arange(T - s)
            mask0 = mask0.at[i0 + s, i0].set(False)

    metrics = {f"ploss_{i}": l for i, l in enumerate(losses)}
    metrics.update({f"acc_{i}": a for i, a in enumerate(accs)})
    metrics.update(topk)
    return sum(losses), metrics


def make_train_step(cfg_t: ModelConfig, ecfg: EagleConfig, tc: TrainConfig,
                    feature_layers: Tuple[int, int, int],
                    zero_mesh=None):
    """Jitted SPMD train step: (state, params_target, input_ids, loss_mask)
    -> (state, metrics). Shard input_ids/loss_mask over the mesh `data` axis;
    replicated head params => pjit inserts the gradient all-reduce.

    zero_mesh: enable ZeRO-equivalent optimizer-state sharding — the Adam
    moments stay sharded over `data` across steps (constraints on both the
    incoming and outgoing opt_state; pair with
    init_train_state(..., zero_mesh=...))."""
    opt = make_optimizer(tc)

    def step(state: TrainState, params_t, input_ids, loss_mask):
        if zero_mesh is not None:
            state = state._replace(opt_state=jax.lax.with_sharding_constraint(
                state.opt_state, zero_opt_shardings(state.opt_state,
                                                    zero_mesh)))
        B, T = input_ids.shape
        cache = init_cache(cfg_t, B, T)
        logits, _, feats = transformer.forward(
            cfg_t, params_t, input_ids, cache, feature_layers=feature_layers)
        logits = jax.lax.stop_gradient(logits)
        feats = jax.lax.stop_gradient(feats)
        # shift left (dataprepare padding(left=False))
        tgt = jnp.concatenate([logits[:, 1:], jnp.zeros_like(logits[:, :1])], 1)
        ids = jnp.concatenate([input_ids[:, 1:],
                               jnp.zeros_like(input_ids[:, :1])], 1)

        trainable, frozen = _split_trainable(state.params)

        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            loss, metrics = multi_step_head_loss(
                ecfg, params, feats, tgt, ids, loss_mask, tc.steps)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = opt.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if zero_mesh is not None:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, zero_opt_shardings(opt_state, zero_mesh))
        new_state = TrainState(params=_merge(trainable, frozen),
                               opt_state=opt_state, step=state.step + 1)
        metrics["loss"] = loss
        return new_state, metrics

    return jax.jit(step)


def make_train_step_offline(cfg_t: ModelConfig, ecfg: EagleConfig,
                            tc: TrainConfig, zero_mesh=None):
    """Offline-features train step (ref CustomDataset mode,
    train/main.py:133-172): consumes PRE-DUMPED target features + logits
    (train/features.py) — NO target forward in the step. Signature matches
    train_loop's dict-batch splat:
    (state, params_t_ignored, *, input_ids, loss_mask, features,
    target_logits) -> (state, metrics). Shifting is identical to the online
    step so online/offline training trajectories agree given equal data."""
    opt = make_optimizer(tc)

    def step(state: TrainState, params_t, *, input_ids, loss_mask,
             features, target_logits):
        del params_t
        if zero_mesh is not None:
            state = state._replace(opt_state=jax.lax.with_sharding_constraint(
                state.opt_state, zero_opt_shardings(state.opt_state,
                                                    zero_mesh)))
        logits = jax.lax.stop_gradient(target_logits)
        feats = jax.lax.stop_gradient(features)
        tgt = jnp.concatenate([logits[:, 1:], jnp.zeros_like(logits[:, :1])], 1)
        ids = jnp.concatenate([input_ids[:, 1:],
                               jnp.zeros_like(input_ids[:, :1])], 1)
        trainable, frozen = _split_trainable(state.params)

        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            return multi_step_head_loss(ecfg, params, feats, tgt, ids,
                                        loss_mask, tc.steps)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = opt.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if zero_mesh is not None:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, zero_opt_shardings(opt_state, zero_mesh))
        metrics["loss"] = loss
        return TrainState(params=_merge(trainable, frozen),
                          opt_state=opt_state, step=state.step + 1), metrics

    return jax.jit(step, static_argnames=())


def save_checkpoint(path: str, state: TrainState):
    """Orbax checkpointing (replaces DeepSpeed save_16bit_model /
    save_checkpoint, traineagle3/main.py:345-347)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(f"{path}/state_{int(state.step)}", state)
    ckptr.wait_until_finished()


def latest_checkpoint_step(path: str) -> Optional[int]:
    """Auto-resume discovery (replaces find_max_state_with_file,
    traineagle3/main.py:239-258)."""
    import os
    import re

    if not os.path.isdir(path):
        return None
    best = None
    for d in os.listdir(path):
        m = re.fullmatch(r"state_(\d+)", d)
        if m:
            best = max(best or 0, int(m.group(1)))
    return best


def restore_checkpoint(path: str, step: int, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(f"{path}/state_{step}", template)
