"""EAGLE-1/2 draft-head training — the legacy single-step objective.

Parity with the reference's accelerate/DeepSpeed trainers
(`EAGLE-3H/eagle/train/main.py:50-469`, `main_deepspeed.py`): the head
predicts the target's NEXT hidden state from (token embedding, current
hidden); losses are

  vloss = SmoothL1(predicted_hidden, target_hidden_next)      (:~270)
  ploss = soft cross-entropy between head(predicted_hidden) and
          head(target_hidden_next) distributions
  total = v_w * vloss + p_w * ploss   (defaults v_w=1.0, p_w=0.1)

Distribution/optimizer/checkpointing reuse the EAGLE-3 trainer's SPMD stack
(train/eagle3.py): optax AdamW, mesh data axis, orbax.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..engine.kvcache import init_cache
from ..models import transformer
from ..models.eagle import EagleConfig, EagleParams, head_forward, init_eagle_kv
from ..ops.linear import apply_linear
from .eagle3 import TrainConfig, TrainState, _merge, _split_trainable, make_optimizer


def smooth_l1(x, y, beta: float = 1.0):
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def eagle1_loss(ecfg: EagleConfig, params: EagleParams, hidden: jax.Array,
                input_ids: jax.Array, loss_mask: jax.Array,
                v_w: float = 1.0, p_w: float = 0.1):
    """hidden: [B, T, D] target final hidden states; input_ids [B, T];
    the head consumes (emb(ids_{t+1}), hidden_t) and must predict
    hidden_{t+1} (the standard EAGLE-1 shift)."""
    B, T, D = hidden.shape
    emb = jnp.take(params.embed, input_ids, axis=0).astype(ecfg.dtype)
    # pair (emb of token t+1, hidden t) -> predict hidden t+1
    emb_in = emb[:, 1:]
    hid_in = hidden[:, :-1].astype(ecfg.dtype)
    target_h = jax.lax.stop_gradient(hidden[:, 1:])
    kv = init_eagle_kv(ecfg, B, T)
    pos = jnp.broadcast_to(jnp.arange(T - 1)[None, :], (B, T - 1))
    out, _ = head_forward(ecfg, params, emb_in, hid_in, kv, pos)

    m = loss_mask[:, 1:, None]
    vloss = jnp.sum(smooth_l1(out.astype(jnp.float32),
                              target_h.astype(jnp.float32)) * m) \
        / (jnp.sum(m) * D + 1e-6)
    logits_pred = apply_linear(params.lm_head, out).astype(jnp.float32)
    logits_tgt = apply_linear(params.lm_head,
                              target_h.astype(ecfg.dtype)).astype(jnp.float32)
    tgt_p = jax.lax.stop_gradient(jax.nn.softmax(logits_tgt, -1))
    ploss = -jnp.sum(tgt_p * jax.nn.log_softmax(logits_pred, -1), -1)
    ploss = jnp.sum(ploss * loss_mask[:, 1:]) / (jnp.sum(loss_mask[:, 1:]) + 1e-6)
    acc = jnp.sum((jnp.argmax(logits_pred, -1) == jnp.argmax(logits_tgt, -1))
                  * loss_mask[:, 1:]) / (jnp.sum(loss_mask[:, 1:]) + 1e-6)
    metrics = {"vloss": vloss, "ploss": ploss, "acc": acc}
    # per-step top-k probes (ref main.py:345-379 top_3acc logging)
    from .probes import top_k_accuracy
    metrics.update(top_k_accuracy(logits_pred, logits_tgt, loss_mask[:, 1:]))
    return v_w * vloss + p_w * ploss, metrics


def make_eagle1_train_step(cfg_t: ModelConfig, ecfg: EagleConfig,
                           tc: TrainConfig, v_w: float = 1.0,
                           p_w: float = 0.1, zero_mesh=None):
    """Jitted SPMD train step for the legacy head: (state, params_target,
    input_ids, loss_mask) -> (state, metrics). zero_mesh: ZeRO-equivalent
    optimizer-state sharding over the mesh data axis (train/eagle3.py
    zero_opt_shardings)."""
    from .eagle3 import zero_opt_shardings

    opt = make_optimizer(tc)

    def step(state: TrainState, params_t, input_ids, loss_mask):
        if zero_mesh is not None:
            state = state._replace(opt_state=jax.lax.with_sharding_constraint(
                state.opt_state, zero_opt_shardings(state.opt_state,
                                                    zero_mesh)))
        B, T = input_ids.shape
        cache = init_cache(cfg_t, B, T)
        _, _, hidden = transformer.forward(cfg_t, params_t, input_ids, cache,
                                           feature_layers=(-1,))
        hidden = jax.lax.stop_gradient(hidden)
        trainable, frozen = _split_trainable(state.params)

        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            return eagle1_loss(ecfg, params, hidden, input_ids, loss_mask,
                               v_w, p_w)

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

    return jax.jit(step)


def make_eagle1_train_step_offline(cfg_t: ModelConfig, ecfg: EagleConfig,
                                   tc: TrainConfig, v_w: float = 1.0,
                                   p_w: float = 0.1):
    """Offline-features EAGLE-1 step (the reference's ORIGINAL training
    mode: CustomDataset pre-dumped hidden states, train/main.py:133-172):
    (state, params_t_ignored, *, input_ids, loss_mask, hidden) ->
    (state, metrics) — no target forward in the step."""
    opt = make_optimizer(tc)

    def step(state: TrainState, params_t, *, input_ids, loss_mask, hidden):
        del params_t
        hidden = jax.lax.stop_gradient(hidden.astype(jnp.float32))
        trainable, frozen = _split_trainable(state.params)

        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            return eagle1_loss(ecfg, params, hidden, input_ids, loss_mask,
                               v_w, p_w)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = opt.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics["loss"] = loss
        return TrainState(params=_merge(trainable, frozen),
                          opt_state=opt_state, step=state.step + 1), metrics

    return jax.jit(step)
