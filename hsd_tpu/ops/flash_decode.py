"""Flash-decode attention: online-softmax GQA over the static KV cache.

Original (REFUTED) hypothesis: that XLA materializes the [Hkv, rep, T, S]
fp32 score tensor for the grouped einsum in models/transformer._attention in
HBM every layer, leaving decode-slope headroom for a hand-written streaming
kernel. Measurement says otherwise: XLA's fused attention never spills the
score tensor (its decode slope is T-independent and near the KV-read floor
— see use_flash() and the docs/BENCHMARKS.md long-context table), so there
is no HBM traffic for this kernel to save and it LOSES 3-13% to the einsum
path at 1k-4k cache lengths. The kernel is kept as a measured, parity-tested
opt-in (HSD_TPU_FLASH_DECODE=always) and as the base for regimes XLA handles
poorly (paged / non-contiguous caches). Mechanically it streams the cache
ONCE: grid over S blocks, queries + running (max, denom, accumulator)
resident in VMEM, standard flash online-softmax rescaling per block — no
score tensor ever touches HBM.

Design notes (TPU-first, not a port — the reference has no attention kernel
at all; its models run stock torch SDPA over a reallocated cache,
EAGLE-3H/eagle/model/modeling_llama_kv.py):
  * K/V stay in the engine cache layout [S, Hkv*d]: blocks of [Sb, Hkv*d]
    are CONTIGUOUS rows, so the DMA runs at full stride; per-head slices
    happen in VMEM.
  * GQA without repeat: queries are regrouped to [Hkv, rep*T, d]; each kv
    head's scores are one MXU dot [rep*T, d] x [d, Sb].
  * Tree attention (EAGLE tries / striped drafts) folds in exactly like the
    dense path: the [T, T] additive bias lands on cache slots
    [kv_len, kv_len+T); inside the kernel the column gather is an MXU dot
    with a one-hot matrix (VPU gathers are the thing to avoid).
  * Masking is index-based (key_pos <= q_index, >= start), so block-padding
    garbage past S never reaches the softmax.

Matches _attention's numerics: fp32 scores/softmax, probabilities cast to
the query dtype for the PV matmul (same cast the einsum path does).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(qidx_ref, scal_ref, q_ref, k_ref, v_ref, bias_ref, rope_ref,
            o_ref, m_ref, l_ref, acc_ref, *, Sb, Hkv, rT, d, T, scale,
            has_bias, has_rope):
    s = pl.program_id(0)
    n_s = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kblk = k_ref[:].reshape(Sb, Hkv, d)
    vblk = v_ref[:].reshape(Sb, Hkv, d)
    kpos = s * Sb + jax.lax.broadcasted_iota(jnp.int32, (1, Sb), 1)
    start = scal_ref[0]
    kv_len = scal_ref[1]
    s_max = scal_ref[2]
    # scrub the ragged last block: grid padding past S may read arbitrary
    # bits, and 0 * NaN in the PV matmul would poison the accumulator
    inb = (kpos[0][:, None] < s_max)
    vblk = jnp.where(inb[:, :, None], vblk, 0)
    valid = (kpos <= qidx_ref[:]) & (kpos >= start)        # [rT, Sb]

    if has_bias:
        # bias columns via one-hot MXU dot: biasblk[r, s] =
        # bias_rows[r, kpos[s]-kv_len] for kpos in the self block, else 0
        j = kpos - kv_len                                   # [1, Sb]
        tids = jax.lax.broadcasted_iota(jnp.int32, (T, Sb), 0)
        onehot = (tids == j).astype(jnp.float32)            # [T, Sb]
        biasblk = jax.lax.dot_general(
            bias_ref[:], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [rT, Sb]
    else:
        biasblk = None

    for h in range(Hkv):
        qh = q_ref[h]                                       # [rT, d]
        if has_rope:
            # rotate-half RoPE on the RAW queries in-kernel (the ~6
            # elementwise XLA ops per layer were pure launch overhead in
            # the small-op-bound decode regime); rope_ref rows: 0 =
            # full-d cos, 1 = full-d sin, both already tiled to [rT, d]
            cosr = rope_ref[0]
            sinr = rope_ref[1]
            half = d // 2
            rot = jnp.concatenate([-qh[:, half:], qh[:, :half]], axis=-1)
            qh = qh * cosr + rot * sinr
        scores = jax.lax.dot_general(
            qh, kblk[:, h, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [rT, Sb]
        if biasblk is not None:
            scores = scores + biasblk
        scores = jnp.where(valid, scores, _NEG)
        m_old = m_ref[h]                                    # [rT, 1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)                      # [rT, 1]
        # explicit zero where invalid: an all-masked row keeps m == -1e30,
        # where exp(scores - m) would be exp(0) == 1 for every position
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [rT, Sb]
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vblk.dtype), vblk[:, h, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [rT, d]
        acc_ref[h] = acc_ref[h] * alpha + pv
        m_ref[h] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _flash_core(q, k, v, q_index, start, kv_length, attn_bias,
                rope=None, block_s: int = 512, interpret: bool = False):
    """Single-sequence core. q [T, H, d]; k,v [S, Hkv, d]; q_index [T];
    start, kv_length scalars; attn_bias [T, T] or None. Returns [T, H, d]
    float32.

    DIVERGENCE on fully-masked query rows (q_index < start — no valid key):
    the kernel outputs ZEROS (acc / max(l, 1e-30) with l == 0), while the
    einsum path's softmax over all -1e30 scores yields the uniform mean of V.
    Unreachable from current decode call sites (q_index >= start always
    holds); pinned by tests/test_flash_decode.py::test_fully_masked_row so a
    future caller with padded rows hits it deliberately."""
    T, H, d = q.shape
    S, Hkv = k.shape[0], k.shape[1]
    rep = H // Hkv
    rT = rep * T
    Sb = min(block_s, S)
    n_s = pl.cdiv(S, Sb)
    scale = d ** -0.5

    # [T, Hkv, rep, d] -> [Hkv, rep*T, d]; row r*T + t <-> (head kv*rep+r, t)
    qg = q.reshape(T, Hkv, rep, d).transpose(1, 2, 0, 3).reshape(Hkv, rT, d)
    qidx = jnp.tile(q_index.astype(jnp.int32), rep)[:, None]       # [rT, 1]
    scal = jnp.stack([start.astype(jnp.int32),
                      kv_length.astype(jnp.int32),
                      jnp.int32(S)])
    has_bias = attn_bias is not None
    bias_rows = (jnp.tile(attn_bias.astype(jnp.float32), (rep, 1))
                 if has_bias else jnp.zeros((rT, 1), jnp.float32))
    Tb = attn_bias.shape[1] if has_bias else 1
    has_rope = rope is not None
    if has_rope:
        cos, sin = rope           # [T, d/2] each (per-position half tables)
        full = lambda t: jnp.concatenate([t, t], axis=-1)    # [T, d]
        # row r*T + t of qg carries query position t
        rope_rows = jnp.stack([jnp.tile(full(cos), (rep, 1)),
                               jnp.tile(full(sin), (rep, 1))])  # [2, rT, d]
        rope_rows = rope_rows.astype(jnp.float32)
    else:
        rope_rows = jnp.zeros((2, rT, d), jnp.float32)

    kernel = functools.partial(
        _kernel, Sb=Sb, Hkv=Hkv, rT=rT, d=d, T=Tb, scale=scale,
        has_bias=has_bias, has_rope=has_rope)
    out = pl.pallas_call(
        kernel,
        grid=(n_s,),
        in_specs=[
            pl.BlockSpec((rT, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3,), lambda s: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Hkv, rT, d), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sb, Hkv * d), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sb, Hkv * d), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rT, Tb), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, rT, d), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Hkv, rT, d), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hkv, rT, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Hkv, rT, 1), jnp.float32),   # running max
            pltpu.VMEM((Hkv, rT, 1), jnp.float32),   # running denom
            pltpu.VMEM((Hkv, rT, d), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(qidx, scal, qg, k.reshape(S, Hkv * d), v.reshape(S, Hkv * d),
      bias_rows, rope_rows)
    # [Hkv, rep*T, d] -> [T, H, d]
    return out.reshape(Hkv, rep, T, d).transpose(2, 0, 1, 3).reshape(T, H, d)


FLASH_DECODE = os.environ.get("HSD_TPU_FLASH_DECODE", "auto")
FUSED_ATTN = os.environ.get("HSD_TPU_FUSED_ATTN", "auto")


def use_fused_rope_attn(B, T, d, S) -> bool:
    """Route the decode layer to the rope-fused attention kernel.

    Unlike the attention-only kernel (use_flash — measured 0.87-0.97x XLA
    at 1k-4k cache lengths, traffic-bound), the rope-fused form targets
    the SHORT-cache launch-bound regime: it additionally absorbs the ~6
    elementwise rope(q) launches per layer. Gated off in 'auto' until the
    e2e decode measurement says otherwise; 'always' enables for the
    supported decode shapes (single row, small T, head_dim 64/128)."""
    if FUSED_ATTN == "never" or FLASH_DECODE == "always":
        return False
    ok = (B == 1 and T <= 16 and d in (64, 128) and S >= 128)
    if FUSED_ATTN == "always":
        return ok
    return False


def use_flash(q, k) -> bool:
    """Route decode-regime attention (small T, large S) to the kernel.

    MEASURED NEGATIVE RESULT (docs/BENCHMARKS.md, long-context table): on
    v5e the kernel is 0.87-0.97x XLA's grouped einsum at BOTH T=1 and T=11
    across 1k-4k cache lengths — XLA's fused attention never materializes
    the [.., T, S] score tensor in HBM (its measured slope is T-independent,
    ~0.42 ms/1k slots), so there is no traffic for a hand-written kernel to
    save and per-block launch + small-op latency loses. 'auto' therefore
    routes NOTHING; the kernel stays as a measured, parity-tested opt-in
    (HSD_TPU_FLASH_DECODE=always — interpret mode off-TPU, the CPU-mesh
    test hook) and as the base for future regimes XLA handles poorly
    (e.g. paged / non-contiguous caches)."""
    mode = FLASH_DECODE
    if mode != "always":
        return False
    d = q.shape[-1]
    return (q.shape[1] <= 128 and d in (64, 128)
            and k.shape[3] == d and k.shape[1] >= 128
            and q.shape[0] == 1)


def flash_attention_decode(q, k, v, q_index, kv_length, start, attn_bias,
                           rope=None, block_s: int = 512):
    """Drop-in for models.transformer._attention on the decode path.

    q [B, T, H, d]; k, v [B, S, Hkv, d]; q_index [B, T]; start [B];
    kv_length scalar. rope: optional (cos, sin) tables [B, T, 1, d/2]
    (models.transformer._rope_tables layout) — when given, q arrives RAW
    and rotate-half RoPE applies IN-KERNEL, collapsing the per-layer
    elementwise rope chain into the attention launch (decode is small-op
    launch-bound; NEXT.md r4 item 1). Returns [B, T, H, d] in q.dtype."""
    interp = jax.default_backend() != "tpu"
    core = functools.partial(_flash_core, block_s=block_s, interpret=interp)
    bias = attn_bias
    if rope is None:
        out = jax.vmap(
            lambda qq, kk, vv, qi, st: core(qq, kk, vv, qi, st,
                                            jnp.asarray(kv_length), bias)
        )(q, k, v, q_index, start)
    else:
        cos, sin = rope[0][:, :, 0, :], rope[1][:, :, 0, :]  # [B, T, d/2]
        out = jax.vmap(
            lambda qq, kk, vv, qi, st, cc, ss: core(
                qq, kk, vv, qi, st, jnp.asarray(kv_length), bias,
                rope=(cc, ss))
        )(q, k, v, q_index, start, cos, sin)
    return out.astype(q.dtype)
