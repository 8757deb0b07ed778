"""Linear layers: dense or GPTQ weight-only quantized.

The reference consumes GPTQ-INT8 checkpoints through auto-gptq's CUDA kernels
as a black box (SURVEY.md §2.6). Here quantized matmul is a first-class
citizen: weights are a `QuantizedLinear` pytree (int8/int4 codes + per-group
scales/zeros) that drops into the same `apply_linear` call sites as dense
arrays — including under `lax.scan` over stacked layers.

Two execution paths:
  * XLA path (below): dequantize fused into the matmul by XLA;
  * Pallas path (ops/gptq_pallas.py): hand-fused dequant+matmul tuned for the
    memory-bound decode regime, selected for supported shapes on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """GPTQ-style weight-only quantization of a [in, out] matmul.

    qweight: [in, out] int8 codes, OR [in/2, out] uint8 nibble-packed int4
             (the uint8 container dtype IS the 4-bit marker: byte i packs the
             signed codes of input rows 2i (low nibble) and 2i+1 (high
             nibble) — adjacent rows share a quantization group, so both
             nibbles of a byte use the same scale/zero)
    scales:  [groups, out]; group g covers input rows [g*gs, (g+1)*gs)
    zeros:   [groups, out] float zero-points (asymmetric) or None (symmetric)
    perm:    [in] int32 input permutation or None. desc_act (act-order) GPTQ
             checkpoints assign rows to groups non-contiguously via g_idx;
             the loader re-sorts rows so groups ARE contiguous and records
             the sort here. apply_linear gathers the activations
             (x[..., perm]) before the matmul — a [in]-gather per call,
             negligible next to the weight stream — so every kernel below
             sees the plain contiguous-group layout.

    Matches the GPTQ checkpoint format: per-group scales/zeros along the
    in-features axis, group_size = in // groups (typically 128).
    """

    qweight: jax.Array
    scales: jax.Array
    zeros: Optional[jax.Array]
    perm: Optional[jax.Array] = None

    @property
    def packed_int4(self) -> bool:
        return self.qweight.dtype == jnp.uint8

    @property
    def din(self) -> int:
        n = self.qweight.shape[-2]
        return 2 * n if self.packed_int4 else n


def pack_int4(codes: jax.Array) -> jax.Array:
    """Pack signed int4 codes [in, out] (values in [-8, 7]) into uint8
    [in/2, out] with SPLIT-HALF pairing: low nibble = row i, high nibble =
    row i + in/2.

    Split-half (not adjacent 2i/2i+1) so the hot kernel's activation planes
    are the CONTIGUOUS halves x[:, :in/2] / x[:, in/2:] — the measured
    stride-2 deinterleave cost ~15us/call and dropped the kernel from
    ~600-730 to ~480 GB/s. Each nibble plane also spans whole quantization
    groups (lo: groups [0, G/2), hi: [G/2, G)) whenever G is even, so the
    kernel slices one scale block per plane. Nibbles are stored UNSIGNED
    (code+8, range 0..15); the uniform -8 shift rides the rank-1 zero
    correction outside the kernel."""
    din = codes.shape[0]
    assert din % 2 == 0, din
    half = din // 2
    lo = (codes[:half].astype(jnp.int32) + 8) & 0xF
    hi = (codes[half:].astype(jnp.int32) + 8) & 0xF
    return ((hi << 4) | lo).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: uint8 [in/2, out] -> signed int8 codes [in, out]
    (lo nibbles = first half rows, hi nibbles = second half)."""
    b = packed.astype(jnp.int32)
    lo = (b & 0xF) - 8
    hi = (b >> 4) - 8
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def quantize(w: jax.Array, bits: int = 8, group_size: int = 128,
             symmetric: bool = False) -> QuantizedLinear:
    """Quantize a dense [in, out] weight to GPTQ-style codes (round-to-nearest;
    used for tests and synthetic benchmarks — real GPTQ checkpoints load their
    own codes via models/loader.py)."""
    din, dout = w.shape
    assert din % group_size == 0, (din, group_size)
    g = din // group_size
    wf = w.astype(jnp.float32).reshape(g, group_size, dout)
    qmax = (1 << (bits - 1)) - 1  # 127 or 7
    if symmetric:
        scale = jnp.max(jnp.abs(wf), axis=1) / qmax  # [g, dout]
        scale = jnp.maximum(scale, 1e-8)
        codes = jnp.clip(jnp.round(wf / scale[:, None, :]), -qmax - 1, qmax)
        zeros = None
    else:
        lo = jnp.min(wf, axis=1)
        hi = jnp.max(wf, axis=1)
        scale = jnp.maximum((hi - lo) / (2 * qmax + 1), 1e-8)
        zero = lo / scale + qmax + 1  # code offset so lo -> -qmax-1
        codes = jnp.clip(jnp.round(wf / scale[:, None, :] - zero[:, None, :]),
                         -qmax - 1, qmax)
        zeros = (-zero).astype(jnp.float32)
    codes = codes.reshape(din, dout).astype(jnp.int8)
    if bits == 4 and din % 2 == 0:
        # nibble-packed storage (uint8 container = the 4-bit marker): halves
        # the weight stream in the memory-bound decode regime. Native
        # jnp.int4 is avoided: the axon PJRT backend cannot device_put it
        # (RecursionError in layout handling).
        codes = pack_int4(codes)
    return QuantizedLinear(qweight=codes,
                           scales=scale.astype(jnp.float32),
                           zeros=None if symmetric else zeros)


def dequantize(qw: QuantizedLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Reference dequantization: w[i, o] = (code - zero[g(i), o]) * scale.

    For a desc_act layer (perm set) the returned weight is in ORIGINAL input
    order: row perm[i] of the output receives stored row i."""
    perm = qw.perm
    if perm is not None:
        qw = qw._replace(perm=None)
    if qw.packed_int4:
        qw = qw._replace(qweight=unpack_int4(qw.qweight))
    din, dout = qw.qweight.shape
    g = qw.scales.shape[0]
    gs = din // g
    codes = qw.qweight.astype(jnp.float32).reshape(g, gs, dout)
    z = 0.0 if qw.zeros is None else qw.zeros[:, None, :]
    w = (codes - z) * qw.scales[:, None, :]
    w = w.reshape(din, dout)
    if perm is not None:
        w = jnp.zeros_like(w).at[perm].set(w)
    return w.astype(dtype)


def _gptq_matmul_xla(x: jax.Array, qw: QuantizedLinear) -> jax.Array:
    """Quantized matmul via XLA: grouped dequant folded into the dot.

    Computed as sum_g (x_g @ codes_g) * scale_g - (x_g @ 1) * zero_g * scale_g
    so the big matmul runs on int8-converted codes and the per-group affine
    correction is a rank-1 term — no [in, out] float weight materialization.

    Only for SMALL row counts: the [N, groups, out] f32 partial is the
    decode-regime trade (weights streamed once, no dequant temp). At prefill
    sizes it explodes (4.5GB at N=1024, 14B gu shape) — large N goes through
    dequantize-then-dot, whose [in, out] bf16 temp is fixed-size and whose
    cost is MXU-bound anyway.
    """
    if qw.packed_int4:
        qw = qw._replace(qweight=unpack_int4(qw.qweight))
    din, dout = qw.qweight.shape
    g = qw.scales.shape[0]
    gs = din // g
    lead = x.shape[:-1]
    n_rows = 1
    for s in lead:
        n_rows *= s
    if n_rows > 64:
        w = dequantize(qw, x.dtype)
        return jnp.einsum("...i,io->...o", x, w)
    xg = x.reshape(-1, g, gs)
    codes = qw.qweight.reshape(g, gs, dout).astype(x.dtype)
    # [N, g, dout] partial products per group
    part = jnp.einsum("ngi,gio->ngo", xg, codes,
                      preferred_element_type=jnp.float32)
    part = part * qw.scales[None].astype(jnp.float32)
    if qw.zeros is not None:
        xsum = jnp.sum(xg, axis=-1, dtype=jnp.float32)       # [N, g]
        corr = xsum[:, :, None] * (qw.zeros * qw.scales)[None]
        part = part - corr
    out = jnp.sum(part, axis=1)
    return out.reshape(*lead, dout).astype(x.dtype)


# Pallas kernel opt-in for the quantized path. 'auto' uses it on TPU for
# supported shapes; overridable for A/B benchmarking (HSD_TPU_GPTQ_PATH env:
# auto | pallas | xla).
import os as _os

GPTQ_PATH = _os.environ.get("HSD_TPU_GPTQ_PATH", "auto")


def _use_pallas(x, w, path: Optional[str] = None,
                mxu_bf16: bool = False) -> bool:
    path = path if path not in (None, "auto") else GPTQ_PATH
    if path == "xla":
        return False
    try:
        from .gptq_pallas import batched_rows_ok, pallas_supported
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return False
    if path == "pallas":
        return pallas_supported(x, w)
    # auto, measured on v5e with forced-fetch timing (docs/BENCHMARKS.md):
    # the fused kernel wins at EVERY supported shape once the out-block is
    # sized to the VMEM budget — 5x at 896x1152 batch-1 (9.5 vs 59 us), 2.4x
    # at 4864x896, parity at 896x9728, 4x at 14B shapes. Route all supported
    # int8 shapes to Pallas on TPU — in the DECODE regime: the kernel is a
    # weight-streaming matvec; at prefill row counts (x rows > 128) the
    # matmul is compute-bound and the full-row x tiles bust VMEM at 14B
    # out-dims, so large-N goes to XLA's fused int8 einsum.
    #
    # EXCEPT with bf16 MXU operands (slot-batched serving): the kernel
    # stays stream-bound up to ~1k rows, while the XLA stacked-layer route
    # pays a materialized dynamic-slice copy + a dequantize-then-dot bf16
    # temp — measured 95 ms for the B=4 (240-row) tree forward at 8B
    # geometry vs a ~10 ms weight stream (scripts/profile_eagle_pool.py).
    import math
    n_rows = math.prod(x.shape[:-1])
    if not (on_tpu and pallas_supported(x, w)):
        return False
    if n_rows <= 128:
        return True
    return mxu_bf16 and n_rows <= 1024 and batched_rows_ok(x, w)


def _rms_xla(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def apply_linear(w, x: jax.Array, b: Optional[jax.Array] = None,
                 layer: Optional[jax.Array] = None,
                 path: Optional[str] = None,
                 rms=None, mxu_bf16: bool = False) -> jax.Array:
    """y = x @ w (+ b) for dense arrays or QuantizedLinear pytrees.

    layer: for a LAYER-STACKED QuantizedLinear (qweight [L, in, out]), select
    layer `layer` inside the Pallas kernel via scalar prefetch — the decode
    loop's lax.scan can then read quantized weights straight from the stacked
    HBM array instead of paying XLA's dynamic-slice materialization before
    the custom call (3x weight traffic; see gptq_pallas.gptq_matmul).
    path: 'auto' | 'pallas' | 'xla' override (ModelConfig.gptq_path; TP
    targets must use 'xla' — GSPMD cannot partition the custom call).
    rms: optional (norm_weight [in], eps) — y = rmsnorm(x) @ w. On the
    symmetric-quantized Pallas path the norm FUSES into the kernel's
    activation read (kills the per-layer norm kernels' ~21us launch floors,
    ~1.9ms of the 48-layer decode); every other path norms in XLA first.
    mxu_bf16: Pallas path only — bf16 MXU operands with f32 accumulation
    for the compute-bound batched-row regime (ModelConfig.gptq_mxu_bf16;
    the XLA fallback stays f32, which is what the parity tests pin)."""
    rms_w, rms_eps = rms if rms is not None else (None, 0.0)
    if isinstance(w, QuantizedLinear):
        if w.perm is not None:
            # desc_act layout: gather activations into group-sorted order so
            # every kernel below sees contiguous groups (loader docstring)
            if rms_w is not None:       # norm is feature-order-sensitive:
                x = _rms_xla(x, rms_w, rms_eps)   # apply BEFORE the gather
                rms_w = None
            p = w.perm
            if p.ndim == 2:  # layer-stacked [L, in]
                p = (jnp.take(p, layer, axis=0) if layer is not None
                     else p[0])
            x = jnp.take(x, p, axis=-1)
            w = w._replace(perm=None)
        # interpret-mode keeps forced-pallas testable on the CPU mesh
        interp = jax.default_backend() != "tpu"
        if mxu_bf16:
            import math
            # bf16 MXU operands only pay off in the compute-bound
            # batched-row regime; <=128-row matvecs are weight-stream-bound
            # — bf16 there would perturb numerics for zero compute win
            mxu_bf16 = math.prod(x.shape[:-1]) > 128
        use_pl = _use_pallas(x, w, path, mxu_bf16=mxu_bf16)
        fuse = use_pl and rms_w is not None and w.zeros is None
        if rms_w is not None and not fuse:
            x = _rms_xla(x, rms_w, rms_eps)
        ln_kw = dict(ln=rms_w, ln_eps=rms_eps) if fuse else {}
        if layer is not None and w.qweight.ndim == 3:
            if use_pl:
                from .gptq_pallas import gptq_matmul
                y = gptq_matmul(x, w, layer_index=layer, interpret=interp,
                                mxu_bf16=mxu_bf16, **ln_kw)
            else:
                sliced = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, layer, 0, keepdims=False), w)
                y = _gptq_matmul_xla(x, sliced)
        elif use_pl:
            from .gptq_pallas import gptq_matmul
            y = gptq_matmul(x, w, interpret=interp, mxu_bf16=mxu_bf16,
                            **ln_kw)
        else:
            y = _gptq_matmul_xla(x, w)
    else:
        if rms_w is not None:
            x = _rms_xla(x, rms_w, rms_eps)
        if layer is not None:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def apply_mlp(wgu, wdown, x: jax.Array, ln_w: jax.Array, eps: float,
              layer: Optional[jax.Array] = None, path: Optional[str] = None,
              mxu_bf16: bool = False) -> jax.Array:
    """SwiGLU MLP block: y = (silu(g) * u) @ wdown with [g | u] =
    rmsnorm(x, ln_w) @ wgu (wgu = fused gate|up, transformer.fuse_params).
    Returns the MLP output WITHOUT the residual add.

    When both weights are packed-int4 symmetric QuantizedLinear with a legal
    block plan and decode-regime row counts, the WHOLE block runs as ONE
    pallas_call (gptq_pallas.gptq_mlp_int4): one kernel boundary per layer
    instead of two, the silu/mul and both -8 corrections in-kernel, and the
    wdown tile prefetching during the gu phase. Every other shape keeps the
    two-apply_linear composition bit-identically."""
    if isinstance(wgu, QuantizedLinear) and isinstance(wdown, QuantizedLinear):
        eff = path if path not in (None, "auto") else GPTQ_PATH
        on_tpu = jax.default_backend() == "tpu"
        same_stack = (wgu.qweight.ndim == 3) == (wdown.qweight.ndim == 3)
        stacked_ok = same_stack and (
            (layer is not None) == (wgu.qweight.ndim == 3))
        if eff != "xla" and (on_tpu or eff == "pallas") and stacked_ok:
            from .gptq_pallas import gptq_mlp_int4, mlp_fusion_supported
            if mlp_fusion_supported(x, wgu, wdown):
                return gptq_mlp_int4(x, wgu, wdown, ln_w, ln_eps=eps,
                                     layer_index=layer,
                                     interpret=not on_tpu)
    F = wdown.din if isinstance(wdown, QuantizedLinear) else wdown.shape[-2]
    gu = apply_linear(wgu, x, layer=layer, path=path, rms=(ln_w, eps),
                      mxu_bf16=mxu_bf16)
    ff = jax.nn.silu(gu[..., :F]) * gu[..., F:]
    return apply_linear(wdown, ff, layer=layer, path=path,
                        mxu_bf16=mxu_bf16)


def attn_mlp_fusable(att: jax.Array, wo, wgu, wdown,
                     path: Optional[str] = None,
                     layer: Optional[jax.Array] = None) -> bool:
    """Static check: can the layer tail (wo + residual + SwiGLU MLP +
    residual) run as ONE pallas_call (gptq_pallas.gptq_attn_mlp_int4)?
    Same gating rules as apply_mlp's fused path, extended to wo."""
    if not all(isinstance(w, QuantizedLinear) for w in (wo, wgu, wdown)):
        return False
    eff = path if path not in (None, "auto") else GPTQ_PATH
    on_tpu = jax.default_backend() == "tpu"
    ndims = {w.qweight.ndim for w in (wo, wgu, wdown)}
    stacked_ok = (len(ndims) == 1
                  and (layer is not None) == (ndims.pop() == 3))
    if not (eff != "xla" and (on_tpu or eff == "pallas") and stacked_ok):
        return False
    from .gptq_pallas import attn_mlp_fusion_supported
    return attn_mlp_fusion_supported(att, wo, wgu, wdown)


def apply_attn_mlp(att: jax.Array, x: jax.Array, wo, wgu, wdown,
                   ln_w: jax.Array, eps: float,
                   layer: Optional[jax.Array] = None) -> jax.Array:
    """Layer tail as one fused pallas_call: returns the NEW layer
    activation x' + mlp(rmsnorm(x')) with x' = x + att @ wo. Caller must
    gate with attn_mlp_fusable."""
    from .gptq_pallas import gptq_attn_mlp_int4
    return gptq_attn_mlp_int4(att, x, wo, wgu, wdown, ln_w, ln_eps=eps,
                              layer_index=layer,
                              interpret=jax.default_backend() != "tpu")


def init_dense(key: jax.Array, shape, dtype=jnp.bfloat16, scale=None) -> jax.Array:
    scale = scale if scale is not None else (shape[0] ** -0.5)
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)
