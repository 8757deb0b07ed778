"""Pallas TPU kernel: GPTQ weight-only dequantization fused with matmul.

The speed-of-light constraint for the decode regime (batch 1-32 rows) is HBM
bandwidth on the WEIGHT stream: reading int8 codes moves 2x less than bf16
(4x for int4). The kernel streams weight tiles HBM->VMEM, dequantizes
per-group in VMEM and feeds the MXU — the fused equivalent of the exllama
CUDA kernels the reference installs via `pip install optimum`
(SURVEY.md §2.6; nothing to port, designed TPU-first).

Layout contract (matches ops/linear.QuantizedLinear):
  qweight [in, out] int8 codes, scales [in/gs, out], zeros [in/gs, out]|None
  y[n, o] = sum_i x[n, i] * (code[i, o] - zero[g(i), o]) * scale[g(i), o]

Scales/zeros ride in full along the group axis (they are tiny — in/128 rows)
and the kernel slices the groups of the current in-block, which keeps the
weight block shape free of the sublane-divisibility constraint on the group
dim.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import QuantizedLinear


def _scale_slice(s_ref, gpb, n_in_blocks, stacked=False):
    if n_in_blocks == 1:
        # single in-block: the full scales array belongs to this block
        s = s_ref[0] if stacked else s_ref[:]
        return s.astype(jnp.float32)               # [gpb, out_blk]
    # gpb is 8-aligned by construction (see _pick_block_in), so the
    # slice start is provably sublane-aligned for Mosaic
    g0 = pl.multiple_of(pl.program_id(1) * gpb, 8)
    if stacked:
        return s_ref[0, pl.ds(g0, gpb), :].astype(jnp.float32)
    return s_ref[pl.ds(g0, gpb), :].astype(jnp.float32)


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, gpb, gs, n_in_blocks,
            stacked=False, mxu_bf16=False):
    """Grid (out_blocks, in_blocks); accumulate x_blk @ (codes * scale).

    Zero-points are handled OUTSIDE the kernel as a rank-1 correction
    (y -= (sum_i x_g[i]) @ (zero*scale)), so the hot loop dequantizes with a
    single fused convert-multiply — the elementwise dequant is the VPU-bound
    part of this memory-streaming kernel (docs/BENCHMARKS.md).

    stacked=True: weight/scale refs carry a leading layer axis of block 1
    (scalar-prefetch layer select — see gptq_matmul layer_index).
    mxu_bf16=True: feed the MXU bf16 operands (f32 accumulation). The
    decode matvec is weight-stream-bound and keeps exact f32 operands; the
    slot-BATCHED tree/verify forward (npad >= ~128) is f32-MXU
    COMPUTE-bound — measured 95 ms for the B=4 tree forward at 8B geometry
    against a ~10 ms weight stream (scripts/profile_eagle_pool.py). int8
    codes are exactly representable in bf16; only the activation rounding
    changes."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = (w_ref[0] if stacked else w_ref[:]).astype(jnp.float32)
    in_blk, out_blk = codes.shape
    codes = codes.reshape(gpb, gs, out_blk)
    scale = _scale_slice(s_ref, gpb, n_in_blocks, stacked=stacked)
    w = (codes * scale[:, None, :]).reshape(in_blk, out_blk)
    xb = x_ref[:].astype(jnp.float32)
    if mxu_bf16:
        w, xb = w.astype(jnp.bfloat16), xb.astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(xb, w, preferred_element_type=jnp.float32)

    @pl.when(i == n_in_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_ln(x_ref, ln_ref, w_ref, s_ref, o_ref, acc_ref, *, gpb, gs,
               n_in_blocks, eps, stacked=False, mxu_bf16=False):
    """int8 kernel with the RMS norm FUSED into the activation read: x_ref
    is the FULL raw [npad, din] activations (f32, unblocked — x is tiny);
    the kernel computes r = rsqrt(mean(x^2)+eps) per grid step (~npad*din
    VPU flops, noise) and feeds the dot r-scaled, ln-weighted features.
    Kills the separate per-layer norm kernels that ran at a ~21us launch
    floor each (~1.9ms of the 48-layer decode; NEXT.md r3 item 1).
    Fused path requires zeros=None (no external correction needed)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = (w_ref[0] if stacked else w_ref[:]).astype(jnp.float32)
    in_blk, out_blk = codes.shape
    codes = codes.reshape(gpb, gs, out_blk)
    scale = _scale_slice(s_ref, gpb, n_in_blocks, stacked=stacked)
    w = (codes * scale[:, None, :]).reshape(in_blk, out_blk)
    xf = x_ref[:]
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    off = pl.multiple_of(i * in_blk, 128)       # block_in % 128 == 0 (int8)
    xb = (x_ref[:, pl.ds(off, in_blk)] * r
          * ln_ref[0, pl.ds(off, in_blk)][None, :])
    if mxu_bf16:
        w, xb = w.astype(jnp.bfloat16), xb.astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(xb, w, preferred_element_type=jnp.float32)

    @pl.when(i == n_in_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_int4(xe_ref, xm_ref, w_ref, s_ref, o_ref, acc_ref, *,
                 gpb, gs_p, n_in_blocks, stacked=False, mxu_bf16=False):
    """Nibble-packed int4 variant. Grid (out_blocks, in_blocks) over PACKED
    rows with SPLIT-HALF pairing (ops/linear.pack_int4): byte r holds input
    rows r (low nibble) and r + din/2 (high nibble), so the activation
    planes are the CONTIGUOUS halves of x (the previous adjacent-row pairing
    needed a stride-2 deinterleave per call, measured ~15us and ~480 vs
    ~600-730 GB/s) and each nibble plane spans WHOLE quantization groups:
    lo scales = groups [0, G/2), hi scales = [G/2, G) (requires G even;
    pallas_supported gates odd-G shapes to the XLA path).

    Same 2D streaming pipeline as the int8 kernel (weight tile [in_p, out]
    blocks, full-K dots) — the round-2 group-major form (batched K=64 dots
    over a [gpb, gs_p, out] tile) throttled the DMA/compute pipeline and
    measured 356 GB/s. Both nibbles dequantize explicitly (the xm modular
    identity that skipped the lo extraction needs ONE scale per byte; with
    per-plane scales it does not factor):

        y = xe @ (lo * s_lo)  +  xo @ (hi * s_hi)

    Per-streamed-byte VPU work: one u8->i32 hop (no direct u8->f32 on
    Mosaic), one AND, one shift, two f32 converts (NOT bf16: measured
    192-338 GB/s vs f32 — the i32->bf16 convert + 16-bit VPU ops cost more
    than the halved VMEM traffic saves) and two scale multiplies; the
    weight stream is HALF the int8 kernel's bytes. Nibbles are stored
    UNSIGNED; the -8 shift rides the rank-1 zero correction outside the
    kernel."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = (w_ref[0] if stacked else w_ref[:]).astype(jnp.int32)  # [in_p, out]
    in_p, out_blk = b.shape
    # scales arrive pre-reshaped [2, n_in_blocks, gpb, out] (lo/hi plane
    # leading) with the in-block axis indexed by the BlockSpec — no dynamic
    # slice, so block_in needs no 8-aligned group count
    sp = (s_ref[0] if stacked else s_ref[:]).astype(jnp.float32)
    sl, sh = sp[0, 0], sp[1, 0]                               # [gpb, out]
    lf = (b & 15).astype(jnp.float32).reshape(gpb, gs_p, out_blk)
    hf = (b >> 4).astype(jnp.float32).reshape(gpb, gs_p, out_blk)
    wl = (lf * sl[:, None, :]).reshape(in_p, out_blk)        # lo*s_lo
    wh = (hf * sh[:, None, :]).reshape(in_p, out_blk)        # hi*s_hi
    # x planes may arrive bf16 (npad >= 32: activation tiles re-stream per
    # out-block and their DMA rivals the weight stream at verify-forward
    # row counts — gptq_matmul xdt); convert at use
    xe, xm = xe_ref[:].astype(jnp.float32), xm_ref[:].astype(jnp.float32)
    if mxu_bf16:
        wl, wh = wl.astype(jnp.bfloat16), wh.astype(jnp.bfloat16)
        xe, xm = xe.astype(jnp.bfloat16), xm.astype(jnp.bfloat16)
    acc_ref[:] += (jnp.dot(xe, wl, preferred_element_type=jnp.float32)
                   + jnp.dot(xm, wh, preferred_element_type=jnp.float32))

    @pl.when(i == n_in_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_int4_ln(xf_ref, ln_ref, xe_ref, xm_ref, w_ref, s_ref, o_ref,
                    acc_ref, *, gpb, gs_p, n_in_blocks, eps, stacked=False,
                    mxu_bf16=False):
    """Nibble-packed int4 kernel with FUSED RMS norm AND the symmetric -8
    zero-correction folded in-kernel on the NORMED group sums (NEXT.md r3
    item 1: each in-block's groups are block-local, so the per-tile
    correction contribution accumulates without cross-block state — the
    external rank-1 epilogue disappears entirely on this path).

    xf_ref: FULL raw [npad, din] activations (f32, unblocked) for the
    row-norm; xe/xm: blocked RAW halves; ln_ref: [2, block_in] norm weight
    halves (lo plane = features [0, din/2))."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = (w_ref[0] if stacked else w_ref[:]).astype(jnp.int32)  # [in_p, out]
    in_p, out_blk = b.shape
    sp = (s_ref[0] if stacked else s_ref[:]).astype(jnp.float32)
    sl, sh = sp[0, 0], sp[1, 0]                               # [gpb, out]
    lf = (b & 15).astype(jnp.float32).reshape(gpb, gs_p, out_blk)
    hf = (b >> 4).astype(jnp.float32).reshape(gpb, gs_p, out_blk)
    wl = (lf * sl[:, None, :]).reshape(in_p, out_blk)
    wh = (hf * sh[:, None, :]).reshape(in_p, out_blk)
    xf = xf_ref[:]
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    ln2 = ln_ref[:]                                           # [2, in_p]
    xe = xe_ref[:].astype(jnp.float32) * r * ln2[0][None, :]
    xo = xm_ref[:].astype(jnp.float32) * r * ln2[1][None, :]
    if mxu_bf16:
        wlm, whm = wl.astype(jnp.bfloat16), wh.astype(jnp.bfloat16)
        xem, xom = xe.astype(jnp.bfloat16), xo.astype(jnp.bfloat16)
    else:
        wlm, whm, xem, xom = wl, wh, xe, xo
    acc_ref[:] += (jnp.dot(xem, wlm, preferred_element_type=jnp.float32)
                   + jnp.dot(xom, whm, preferred_element_type=jnp.float32))
    npad = xe.shape[0]
    xg_e = jnp.sum(xe.reshape(npad, gpb, gs_p), axis=2)       # [npad, gpb]
    xg_o = jnp.sum(xo.reshape(npad, gpb, gs_p), axis=2)
    acc_ref[:] -= 8.0 * (
        jnp.dot(xg_e, sl, preferred_element_type=jnp.float32)
        + jnp.dot(xg_o, sh, preferred_element_type=jnp.float32))

    @pl.when(i == n_in_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _out_block_limit(packed: bool, block_in: int, npad: int,
                     vmem_cap: int, raw: bool = False) -> int:
    """Widest out-block (bytes-per-column model) under the VMEM working-set
    budget. Bigger blocks win decisively in the batch-1 decode regime: each
    pallas_call grid step carries a fixed ~9us launch/pipeline floor on v5e,
    so a 0.5B-scale matvec wants ONE out-block (measured 9.5us vs 59us at
    896x1152, docs/BENCHMARKS.md).

    int8: double-buffered int8 weight tile (2*bi) + f32 out/acc (16*npad)
    against a 24MB budget net of the double-buffered f32 x tile — at prefill
    row counts the x tile matters (observed: 5120x27648 npad=32 -> 16.36M >
    16M scoped; npad=1024 -> 148M > 128M physical). Also respect the
    caller's per-tile cap (vmem_cap_mb) on the weight tile itself.

    packed int4: double-buffered u8 tile (2*bi_p) + two f32 dequant planes
    (8*bi_p) + nibble temps -> ~14 bytes per (in_p, out) cell against a 48MB
    working budget (vmem_limit below is 96MB for packed; v5e has 128MiB
    physical) — measured: a 24MB budget forced wdown [6912, 5120] to bo=128
    and 238 GB/s; bo=256+ restores the pipeline."""
    if packed:
        cap = 48 * 1024 * 1024
        limit = cap // (14 * block_in + 16 * npad)
    else:
        cap = 24 * 1024 * 1024
        limit = (cap - 4 * npad * block_in) // (2 * block_in + 16 * npad)
        limit = min(limit, vmem_cap // block_in)
    if raw:
        return limit        # feasibility checks need the unfloored value
    return max(128, limit // 128 * 128)


def _pick_block_in_packed(rows: int, gs_p: int, target: int = 3584) -> int:
    """Packed-int4 in-block: largest multiple of the packed group size that
    divides `rows` and fits `target`. No 8-aligned group-count constraint
    (the scale slice is BlockSpec-indexed, see _kernel_int4) — tall weights
    (e.g. wdown 6912 packed rows = 108 groups) split their in-dim so the f32
    dequant planes stay small and the out-block stays WIDE (DMA chunk width
    dominated the measured rate: 256B-chunk tiles ran 220-238 GB/s)."""
    if rows <= target:
        return rows
    for d in range(target // gs_p, 0, -1):
        if rows % (d * gs_p) == 0:
            return d * gs_p
    return rows


def _pick_block_in(din: int, gs: int, target: int = 8192) -> int:
    """in-block size: whole din when it fits the VMEM budget (no group
    slicing needed), else the largest divisor whose group count is 8-aligned
    (Mosaic sublane constraint on the scales slice)."""
    if din <= target:
        return din
    n_groups = din // gs
    best = din
    for d in range(1, n_groups + 1):
        if n_groups % d == 0 and d % 8 == 0 and d * gs <= target:
            best = d * gs
    return best


@functools.partial(jax.jit, static_argnames=("block_out", "block_in",
                                             "interpret", "vmem_cap_mb",
                                             "ln_eps", "mxu_bf16"))
def gptq_matmul(x: jax.Array, qw: QuantizedLinear, block_out: int = 0,
                block_in: int = 0, interpret: bool = False,
                vmem_cap_mb: int = 8,
                layer_index=None, ln: jax.Array = None,
                ln_eps: float = 1e-6, mxu_bf16: bool = False) -> jax.Array:
    """y = x @ dequant(qw). x: [..., in]; returns [..., out] in x.dtype.

    ln: optional RMS-norm weight [in] — fuses y = rmsnorm(x, ln) @ dequant
    into the kernel (norm computed in the activation read; requires
    zeros=None, i.e. symmetric quantization). The packed path also folds
    its -8 shift correction in-kernel on the normed group sums.

    Rows are padded to the f32 sublane (8). in must divide by a multiple of
    the group size (model dims are multiples of 128 in practice); block_out=0
    auto-picks the largest legal out-block under the VMEM budget (explicit
    values are shrunk to a legal divisor).

    layer_index: when given, qw is a LAYER-STACKED pytree (qweight
    [L, in, out], scales/zeros [L, groups, out]) and the kernel streams layer
    `layer_index`'s tiles straight from the stacked HBM array via
    scalar-prefetch index maps. This is how the decode loop's lax.scan over
    stacked layers reads quantized weights WITHOUT the dynamic-slice
    materialization XLA otherwise inserts before a custom call — measured 3x
    weight-stream traffic (233 vs 684 GB/s at 14B shapes, the read+write+read
    of the sliced copy; docs/BENCHMARKS.md).
    """
    stacked = layer_index is not None
    packed = qw.qweight.dtype == jnp.uint8
    fuse_ln = ln is not None
    if fuse_ln and qw.zeros is not None:
        raise ValueError("RMS-norm fusion requires symmetric quantization "
                         "(zeros=None); asymmetric shapes norm in XLA")
    rows, dout = qw.qweight.shape[-2:]         # packed: rows = din/2
    din = 2 * rows if packed else rows
    groups = qw.scales.shape[-2]
    if packed and groups % 2:
        raise ValueError(
            f"packed int4 needs an even group count (split-half nibble "
            f"planes must span whole scale groups); got {groups} groups for "
            f"din={din}. Route this shape through the XLA path "
            f"(pallas_supported gates it for apply_linear).")
    gs = din // groups                         # original group size
    # packed rows per scale-plane group: with split-half pairing each
    # nibble plane spans whole groups of gs BYTE rows (see pack_int4)
    gs_k = gs
    lead = x.shape[:-1]
    x2 = x.reshape(-1, din)
    n = x2.shape[0]
    npad = max(8, ((n + 7) // 8) * 8)
    if npad != n:
        x2 = jnp.pad(x2, ((0, npad - n), (0, 0)))

    if block_in == 0:
        block_in = (_pick_block_in_packed(rows, gs_k) if packed
                    else _pick_block_in(rows, gs_k))
        if (packed and block_out == 0 and rows * dout <= 24 * 1024 * 1024
                and dout > _out_block_limit(True, block_in, npad, 0)):
            # SMALL packed weights whose auto in-block forces a multi-out-
            # block grid: the pipeline prologue amortizes over too few
            # steps (wqkv 2560x7168 streamed 509-523 GB/s vs 633-650 for
            # its 3-4x-larger siblings at the SAME tile shape). Prefer the
            # largest in-block whose VMEM budget fits the WHOLE dout in
            # one out-block — e2e 48L int4 decode A/B (median of 3, 96
            # new tokens, scripts/ab_wqkv_blocks.py): auto 13.00-13.05
            # ms/token vs one-out-block 12.76-12.80. Self-limiting: at
            # prefill row counts the npad term shrinks the limit below
            # dout for every candidate, so prefill keeps the auto pick.
            for d in range(block_in // gs_k, 0, -1):
                cand = d * gs_k
                if (rows % cand == 0
                        and _out_block_limit(True, cand, npad, 0) >= dout):
                    block_in = cand
                    break
    block_in = min(block_in, rows)
    # bo need NOT divide dout on EITHER path: the grid's final out-block is
    # RAGGED (Mosaic pads edge blocks; garbage lands only in columns >= dout,
    # which are never written back). A wide ragged block always beats narrow
    # divisor tiles — DMA chunk width and grid-step count dominated the
    # measured rate; prime-factor vocabs (Qwen 151936 = 128 * 1187) would
    # otherwise force bo=128 and 1187 grid steps on the [D, V] head.
    limit = _out_block_limit(packed, block_in, npad,
                             vmem_cap_mb * 1024 * 1024)
    if block_out == 0:
        block_out = dout if dout <= limit else limit
    else:
        block_out = min(block_out, dout, max(limit, 128))
        if block_out % 128 and block_out != dout:
            block_out = max(128, block_out // 128 * 128)
    assert rows % block_in == 0 and block_in % gs_k == 0, (rows, block_in, gs_k)
    gpb = block_in // gs_k
    n_in_blocks = rows // block_in
    import math as _math
    grid = (_math.ceil(dout / block_out), n_in_blocks)

    # index maps: under scalar prefetch every map takes the scalar ref as a
    # trailing argument (after the grid indices) and the weight/scale maps
    # select the layer with s[0]
    if stacked:
        wl = (1,)
        w_map = lambda o, i, s: (s[0], i, o)
        s_map = lambda o, i, s: (s[0], 0, o)
        x_map = lambda o, i, s: (0, i)
        o_map = lambda o, i, s: (0, o)
        c_map = lambda o, i, s: (0, 0)
    else:
        wl = ()
        w_map = lambda o, i: (i, o)
        s_map = lambda o, i: (0, o)
        x_map = lambda o, i: (0, i)
        o_map = lambda o, i: (0, o)
        c_map = lambda o, i: (0, 0)

    w_spec = pl.BlockSpec((*wl, block_in, block_out), w_map,
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((*wl, groups, block_out), s_map,
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((npad, block_in), x_map, memory_space=pltpu.VMEM)
    # fused-norm refs: the FULL raw x (for the row-norm; tiny) and the norm
    # weight, both constant across the grid
    xfull_spec = pl.BlockSpec((npad, din), c_map, memory_space=pltpu.VMEM)
    if packed:
        # split-half planes: xe/xo are the CONTIGUOUS halves of x (free —
        # the old stride-2 deinterleave measured ~15us/call). Both planes
        # ride the int8 kernel's 2D [npad, block_in] blocking over PACKED
        # rows. Scales split into the lo/hi plane groups and reshape to
        # [2, n_in_blocks, gpb, out] so the BlockSpec selects plane +
        # in-block with no dynamic slicing.
        # plane dtype stays f32 at every row count: bf16 planes at npad=128
        # were A/B-tested against the K=11 verify forward and measured NO
        # change (32.0 vs 32.7 ms, within noise) — the x-tile DMA is not
        # the scaling term there (docs/BENCHMARKS.md K=11 section); f32
        # also measured best in the batch-1 decode regime (r2)
        xe = x2[:, :rows].astype(jnp.float32)
        xo = x2[:, rows:].astype(jnp.float32)
        g2 = groups // 2
        s3 = jnp.stack([qw.scales[..., :g2, :], qw.scales[..., g2:, :]],
                       axis=-3)
        s3 = s3.reshape(*qw.scales.shape[:-2], 2, n_in_blocks, gpb, dout)
        if stacked:
            s3_spec = pl.BlockSpec((1, 2, 1, gpb, block_out),
                                   lambda o, i, s: (s[0], 0, i, 0, o),
                                   memory_space=pltpu.VMEM)
        else:
            s3_spec = pl.BlockSpec((2, 1, gpb, block_out),
                                   lambda o, i: (0, i, 0, o),
                                   memory_space=pltpu.VMEM)
        if fuse_ln:
            ln2 = ln.astype(jnp.float32).reshape(2, rows)
            ln2_spec = pl.BlockSpec((2, block_in), x_map,
                                    memory_space=pltpu.VMEM)
            in_specs = [xfull_spec, ln2_spec, x_spec, x_spec, w_spec,
                        s3_spec]
            args = [x2.astype(jnp.float32), ln2, xe, xo, qw.qweight, s3]
            kern = functools.partial(_kernel_int4_ln, gpb=gpb, gs_p=gs_k,
                                     n_in_blocks=n_in_blocks, eps=ln_eps,
                                     stacked=stacked, mxu_bf16=mxu_bf16)
        else:
            in_specs = [x_spec, x_spec, w_spec, s3_spec]
            args = [xe, xo, qw.qweight, s3]
            kern = functools.partial(_kernel_int4, gpb=gpb, gs_p=gs_k,
                                     n_in_blocks=n_in_blocks, stacked=stacked,
                                     mxu_bf16=mxu_bf16)
    elif fuse_ln:
        ln1_spec = pl.BlockSpec((1, din), c_map, memory_space=pltpu.VMEM)
        in_specs = [xfull_spec, ln1_spec, w_spec, s_spec]
        args = [x2.astype(jnp.float32), ln.astype(jnp.float32).reshape(1, din),
                qw.qweight, qw.scales]
        kern = functools.partial(_kernel_ln, gpb=gpb, gs=gs,
                                 n_in_blocks=n_in_blocks, eps=ln_eps,
                                 stacked=stacked, mxu_bf16=mxu_bf16)
    else:
        in_specs = [x_spec, w_spec, s_spec]
        args = [x2, qw.qweight, qw.scales]
        kern = functools.partial(_kernel, gpb=gpb, gs=gs,
                                 n_in_blocks=n_in_blocks, stacked=stacked,
                                 mxu_bf16=mxu_bf16)

    out_spec = pl.BlockSpec((npad, block_out), o_map, memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((npad, block_out), jnp.float32)]
    common = dict(
        out_shape=jax.ShapeDtypeStruct((npad, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the int4 kernel's nibble temps + dot partials (and the int8
            # kernel's double-buffered weight tiles at prefill row counts)
            # exceed the 16MB default scoped budget at useful block sizes;
            # v5e has 128MiB physical VMEM
            vmem_limit_bytes=(96 if packed else 64) * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * din * dout,
            bytes_accessed=rows * dout + npad * din * 4 + npad * dout * 4,
            transcendentals=0),
        interpret=interpret,
    )
    if stacked:
        lidx = jnp.atleast_1d(layer_index).astype(jnp.int32)
        inner = kern
        kern = lambda s_ref, *refs: inner(*refs)  # scalar ref only feeds maps
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=out_spec, scratch_shapes=scratch),
            **common,
        )(lidx, *args)
    else:
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
            scratch_shapes=scratch, **common,
        )(*args)

    if (qw.zeros is not None or packed) and not fuse_ln:
        # rank-1 zero-point correction outside the kernel:
        # y[n,o] -= sum_g (sum_{i in g} x[n,i]) * zero[g,o]*scale[g,o]
        # packed int4 stores unsigned nibbles (code+8), so the uniform -8
        # shift rides in this correction even for symmetric weights.
        # (An in-kernel (nibble - 8) fold was tried and produced device
        # faults in composed K=11 programs despite passing every isolated
        # shape — reverted; the cost fix below keeps the win instead.)
        zeros, scales = qw.zeros, qw.scales
        if stacked:
            scales = jax.lax.dynamic_index_in_dim(scales, layer_index, 0,
                                                  keepdims=False)
            if zeros is not None:
                zeros = jax.lax.dynamic_index_in_dim(zeros, layer_index, 0,
                                                     keepdims=False)
        xg = jnp.sum(x2.astype(jnp.float32).reshape(npad, groups, gs), axis=2)
        if zeros is None:
            # symmetric packed: the correction is a pure uniform -8 shift.
            # Keep the scalar OUTSIDE the dot so the bf16->f32 convert fuses
            # into the dot reads — the former `8.0 * scales` pre-multiply
            # materialized a [groups, dout] f32 copy per call, profiled at
            # ~2 ms/token on the 48-layer decode (multiply_reduce_fusion)
            corr = (xg @ scales.astype(jnp.float32)) * 8.0
        else:
            z = zeros.astype(jnp.float32) + (8.0 if packed else 0.0)
            corr = xg @ (z * scales.astype(jnp.float32))
        out = out - corr.astype(out.dtype)
    return out[:n].reshape(*lead, dout)


def _kernel_mlp_int4(xf_ref, ln_ref, xe_ref, xo_ref, wg_ref, sg_ref,
                     wd_ref, sd_ref, o_ref, gu_ref, ff_ref, acc_ref, *,
                     gpb_g, gs_g, gpb_d, gs_d, n_gu_steps, n_down_in,
                     bo_gu, eps, stacked=False):
    """Whole SwiGLU MLP block in ONE pallas_call: rmsnorm(x) @ Wgu ->
    silu(gate)*up -> @ Wdown, both packed-int4 symmetric, both -8 shift
    corrections folded in-kernel on group sums (NEXT.md r5 item 2: the
    remaining decode residual is per-call/launch floors — this removes one
    kernel boundary per layer plus the XLA silu/mul/correction ops between
    them, and the wdown weight tile prefetches DURING the gu phase).

    1-D grid of n_gu_steps + n_down_out*n_down_in steps. Phase 1 (gu):
    single in-block (whole packed rows), one out-block per step written to
    the gu VMEM scratch. Phase boundary: ff = silu(gu[:, :F]) * gu[:, F:]
    computed once into the ff scratch. Phase 2 (down): the int4 kernel's
    (out, in) loop reading activation planes as the contiguous halves of
    the ff scratch (split-half pack convention, ops/linear.pack_int4)."""
    s = pl.program_id(0)
    in_gu = s < n_gu_steps

    @pl.when(in_gu)
    def _():
        b = (wg_ref[0] if stacked else wg_ref[:]).astype(jnp.int32)
        in_p, out_blk = b.shape                            # [Rg, bo_gu]
        sp = (sg_ref[0] if stacked else sg_ref[:]).astype(jnp.float32)
        sl, sh = sp[0, 0], sp[1, 0]                        # [gpb_g, bo_gu]
        lf = (b & 15).astype(jnp.float32).reshape(gpb_g, gs_g, out_blk)
        hf = (b >> 4).astype(jnp.float32).reshape(gpb_g, gs_g, out_blk)
        wl = (lf * sl[:, None, :]).reshape(in_p, out_blk)
        wh = (hf * sh[:, None, :]).reshape(in_p, out_blk)
        xf = xf_ref[:]
        r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
        ln2 = ln_ref[:]                                    # [2, Rg]
        xe = xe_ref[:].astype(jnp.float32) * r * ln2[0][None, :]
        xo = xo_ref[:].astype(jnp.float32) * r * ln2[1][None, :]
        acc = (jnp.dot(xe, wl, preferred_element_type=jnp.float32)
               + jnp.dot(xo, wh, preferred_element_type=jnp.float32))
        npad = xe.shape[0]
        ge = jnp.sum(xe.reshape(npad, gpb_g, gs_g), axis=2)
        go = jnp.sum(xo.reshape(npad, gpb_g, gs_g), axis=2)
        acc -= 8.0 * (jnp.dot(ge, sl, preferred_element_type=jnp.float32)
                      + jnp.dot(go, sh, preferred_element_type=jnp.float32))
        off = pl.multiple_of(s * bo_gu, 128)
        gu_ref[:, pl.ds(off, bo_gu)] = acc

    @pl.when(s == n_gu_steps)
    def _():
        gu = gu_ref[:]
        F = gu.shape[1] // 2
        g = gu[:, :F]
        ff_ref[:] = g * jax.nn.sigmoid(g) * gu[:, F:]

    @pl.when(jnp.logical_not(in_gu))
    def _():
        sd_step = s - n_gu_steps
        i_d = sd_step % n_down_in

        @pl.when(i_d == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = (wd_ref[0] if stacked else wd_ref[:]).astype(jnp.int32)
        in_p, out_blk = b.shape                            # [bid, bo_d]
        sp = (sd_ref[0] if stacked else sd_ref[:]).astype(jnp.float32)
        sl, sh = sp[0, 0], sp[1, 0]                        # [gpb_d, bo_d]
        lf = (b & 15).astype(jnp.float32).reshape(gpb_d, gs_d, out_blk)
        hf = (b >> 4).astype(jnp.float32).reshape(gpb_d, gs_d, out_blk)
        wl = (lf * sl[:, None, :]).reshape(in_p, out_blk)
        wh = (hf * sh[:, None, :]).reshape(in_p, out_blk)
        half = n_down_in * in_p                            # F/2
        off = pl.multiple_of(i_d * in_p, 128)
        ffe = ff_ref[:, pl.ds(off, in_p)]
        ffo = ff_ref[:, pl.ds(half + off, in_p)]
        acc_ref[:] += (jnp.dot(ffe, wl, preferred_element_type=jnp.float32)
                       + jnp.dot(ffo, wh, preferred_element_type=jnp.float32))
        npad = ffe.shape[0]
        ge = jnp.sum(ffe.reshape(npad, gpb_d, gs_d), axis=2)
        go = jnp.sum(ffo.reshape(npad, gpb_d, gs_d), axis=2)
        acc_ref[:] -= 8.0 * (
            jnp.dot(ge, sl, preferred_element_type=jnp.float32)
            + jnp.dot(go, sh, preferred_element_type=jnp.float32))

        @pl.when(i_d == n_down_in - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_attn_mlp_int4(ae_ref, ao_ref, res_ref, ln_ref, wo_ref, so_ref,
                          wg_ref, sg_ref, wd_ref, sd_ref, o_ref,
                          xn_ref, gu_ref, ff_ref, acc_ref, *,
                          gpb_w, gs_w, gpb_g, gs_g, gpb_d, gs_d,
                          n_wo_steps, n_gu_steps, n_down_in,
                          bo_wo, bo_gu, eps, stacked=False):
    """The layer's whole post-attention tail in ONE pallas_call:
    x' = x + att @ Wo, then the fused SwiGLU MLP of _kernel_mlp_int4 on x'
    (rmsnorm in-kernel), returning x' + mlp. Three packed-int4 symmetric
    weight streams phase through one grid; each phase's first tile
    prefetches during the previous phase (its BlockSpec index holds still).
    Leaves 2 pallas_calls per decode layer: wqkv and this."""
    s = pl.program_id(0)
    in_wo = s < n_wo_steps
    in_gu = jnp.logical_and(s >= n_wo_steps, s < n_wo_steps + n_gu_steps)

    @pl.when(in_wo)
    def _():
        b = (wo_ref[0] if stacked else wo_ref[:]).astype(jnp.int32)
        in_p, out_blk = b.shape                            # [Rw, bo_wo]
        sp = (so_ref[0] if stacked else so_ref[:]).astype(jnp.float32)
        sl, sh = sp[0, 0], sp[1, 0]
        lf = (b & 15).astype(jnp.float32).reshape(gpb_w, gs_w, out_blk)
        hf = (b >> 4).astype(jnp.float32).reshape(gpb_w, gs_w, out_blk)
        wl = (lf * sl[:, None, :]).reshape(in_p, out_blk)
        wh = (hf * sh[:, None, :]).reshape(in_p, out_blk)
        ae = ae_ref[:].astype(jnp.float32)
        ao = ao_ref[:].astype(jnp.float32)
        acc = (jnp.dot(ae, wl, preferred_element_type=jnp.float32)
               + jnp.dot(ao, wh, preferred_element_type=jnp.float32))
        npad = ae.shape[0]
        ge = jnp.sum(ae.reshape(npad, gpb_w, gs_w), axis=2)
        go = jnp.sum(ao.reshape(npad, gpb_w, gs_w), axis=2)
        acc -= 8.0 * (jnp.dot(ge, sl, preferred_element_type=jnp.float32)
                      + jnp.dot(go, sh, preferred_element_type=jnp.float32))
        off = pl.multiple_of(s * bo_wo, 128)
        xn_ref[:, pl.ds(off, bo_wo)] = (
            res_ref[:].astype(jnp.float32) + acc)

    @pl.when(in_gu)
    def _():
        sg_step = s - n_wo_steps
        b = (wg_ref[0] if stacked else wg_ref[:]).astype(jnp.int32)
        in_p, out_blk = b.shape                            # [Rg, bo_gu]
        sp = (sg_ref[0] if stacked else sg_ref[:]).astype(jnp.float32)
        sl, sh = sp[0, 0], sp[1, 0]
        lf = (b & 15).astype(jnp.float32).reshape(gpb_g, gs_g, out_blk)
        hf = (b >> 4).astype(jnp.float32).reshape(gpb_g, gs_g, out_blk)
        wl = (lf * sl[:, None, :]).reshape(in_p, out_blk)
        wh = (hf * sh[:, None, :]).reshape(in_p, out_blk)
        xf = xn_ref[:]
        r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
        ln2 = ln_ref[:]                                    # [2, Rg]
        xe = xf[:, :in_p] * r * ln2[0][None, :]
        xo = xf[:, in_p:] * r * ln2[1][None, :]
        acc = (jnp.dot(xe, wl, preferred_element_type=jnp.float32)
               + jnp.dot(xo, wh, preferred_element_type=jnp.float32))
        npad = xe.shape[0]
        ge = jnp.sum(xe.reshape(npad, gpb_g, gs_g), axis=2)
        go = jnp.sum(xo.reshape(npad, gpb_g, gs_g), axis=2)
        acc -= 8.0 * (jnp.dot(ge, sl, preferred_element_type=jnp.float32)
                      + jnp.dot(go, sh, preferred_element_type=jnp.float32))
        off = pl.multiple_of(sg_step * bo_gu, 128)
        gu_ref[:, pl.ds(off, bo_gu)] = acc

    @pl.when(s == n_wo_steps + n_gu_steps)
    def _():
        gu = gu_ref[:]
        F = gu.shape[1] // 2
        g = gu[:, :F]
        ff_ref[:] = g * jax.nn.sigmoid(g) * gu[:, F:]

    @pl.when(s >= n_wo_steps + n_gu_steps)
    def _():
        sd_step = s - n_wo_steps - n_gu_steps
        i_d = sd_step % n_down_in
        od = sd_step // n_down_in

        @pl.when(i_d == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = (wd_ref[0] if stacked else wd_ref[:]).astype(jnp.int32)
        in_p, out_blk = b.shape                            # [bid, bo_d]
        sp = (sd_ref[0] if stacked else sd_ref[:]).astype(jnp.float32)
        sl, sh = sp[0, 0], sp[1, 0]
        lf = (b & 15).astype(jnp.float32).reshape(gpb_d, gs_d, out_blk)
        hf = (b >> 4).astype(jnp.float32).reshape(gpb_d, gs_d, out_blk)
        wl = (lf * sl[:, None, :]).reshape(in_p, out_blk)
        wh = (hf * sh[:, None, :]).reshape(in_p, out_blk)
        half = n_down_in * in_p                            # F/2
        off = pl.multiple_of(i_d * in_p, 128)
        ffe = ff_ref[:, pl.ds(off, in_p)]
        ffo = ff_ref[:, pl.ds(half + off, in_p)]
        acc_ref[:] += (jnp.dot(ffe, wl, preferred_element_type=jnp.float32)
                       + jnp.dot(ffo, wh, preferred_element_type=jnp.float32))
        npad = ffe.shape[0]
        ge = jnp.sum(ffe.reshape(npad, gpb_d, gs_d), axis=2)
        go = jnp.sum(ffo.reshape(npad, gpb_d, gs_d), axis=2)
        acc_ref[:] -= 8.0 * (
            jnp.dot(ge, sl, preferred_element_type=jnp.float32)
            + jnp.dot(go, sh, preferred_element_type=jnp.float32))

        @pl.when(i_d == n_down_in - 1)
        def _():
            ob = out_blk
            xoff = pl.multiple_of(od * ob, 128)
            o_ref[:] = (xn_ref[:, pl.ds(xoff, ob)]
                        + acc_ref[:]).astype(o_ref.dtype)


def _divisor_block(dout: int, limit: int) -> int:
    """Largest 128-multiple divisor of dout that is <= limit (0 if none)."""
    for bo in range(min(dout, max(limit, 0)) // 128 * 128, 0, -128):
        if dout % bo == 0:
            return bo
    return 0


_MLP_GU_BUDGET = 36 * 1024 * 1024
_MLP_DOWN_BUDGET = 52 * 1024 * 1024


def _mlp_blocks(wgu: QuantizedLinear, wdown: QuantizedLinear, npad: int):
    """Static block plan for the fused MLP kernel, or None if unsupported.
    Returns (bo_gu, bid, bo_d, gs_g, gs_d)."""
    if not (wgu.packed_int4 and wdown.packed_int4):
        return None
    if wgu.zeros is not None or wdown.zeros is not None:
        return None
    if wgu.perm is not None or wdown.perm is not None:
        return None
    Rg, GU = wgu.qweight.shape[-2:]
    Rd, D = wdown.qweight.shape[-2:]
    if GU != 4 * Rd:                       # gu out = 2F must pair with F=2*Rd
        return None
    gg, gd = wgu.scales.shape[-2], wdown.scales.shape[-2]
    if gg % 2 or gd % 2:
        return None
    gs_g, gs_d = (2 * Rg) // gg, (2 * Rd) // gd
    if gs_g % 64 or gs_d % 64 or GU % 128 or D % 128 or Rg % gs_g:
        return None
    if Rg > 3584:                          # gu phase runs a single in-block
        return None
    bo_gu = _divisor_block(GU, _MLP_GU_BUDGET // (14 * Rg + 16 * npad))
    bid = _pick_block_in_packed(Rd, gs_d)
    if Rd % bid or bid % gs_d:
        return None
    bo_d = _divisor_block(D, _MLP_DOWN_BUDGET // (14 * bid + 16 * npad))
    if not bo_gu or not bo_d:
        return None
    return bo_gu, bid, bo_d, gs_g, gs_d


def mlp_fusion_supported(x: jax.Array, wgu, wdown) -> bool:
    """Static gate for gptq_mlp_int4: packed-int4 symmetric wgu+wdown with a
    legal block plan, decode-regime row counts (the gu/ff scratches scale
    with rows; verify forwards at K=11 row counts keep the two-call path)."""
    import math
    if not (isinstance(wgu, QuantizedLinear)
            and isinstance(wdown, QuantizedLinear)):
        return False
    n = math.prod(x.shape[:-1])
    if n > 32:
        return False
    npad = max(8, ((n + 7) // 8) * 8)
    return _mlp_blocks(wgu, wdown, npad) is not None


@functools.partial(jax.jit, static_argnames=("interpret", "ln_eps"))
def gptq_mlp_int4(x: jax.Array, wgu: QuantizedLinear, wdown: QuantizedLinear,
                  ln: jax.Array, ln_eps: float = 1e-6, layer_index=None,
                  interpret: bool = False) -> jax.Array:
    """Fused SwiGLU MLP: y = (silu(g) * u) @ deq(wdown) where
    [g | u] = rmsnorm(x, ln) @ deq(wgu) — one pallas_call (see
    _kernel_mlp_int4). x: [..., D] -> [..., D] in x.dtype (no residual add).
    layer_index: both weights LAYER-STACKED, scalar-prefetch select."""
    stacked = layer_index is not None
    Rg, GU = wgu.qweight.shape[-2:]
    Rd, D = wdown.qweight.shape[-2:]
    F = 2 * Rd
    gg, gd = wgu.scales.shape[-2], wdown.scales.shape[-2]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, 2 * Rg)
    n = x2.shape[0]
    npad = max(8, ((n + 7) // 8) * 8)
    if npad != n:
        x2 = jnp.pad(x2, ((0, npad - n), (0, 0)))
    plan = _mlp_blocks(wgu, wdown, npad)
    if plan is None:
        raise ValueError("unsupported fused-MLP shapes; gate with "
                         "mlp_fusion_supported")
    bo_gu, bid, bo_d, gs_g, gs_d = plan
    gpb_g, gpb_d = Rg // gs_g, bid // gs_d
    n_gu_steps = GU // bo_gu
    n_down_in = Rd // bid
    n_down_out = D // bo_d
    grid = (n_gu_steps + n_down_out * n_down_in,)

    xf = x2.astype(jnp.float32)
    xe, xo = xf[:, :Rg], xf[:, Rg:]
    ln2 = ln.astype(jnp.float32).reshape(2, Rg)
    # scale planes pre-shaped for BlockSpec select (see gptq_matmul packed)
    sg = jnp.stack([wgu.scales[..., :gg // 2, :],
                    wgu.scales[..., gg // 2:, :]], axis=-3)
    sg = sg.reshape(*wgu.scales.shape[:-2], 2, 1, gpb_g, GU)
    sd = jnp.stack([wdown.scales[..., :gd // 2, :],
                    wdown.scales[..., gd // 2:, :]], axis=-3)
    sd = sd.reshape(*wdown.scales.shape[:-2], 2, n_down_in, gpb_d, D)

    def _gu_o(s):
        return jnp.minimum(s, n_gu_steps - 1)

    def _dn(s):
        sd_step = jnp.maximum(s - n_gu_steps, 0)
        return sd_step % n_down_in, sd_step // n_down_in

    if stacked:
        wl_ = (1,)
        wg_map = lambda s, p: (p[0], 0, _gu_o(s))
        sg_map = lambda s, p: (p[0], 0, 0, 0, _gu_o(s))
        wd_map = lambda s, p: (p[0], *_dn(s))
        sd_map = lambda s, p: (p[0], 0, _dn(s)[0], 0, _dn(s)[1])
        c_map = lambda s, p: (0, 0)
        o_map = lambda s, p: (0, _dn(s)[1])
    else:
        wl_ = ()
        wg_map = lambda s: (0, _gu_o(s))
        sg_map = lambda s: (0, 0, 0, _gu_o(s))
        wd_map = lambda s: _dn(s)
        sd_map = lambda s: (0, _dn(s)[0], 0, _dn(s)[1])
        c_map = lambda s: (0, 0)
        o_map = lambda s: (0, _dn(s)[1])

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((npad, 2 * Rg), c_map, memory_space=vm),      # xf
        pl.BlockSpec((2, Rg), c_map, memory_space=vm),             # ln2
        pl.BlockSpec((npad, Rg), c_map, memory_space=vm),          # xe
        pl.BlockSpec((npad, Rg), c_map, memory_space=vm),          # xo
        pl.BlockSpec((*wl_, Rg, bo_gu), wg_map, memory_space=vm),  # wgu
        pl.BlockSpec((*wl_, 2, 1, gpb_g, bo_gu), sg_map,
                     memory_space=vm),                             # sg
        pl.BlockSpec((*wl_, bid, bo_d), wd_map, memory_space=vm),  # wdown
        pl.BlockSpec((*wl_, 2, 1, gpb_d, bo_d), sd_map,
                     memory_space=vm),                             # sd
    ]
    args = [xf, ln2, xe, xo, wgu.qweight, sg, wdown.qweight, sd]
    kern = functools.partial(
        _kernel_mlp_int4, gpb_g=gpb_g, gs_g=gs_g, gpb_d=gpb_d, gs_d=gs_d,
        n_gu_steps=n_gu_steps, n_down_in=n_down_in, bo_gu=bo_gu, eps=ln_eps,
        stacked=stacked)
    out_spec = pl.BlockSpec((npad, bo_d), o_map, memory_space=vm)
    scratch = [pltpu.VMEM((npad, GU), jnp.float32),    # gu
               pltpu.VMEM((npad, F), jnp.float32),     # ff
               pltpu.VMEM((npad, bo_d), jnp.float32)]  # down acc
    common = dict(
        out_shape=jax.ShapeDtypeStruct((npad, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * (2 * Rg * GU + F * D),
            bytes_accessed=Rg * GU + Rd * D + npad * (2 * Rg + D) * 4,
            transcendentals=npad * F),
        interpret=interpret,
    )
    if stacked:
        lidx = jnp.atleast_1d(layer_index).astype(jnp.int32)
        inner = kern
        kern = lambda s_ref, *refs: inner(*refs)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=out_spec, scratch_shapes=scratch),
            **common,
        )(lidx, *args)
    else:
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
            scratch_shapes=scratch, **common,
        )(*args)
    return out[:n].reshape(*lead, D)


_AM_WO_BUDGET = 24 * 1024 * 1024
_AM_GU_BUDGET = 37 * 1024 * 1024
_AM_DOWN_BUDGET = 52 * 1024 * 1024


def _attn_mlp_blocks(wo: QuantizedLinear, wgu: QuantizedLinear,
                     wdown: QuantizedLinear, npad: int):
    """Static block plan for the attn+MLP mega-kernel, or None.
    Returns (bo_wo, bo_gu, bid, bo_d, gs_w, gs_g, gs_d)."""
    base = _mlp_blocks(wgu, wdown, npad)
    if base is None:
        return None
    if not wo.packed_int4 or wo.zeros is not None or wo.perm is not None:
        return None
    Rw, D = wo.qweight.shape[-2:]
    Rg = wgu.qweight.shape[-2]
    if D != 2 * Rg:                        # wo out must feed the MLP in-dim
        return None
    gw = wo.scales.shape[-2]
    if gw % 2:
        return None
    gs_w = (2 * Rw) // gw
    if gs_w % 64 or Rw % gs_w or Rw > 3584:  # single in-block wo phase
        return None
    _, bid, _, gs_g, gs_d = base
    # tighter per-stream budgets: three weight streams share VMEM
    bo_wo = _divisor_block(D, _AM_WO_BUDGET // (14 * Rw + 16 * npad))
    GU = wgu.qweight.shape[-1]
    bo_gu = _divisor_block(GU, _AM_GU_BUDGET // (14 * Rg + 16 * npad))
    Dd = wdown.qweight.shape[-1]
    bo_d = _divisor_block(Dd, _AM_DOWN_BUDGET // (14 * bid + 16 * npad))
    if not bo_wo or not bo_gu or not bo_d:
        return None
    return bo_wo, bo_gu, bid, bo_d, gs_w, gs_g, gs_d


def attn_mlp_fusion_supported(att: jax.Array, wo, wgu, wdown) -> bool:
    """Static gate for gptq_attn_mlp_int4 (wo + residual + SwiGLU MLP +
    residual as one pallas_call): all three packed-int4 symmetric, legal
    plan, decode-regime rows."""
    import math
    if not all(isinstance(w, QuantizedLinear) for w in (wo, wgu, wdown)):
        return False
    n = math.prod(att.shape[:-1])
    if n > 32:
        return False
    if att.shape[-1] != 2 * wo.qweight.shape[-2]:
        return False
    npad = max(8, ((n + 7) // 8) * 8)
    return _attn_mlp_blocks(wo, wgu, wdown, npad) is not None


@functools.partial(jax.jit, static_argnames=("interpret", "ln_eps"))
def gptq_attn_mlp_int4(att: jax.Array, resid: jax.Array,
                       wo: QuantizedLinear, wgu: QuantizedLinear,
                       wdown: QuantizedLinear, ln: jax.Array,
                       ln_eps: float = 1e-6, layer_index=None,
                       interpret: bool = False) -> jax.Array:
    """One pallas_call for the layer tail: x' = resid + att @ deq(wo);
    return x' + (silu(g) * u) @ deq(wdown) with [g | u] =
    rmsnorm(x', ln) @ deq(wgu). att: [..., Dh]; resid: [..., D];
    returns [..., D] in resid.dtype (the full new layer activation)."""
    stacked = layer_index is not None
    Rw, D = wo.qweight.shape[-2:]
    Rg, GU = wgu.qweight.shape[-2:]
    Rd, _ = wdown.qweight.shape[-2:]
    F = 2 * Rd
    gw = wo.scales.shape[-2]
    gg, gd = wgu.scales.shape[-2], wdown.scales.shape[-2]
    lead = att.shape[:-1]
    a2 = att.reshape(-1, 2 * Rw)
    r2 = resid.reshape(-1, D)
    n = a2.shape[0]
    npad = max(8, ((n + 7) // 8) * 8)
    if npad != n:
        a2 = jnp.pad(a2, ((0, npad - n), (0, 0)))
        r2 = jnp.pad(r2, ((0, npad - n), (0, 0)))
    plan = _attn_mlp_blocks(wo, wgu, wdown, npad)
    if plan is None:
        raise ValueError("unsupported attn+MLP shapes; gate with "
                         "attn_mlp_fusion_supported")
    bo_wo, bo_gu, bid, bo_d, gs_w, gs_g, gs_d = plan
    gpb_w, gpb_g, gpb_d = Rw // gs_w, Rg // gs_g, bid // gs_d
    n_wo_steps = D // bo_wo
    n_gu_steps = GU // bo_gu
    n_down_in = Rd // bid
    n_down_out = D // bo_d
    grid = (n_wo_steps + n_gu_steps + n_down_out * n_down_in,)

    af = a2.astype(jnp.float32)
    ae, ao = af[:, :Rw], af[:, Rw:]
    ln2 = ln.astype(jnp.float32).reshape(2, Rg)

    def _plane(scales, gtot, nblk, gpb, dout):
        s3 = jnp.stack([scales[..., :gtot // 2, :],
                        scales[..., gtot // 2:, :]], axis=-3)
        return s3.reshape(*scales.shape[:-2], 2, nblk, gpb, dout)

    so = _plane(wo.scales, gw, 1, gpb_w, D)
    sg = _plane(wgu.scales, gg, 1, gpb_g, GU)
    sd = _plane(wdown.scales, gd, n_down_in, gpb_d, D)

    def _wo_o(s):
        return jnp.minimum(s, n_wo_steps - 1)

    def _gu_o(s):
        return jnp.clip(s - n_wo_steps, 0, n_gu_steps - 1)

    def _dn(s):
        t = jnp.maximum(s - n_wo_steps - n_gu_steps, 0)
        return t % n_down_in, t // n_down_in

    if stacked:
        wl_ = (1,)
        wo_map = lambda s, p: (p[0], 0, _wo_o(s))
        so_map = lambda s, p: (p[0], 0, 0, 0, _wo_o(s))
        wg_map = lambda s, p: (p[0], 0, _gu_o(s))
        sg_map = lambda s, p: (p[0], 0, 0, 0, _gu_o(s))
        wd_map = lambda s, p: (p[0], *_dn(s))
        sd_map = lambda s, p: (p[0], 0, _dn(s)[0], 0, _dn(s)[1])
        c_map = lambda s, p: (0, 0)
        r_map = lambda s, p: (0, _wo_o(s))
        o_map = lambda s, p: (0, _dn(s)[1])
    else:
        wl_ = ()
        wo_map = lambda s: (0, _wo_o(s))
        so_map = lambda s: (0, 0, 0, _wo_o(s))
        wg_map = lambda s: (0, _gu_o(s))
        sg_map = lambda s: (0, 0, 0, _gu_o(s))
        wd_map = lambda s: _dn(s)
        sd_map = lambda s: (0, _dn(s)[0], 0, _dn(s)[1])
        c_map = lambda s: (0, 0)
        r_map = lambda s: (0, _wo_o(s))
        o_map = lambda s: (0, _dn(s)[1])

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((npad, Rw), c_map, memory_space=vm),          # ae
        pl.BlockSpec((npad, Rw), c_map, memory_space=vm),          # ao
        pl.BlockSpec((npad, bo_wo), r_map, memory_space=vm),       # resid
        pl.BlockSpec((2, Rg), c_map, memory_space=vm),             # ln2
        pl.BlockSpec((*wl_, Rw, bo_wo), wo_map, memory_space=vm),  # wo
        pl.BlockSpec((*wl_, 2, 1, gpb_w, bo_wo), so_map,
                     memory_space=vm),
        pl.BlockSpec((*wl_, Rg, bo_gu), wg_map, memory_space=vm),  # wgu
        pl.BlockSpec((*wl_, 2, 1, gpb_g, bo_gu), sg_map,
                     memory_space=vm),
        pl.BlockSpec((*wl_, bid, bo_d), wd_map, memory_space=vm),  # wdown
        pl.BlockSpec((*wl_, 2, 1, gpb_d, bo_d), sd_map,
                     memory_space=vm),
    ]
    args = [ae, ao, r2.astype(jnp.float32), ln2, wo.qweight, so,
            wgu.qweight, sg, wdown.qweight, sd]
    kern = functools.partial(
        _kernel_attn_mlp_int4, gpb_w=gpb_w, gs_w=gs_w, gpb_g=gpb_g,
        gs_g=gs_g, gpb_d=gpb_d, gs_d=gs_d, n_wo_steps=n_wo_steps,
        n_gu_steps=n_gu_steps, n_down_in=n_down_in, bo_wo=bo_wo,
        bo_gu=bo_gu, eps=ln_eps, stacked=stacked)
    out_spec = pl.BlockSpec((npad, bo_d), o_map, memory_space=vm)
    scratch = [pltpu.VMEM((npad, D), jnp.float32),     # x' = resid + wo
               pltpu.VMEM((npad, GU), jnp.float32),    # gu
               pltpu.VMEM((npad, F), jnp.float32),     # ff
               pltpu.VMEM((npad, bo_d), jnp.float32)]  # down acc
    common = dict(
        out_shape=jax.ShapeDtypeStruct((npad, D), resid.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=124 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * (2 * Rw * D + 2 * Rg * GU + F * D),
            bytes_accessed=Rw * D + Rg * GU + Rd * D
            + npad * (2 * Rw + 2 * D) * 4,
            transcendentals=npad * F),
        interpret=interpret,
    )
    if stacked:
        lidx = jnp.atleast_1d(layer_index).astype(jnp.int32)
        inner = kern
        kern = lambda s_ref, *refs: inner(*refs)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=out_spec, scratch_shapes=scratch),
            **common,
        )(lidx, *args)
    else:
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
            scratch_shapes=scratch, **common,
        )(*args)
    return out[:n].reshape(*lead, D)


def batched_rows_ok(x: jax.Array, qw: QuantizedLinear,
                    vmem_cap_mb: int = 8) -> bool:
    """Feasibility check for the BATCHED-row regime (rows > 128, bf16-MXU
    serving path): with the wide f32 x tile in the VMEM budget, does a
    legal (>= 128) out-block survive? Mirrors gptq_matmul's auto-pick."""
    import math
    packed = qw.qweight.dtype == jnp.uint8
    rows = qw.qweight.shape[-2]
    din = 2 * rows if packed else rows
    groups = qw.scales.shape[-2]
    gs_k = din // groups
    n = math.prod(x.shape[:-1])
    npad = max(8, ((n + 7) // 8) * 8)
    block_in = (_pick_block_in_packed(rows, gs_k) if packed
                else _pick_block_in(rows, gs_k))
    block_in = min(block_in, rows)
    return _out_block_limit(packed, block_in, npad,
                            vmem_cap_mb * 1024 * 1024, raw=True) >= 128


def pallas_supported(x: jax.Array, qw: QuantizedLinear) -> bool:
    """Static check whether the Pallas path handles these shapes (2D weights
    or layer-stacked 3D with a layer_index)."""
    rows, dout = qw.qweight.shape[-2:]
    groups = qw.scales.shape[-2]
    if qw.qweight.dtype == jnp.uint8:      # nibble-packed int4
        din = 2 * rows
        gs = din // groups
        # split-half pairing needs each nibble plane to span WHOLE groups
        # (groups even); gs sets the packed rows per plane-group (sublane
        # constraints on the reshape)
        if din % gs or gs % 64 or dout % 128 or groups % 2:
            return False
        return True
    if qw.qweight.dtype != jnp.int8:
        return False
    din = rows
    gs = din // groups
    if din % gs or gs % 128 or dout % 128:
        return False
    return True
