"""GPTQ quantized-linear tests: XLA path vs reference dequant, and the Pallas
kernel (interpret mode on CPU) vs both (SURVEY.md §4 "Kernel" tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.ops.linear import (QuantizedLinear, _gptq_matmul_xla, apply_linear,
                                dequantize, quantize)
from hsd_tpu.ops.gptq_pallas import gptq_matmul, pallas_supported


def _mk(key, din=256, dout=384, bits=8, group_size=128, symmetric=False):
    kw, kx = jax.random.split(key)
    w = jax.random.normal(kw, (din, dout), jnp.float32) * 0.05
    qw = quantize(w, bits=bits, group_size=group_size, symmetric=symmetric)
    x = jax.random.normal(kx, (4, din), jnp.float32)
    return w, qw, x


@pytest.mark.parametrize("bits,symmetric",
                         [(8, False), (8, True), (4, False), (4, True)])
def test_quantize_roundtrip(bits, symmetric):
    w, qw, _ = _mk(jax.random.PRNGKey(0), bits=bits, symmetric=symmetric)
    wd = dequantize(qw, jnp.float32)
    err = jnp.abs(wd - w).max() / jnp.abs(w).max()
    # quantization step bound: range/2^bits
    assert float(err) < (0.02 if bits == 8 else 0.2), float(err)


@pytest.mark.parametrize("symmetric", [False, True])
def test_xla_matmul_matches_dequant(symmetric):
    w, qw, x = _mk(jax.random.PRNGKey(1), symmetric=symmetric)
    want = x @ dequantize(qw, jnp.float32)
    got = _gptq_matmul_xla(x, qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("symmetric", [False, True])
def test_pallas_kernel_interpret(symmetric):
    w, qw, x = _mk(jax.random.PRNGKey(2), din=512, dout=512,
                   symmetric=symmetric)
    assert pallas_supported(x, qw)
    want = x @ dequantize(qw, jnp.float32)
    got = gptq_matmul(x, qw, block_out=256, block_in=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_kernel_ragged_rows():
    """Row counts that need sublane padding."""
    w, qw, _ = _mk(jax.random.PRNGKey(3), din=256, dout=256)
    for n in (1, 3, 11):
        x = jax.random.normal(jax.random.PRNGKey(n), (n, 256), jnp.float32)
        want = x @ dequantize(qw, jnp.float32)
        got = gptq_matmul(x, qw, block_out=128, block_in=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_apply_linear_dispatches_quantized():
    w, qw, x = _mk(jax.random.PRNGKey(4))
    got = apply_linear(qw, x)
    want = x @ dequantize(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


# ---- packed int4 (uint8 nibble container, ops/linear.pack_int4) ----

from hsd_tpu.ops.linear import pack_int4, unpack_int4


def test_pack_unpack_int4_roundtrip():
    key = jax.random.PRNGKey(5)
    codes = jax.random.randint(key, (256, 128), -8, 8, jnp.int32).astype(jnp.int8)
    packed = pack_int4(codes)
    assert packed.dtype == jnp.uint8 and packed.shape == (128, 128)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)),
                                  np.asarray(codes))


@pytest.mark.parametrize("symmetric", [False, True])
def test_int4_packed_xla_matmul(symmetric):
    w, qw, x = _mk(jax.random.PRNGKey(6), bits=4, symmetric=symmetric)
    assert qw.packed_int4 and qw.din == 256
    want = x @ dequantize(qw, jnp.float32)
    got = _gptq_matmul_xla(x, qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("symmetric", [False, True])
def test_int4_pallas_kernel_interpret(symmetric):
    w, qw, x = _mk(jax.random.PRNGKey(7), din=512, dout=512, bits=4,
                   symmetric=symmetric)
    assert pallas_supported(x, qw)
    want = x @ dequantize(qw, jnp.float32)
    got = gptq_matmul(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_int4_pallas_multiblock_interpret():
    """Group-sliced scales path: several in-blocks over packed rows."""
    w, qw, x = _mk(jax.random.PRNGKey(8), din=4096, dout=256, bits=4)
    want = x @ dequantize(qw, jnp.float32)
    got = gptq_matmul(x, qw, block_out=128, block_in=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("symmetric", [False, True])
def test_int4_wide_rows_bf16_planes(symmetric):
    """npad >= 32 routes the packed activation planes through bf16 (the
    K=11 verify-forward traffic fix); parity holds at bf16 tolerance."""
    w, qw, _ = _mk(jax.random.PRNGKey(70), din=512, dout=384, bits=4,
                   symmetric=symmetric)
    x = jax.random.normal(jax.random.PRNGKey(71), (40, 512), jnp.float32)
    want = x @ dequantize(qw, jnp.float32)
    got = gptq_matmul(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # fused-norm variant at wide rows
    if symmetric:
        g = jnp.abs(jax.random.normal(jax.random.PRNGKey(72), (512,))) + 0.5
        xf = x.astype(jnp.float32)
        xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6) * g
        want2 = xn @ dequantize(qw, jnp.float32)
        got2 = gptq_matmul(x, qw, interpret=True, ln=g, ln_eps=1e-6)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=2e-2, atol=2e-2)


def test_int4_apply_linear_dispatch():
    w, qw, x = _mk(jax.random.PRNGKey(9), bits=4)
    got = apply_linear(qw, x)
    want = x @ dequantize(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bits,symmetric",
                         [(8, False), (8, True), (4, False), (4, True)])
def test_stacked_layer_index_kernel_interpret(bits, symmetric):
    """Layer-stacked weights + scalar-prefetch layer select: for every layer
    index, gptq_matmul(x, stacked, layer_index=l) must equal the 2D kernel on
    that layer's slice (the zero-copy read path the decode scan uses —
    gptq_pallas.py layer_index docstring)."""
    L = 3
    qs = [_mk(jax.random.PRNGKey(10 + i), din=512, dout=256, bits=bits,
              symmetric=symmetric)[1] for i in range(L)]
    stacked = QuantizedLinear(
        qweight=jnp.stack([q.qweight for q in qs]),
        scales=jnp.stack([q.scales for q in qs]),
        zeros=None if qs[0].zeros is None else
        jnp.stack([q.zeros for q in qs]))
    x = jax.random.normal(jax.random.PRNGKey(99), (4, 512), jnp.float32)
    for l in range(L):
        want = x @ dequantize(qs[l], jnp.float32)
        got = gptq_matmul(x, stacked, block_out=128, block_in=256,
                          interpret=True, layer_index=jnp.int32(l))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4, err_msg=f"layer {l}")


def test_apply_linear_layer_dispatch():
    """apply_linear(..., layer=) on stacked quantized and dense weights."""
    L = 2
    qs = [_mk(jax.random.PRNGKey(20 + i), din=256, dout=128)[1]
          for i in range(L)]
    stacked = QuantizedLinear(qweight=jnp.stack([q.qweight for q in qs]),
                              scales=jnp.stack([q.scales for q in qs]),
                              zeros=jnp.stack([q.zeros for q in qs]))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 256), jnp.float32)
    for l in range(L):
        got = apply_linear(stacked, x, layer=jnp.int32(l))
        want = x @ dequantize(qs[l], jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
    wd = jnp.stack([jax.random.normal(jax.random.PRNGKey(30 + i), (256, 128))
                    for i in range(L)])
    for l in range(L):
        got = apply_linear(wd, x, layer=jnp.int32(l))
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ wd[l]),
                                   rtol=1e-5, atol=1e-5)


def test_int4_odd_group_count_gated():
    """Split-half packing needs an even group count; odd-G shapes (e.g. the
    0.5B din=896 at gs=128 -> 7 groups) must be gated OFF the Pallas path
    (apply_linear then uses XLA) and gptq_matmul must raise a clear error
    rather than a cryptic block assert."""
    from hsd_tpu.ops.gptq_pallas import gptq_matmul, pallas_supported
    w, qw, x = _mk(jax.random.PRNGKey(3), din=896, dout=1152, bits=4,
                   symmetric=True)
    assert qw.packed_int4
    assert not pallas_supported(x, qw)
    with pytest.raises(ValueError, match="even group count"):
        gptq_matmul(x, qw, interpret=True)
    # the dispatcher still computes it (XLA path)
    got = apply_linear(qw, x)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(x @ dequantize(qw), np.float32),
                               rtol=2e-2, atol=2e-2)


import math


@pytest.mark.parametrize("bits,symmetric",
                         [(4, True), (4, False), (8, True), (8, False)])
def test_ragged_out_blocks(bits, symmetric):
    """Prime-factor douts (e.g. 1664 = 128 * 13, and Qwen's 151936 =
    128 * 1187) have no wide divisor out-block; BOTH kernel paths take a
    WIDE RAGGED final block over 128-wide tiles (r3/r4: narrow tiles ran
    1187 grid steps on the [D, V] head). block_out=512 on dout=1664 forces a
    genuinely ragged grid (4 steps, edge block covers 128 of 512 lanes) so
    Mosaic's padded-edge-block behavior — the correctness assumption the
    feature relies on — is actually exercised. Parity vs dequant across the
    ragged edge; the external zero correction (asymmetric / packed -8 shift)
    composes with ragged blocks."""
    from hsd_tpu.ops.gptq_pallas import gptq_matmul, pallas_supported
    dout, bo = 1664, 512
    assert math.ceil(dout / bo) > dout // bo     # genuinely ragged
    w, qw, x = _mk(jax.random.PRNGKey(11 + bits), din=512, dout=dout,
                   bits=bits, symmetric=symmetric)
    assert pallas_supported(x, qw)
    got = gptq_matmul(x, qw, block_out=bo, interpret=True)
    want = x @ dequantize(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("bits,din,dout,bi,bo", [
    (8, 512, 512, 0, 0),       # single in-block
    (8, 4096, 256, 1024, 128),  # multi in-block, group-sliced scales
    (4, 512, 512, 0, 0),
    (4, 4096, 256, 1024, 128),
    (4, 512, 1664, 0, 512),    # ragged out-blocks compose with fusion
])
def test_fused_rms_norm_parity(bits, din, dout, bi, bo):
    """gptq_matmul(ln=g) == rmsnorm-then-matmul (NEXT.md r3 item 1: the norm
    computed in the kernel's activation read; packed path additionally folds
    the -8 correction on normed group sums in-kernel)."""
    w, qw, x = _mk(jax.random.PRNGKey(31 + bits), din=din, dout=dout,
                   bits=bits, symmetric=True)
    g = jax.random.normal(jax.random.PRNGKey(7), (din,), jnp.float32) * 0.5 + 1.0
    eps = 1e-6
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * g
    want = xn @ dequantize(qw, jnp.float32)
    got = gptq_matmul(x, qw, block_in=bi, block_out=bo, interpret=True,
                      ln=g, ln_eps=eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_fused_rms_norm_stacked():
    """Fusion composes with the layer-stacked scalar-prefetch path."""
    L = 2
    qs = [_mk(jax.random.PRNGKey(40 + i), din=512, dout=256, bits=4,
              symmetric=True)[1] for i in range(L)]
    stacked = QuantizedLinear(qweight=jnp.stack([q.qweight for q in qs]),
                              scales=jnp.stack([q.scales for q in qs]),
                              zeros=None)
    x = jax.random.normal(jax.random.PRNGKey(41), (2, 512), jnp.float32)
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(42), (512,))) + 0.5
    eps = 1e-6
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * g
    for l in range(L):
        want = xn @ dequantize(qs[l], jnp.float32)
        got = gptq_matmul(x, stacked, block_in=256, block_out=128,
                          interpret=True, layer_index=jnp.int32(l),
                          ln=g, ln_eps=eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4, err_msg=f"layer {l}")


def test_fused_rms_norm_asymmetric_rejected():
    w, qw, x = _mk(jax.random.PRNGKey(50), bits=8, symmetric=False)
    g = jnp.ones((256,), jnp.float32)
    with pytest.raises(ValueError, match="symmetric"):
        gptq_matmul(x, qw, interpret=True, ln=g)


def test_apply_linear_rms_dispatch():
    """apply_linear(rms=...) matches norm-then-matmul on every path:
    quantized symmetric (fused), quantized asymmetric (XLA pre-norm),
    dense."""
    from hsd_tpu.models.transformer import rms_norm
    eps = 1e-6
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(60), (256,))) + 0.5
    for sym in (True, False):
        w, qw, x = _mk(jax.random.PRNGKey(61 + sym), symmetric=sym)
        got = apply_linear(qw, x, rms=(g, eps))
        want = apply_linear(qw, rms_norm(x, g, eps))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
    wd = jax.random.normal(jax.random.PRNGKey(63), (256, 128), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(64), (3, 256), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(apply_linear(wd, x, rms=(g, eps))),
        np.asarray(apply_linear(wd, rms_norm(x, g, eps))),
        rtol=1e-5, atol=1e-5)


def test_auto_block_out_prefers_wide_ragged():
    """ADVICE r3: the wide-ragged preference must be reachable from the
    AUTO-pick path — a dout with no wide divisor and a VMEM limit below dout
    must yield a wide non-divisor block, not 128."""
    from hsd_tpu.ops.gptq_pallas import _out_block_limit
    # Qwen head at 14B geometry: packed rows=2560, V=151936
    limit = _out_block_limit(True, 2560, 8, 8 * 1024 * 1024)
    assert limit >= 1280 and limit % 128 == 0
    bo = 151936 if 151936 <= limit else limit
    assert bo > 128 and 151936 % bo != 0         # wide AND ragged
    # int8 at 0.5B-head geometry: rows=896
    limit8 = _out_block_limit(False, 896, 8, 8 * 1024 * 1024)
    assert limit8 > 128 and limit8 % 128 == 0


def test_auto_one_out_block_small_packed():
    """r5 wqkv rule: a SMALL packed weight whose auto in-block would split
    the out-dim must instead shrink the in-block until the whole dout fits
    one out-block (e2e-measured win, docs/BENCHMARKS.md r5 wqkv section) —
    and stay exact. din=1280/dout=6144 triggers the branch at npad=8
    (auto bi=640 -> limit ~5.5k < 6144; bi=128 fits one block), and the
    parity run takes the multi-in-block accumulation path it selects."""
    from hsd_tpu.ops.gptq_pallas import _out_block_limit, _pick_block_in_packed
    rows, dout = 640, 6144                        # packed rows = din/2
    bi_auto = _pick_block_in_packed(rows, 128)
    assert bi_auto == 640
    assert _out_block_limit(True, bi_auto, 8, 0) < dout   # rule fires
    assert _out_block_limit(True, 128, 8, 0) >= dout      # and can land
    w, qw, x = _mk(jax.random.PRNGKey(80), din=1280, dout=dout, bits=4,
                   symmetric=True)
    want = x @ dequantize(qw, jnp.float32)
    got = gptq_matmul(x, qw, interpret=True)      # AUTO blocks
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bits", [8, 4])
def test_mxu_bf16_kernel_close_to_xla(bits):
    """bf16-MXU operand mode (slot-batched serving, ModelConfig.
    gptq_mxu_bf16): same math as the f32 kernel within bf16 rounding.
    Codes are bf16-exact; only activation/dequant-product rounding moves."""
    w, qw, _ = _mk(jax.random.PRNGKey(70), din=512, dout=512, bits=bits,
                   symmetric=True)
    x = jax.random.normal(jax.random.PRNGKey(71), (160, 512), jnp.float32)
    # int4 stores UNSIGNED nibbles (0..15): the bf16 products are ~2x the
    # logical |code|<=8 magnitudes and the -8 fold subtracts two rounded
    # sums, so its absolute error doubles vs int8 (still ~bf16 eps * sqrt
    # of the 512-term reduction)
    tol = dict(rtol=2e-2, atol=2e-2) if bits == 8 else \
        dict(rtol=5e-2, atol=8e-2)
    want = x @ dequantize(qw, jnp.float32)
    got = gptq_matmul(x, qw, block_out=256, block_in=256, interpret=True,
                      mxu_bf16=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)
    # fused-norm variants too (the serving forward runs them)
    from hsd_tpu.models.transformer import rms_norm
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(72), (512,))) + 0.5
    want_ln = rms_norm(x, g, 1e-6).astype(jnp.float32) @ dequantize(
        qw, jnp.float32)
    got_ln = gptq_matmul(x, qw, block_out=256, block_in=256, interpret=True,
                         mxu_bf16=True, ln=g, ln_eps=1e-6)
    np.testing.assert_allclose(np.asarray(got_ln), np.asarray(want_ln),
                               **tol)


def test_batched_rows_gate():
    """The bf16-MXU serving gate (_use_pallas + batched_rows_ok): feasible
    8B-decode shapes pass at tree-forward row counts; shapes whose wide x
    tile leaves no legal out-block under the VMEM budget are rejected."""
    from hsd_tpu.ops.gptq_pallas import batched_rows_ok
    qw = QuantizedLinear(
        qweight=jnp.zeros((4096, 6144), jnp.int8),
        scales=jnp.ones((32, 6144), jnp.float32), zeros=None)
    assert batched_rows_ok(jnp.zeros((240, 4096), jnp.float32), qw)
    assert batched_rows_ok(jnp.zeros((960, 4096), jnp.float32), qw)
    # 14B gu shape at prefill row counts: the f32 x tile alone exceeds the
    # working budget -> no legal out-block (1024 rows squeaks by at
    # limit=157; _use_pallas caps rows at 1024 anyway)
    qw14 = QuantizedLinear(
        qweight=jnp.zeros((5120, 27648), jnp.int8),
        scales=jnp.ones((40, 27648), jnp.float32), zeros=None)
    assert batched_rows_ok(jnp.zeros((1024, 5120), jnp.float32), qw14)
    assert not batched_rows_ok(jnp.zeros((1280, 5120), jnp.float32), qw14)


def _mk_mlp(key, D=512, F=1536, bits=4, symmetric=True):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    qgu = quantize(jax.random.normal(k1, (D, 2 * F)) * 0.05, bits=bits,
                   symmetric=symmetric)
    qdn = quantize(jax.random.normal(k2, (F, D)) * 0.05, bits=bits,
                   symmetric=symmetric)
    ln = jnp.abs(jax.random.normal(k3, (D,))) + 0.5
    x = jax.random.normal(k4, (3, D), jnp.float32)
    return qgu, qdn, ln, x


def _mlp_ref(qgu, qdn, ln, x, F):
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6) * ln
    gu = xn @ dequantize(qgu, jnp.float32)
    ff = jax.nn.silu(gu[:, :F]) * gu[:, F:]
    return ff @ dequantize(qdn, jnp.float32)


def test_fused_mlp_kernel_interpret():
    """Single-pallas_call SwiGLU MLP (gu -> silu*up -> down with both -8
    corrections in-kernel) matches the dequantize composition."""
    from hsd_tpu.ops.gptq_pallas import gptq_mlp_int4, mlp_fusion_supported
    qgu, qdn, ln, x = _mk_mlp(jax.random.PRNGKey(0))
    assert mlp_fusion_supported(x, qgu, qdn)
    want = _mlp_ref(qgu, qdn, ln, x, 1536)
    got = gptq_mlp_int4(x, qgu, qdn, ln, ln_eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_mlp_stacked_interpret():
    from hsd_tpu.ops.gptq_pallas import gptq_mlp_int4
    qgu, qdn, ln, x = _mk_mlp(jax.random.PRNGKey(1))
    sgu = jax.tree.map(lambda *a: jnp.stack(a), qgu, qgu, qgu)
    sdn = jax.tree.map(lambda *a: jnp.stack(a), qdn, qdn, qdn)
    want = _mlp_ref(qgu, qdn, ln, x, 1536)
    got = gptq_mlp_int4(x, sgu, sdn, ln, ln_eps=1e-6,
                        layer_index=jnp.int32(2), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_mlp_multiblock_down(monkeypatch):
    """Multi-in-block down phase (the 14B wdown splits its packed rows)."""
    import hsd_tpu.ops.gptq_pallas as gp
    orig = gp._pick_block_in_packed
    monkeypatch.setattr(gp, "_pick_block_in_packed",
                        lambda rows, gs, target=3584: orig(rows, gs, 256))
    qgu, qdn, ln, x = _mk_mlp(jax.random.PRNGKey(2))
    plan = gp._mlp_blocks(qgu, qdn, 8)
    assert plan is not None and plan[1] == 256  # bid -> n_down_in = 3
    want = _mlp_ref(qgu, qdn, ln, x, 1536)
    got = jax.jit(lambda *a: gp.gptq_mlp_int4(
        *a, ln_eps=1e-6, interpret=True))(x, qgu, qdn, ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_mlp_gating():
    """mlp_fusion_supported rejects asymmetric/int8/perm/batched shapes."""
    from hsd_tpu.ops.gptq_pallas import mlp_fusion_supported
    qgu, qdn, ln, x = _mk_mlp(jax.random.PRNGKey(3))
    assert mlp_fusion_supported(x, qgu, qdn)
    a_gu, a_dn, _, _ = _mk_mlp(jax.random.PRNGKey(3), symmetric=False)
    assert not mlp_fusion_supported(x, a_gu, a_dn)       # asymmetric
    i8gu, i8dn, _, _ = _mk_mlp(jax.random.PRNGKey(3), bits=8)
    assert not mlp_fusion_supported(x, i8gu, i8dn)       # int8 codes
    perm = jnp.arange(512, dtype=jnp.int32)
    assert not mlp_fusion_supported(x, qgu._replace(perm=perm), qdn)
    big = jnp.zeros((40, 512), jnp.float32)              # batched rows
    assert not mlp_fusion_supported(big, qgu, qdn)
    assert not mlp_fusion_supported(x, qdn, qgu)         # mismatched pair


def test_apply_mlp_dispatch_and_fallback():
    """apply_mlp: forced-pallas fused path matches the two-call fallback
    (which itself must be bit-identical to the inline composition)."""
    from hsd_tpu.ops.linear import apply_mlp
    qgu, qdn, ln, x = _mk_mlp(jax.random.PRNGKey(4))
    want = _mlp_ref(qgu, qdn, ln, x, 1536)
    got_fb = apply_mlp(qgu, qdn, x, ln, 1e-6, path="xla")
    np.testing.assert_allclose(np.asarray(got_fb), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    got_pl = apply_mlp(qgu, qdn, x, ln, 1e-6, path="pallas")
    np.testing.assert_allclose(np.asarray(got_pl), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # stacked pair + layer index through the dispatcher
    sgu = jax.tree.map(lambda *a: jnp.stack(a), qgu, qgu)
    sdn = jax.tree.map(lambda *a: jnp.stack(a), qdn, qdn)
    got_st = apply_mlp(sgu, sdn, x, ln, 1e-6, layer=jnp.int32(1),
                       path="pallas")
    np.testing.assert_allclose(np.asarray(got_st), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_attn_mlp_kernel_interpret():
    """Mega-kernel (wo + residual + SwiGLU MLP + residual in one
    pallas_call) matches the dequantize composition, incl. stacked and
    multi-block plans."""
    import hsd_tpu.ops.gptq_pallas as gp
    D, F = 512, 1536
    ks = jax.random.split(jax.random.PRNGKey(9), 8)
    qwo = quantize(jax.random.normal(ks[0], (D, D)) * 0.05, bits=4,
                   symmetric=True)
    qgu = quantize(jax.random.normal(ks[1], (D, 2 * F)) * 0.05, bits=4,
                   symmetric=True)
    qdn = quantize(jax.random.normal(ks[2], (F, D)) * 0.05, bits=4,
                   symmetric=True)
    ln = jnp.abs(jax.random.normal(ks[3], (D,))) + 0.5
    att = jax.random.normal(ks[4], (3, D), jnp.float32)
    resid = jax.random.normal(ks[5], (3, D), jnp.float32)
    assert gp.attn_mlp_fusion_supported(att, qwo, qgu, qdn)
    xn = resid + att @ dequantize(qwo, jnp.float32)
    xr = xn * jax.lax.rsqrt(
        jnp.mean(xn * xn, -1, keepdims=True) + 1e-6) * ln
    gu = xr @ dequantize(qgu, jnp.float32)
    ff = jax.nn.silu(gu[:, :F]) * gu[:, F:]
    want = xn + ff @ dequantize(qdn, jnp.float32)
    got = gp.gptq_attn_mlp_int4(att, resid, qwo, qgu, qdn, ln,
                                ln_eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    st = lambda q: jax.tree.map(lambda *a: jnp.stack(a), q, q)
    got_st = gp.gptq_attn_mlp_int4(att, resid, st(qwo), st(qgu), st(qdn),
                                   ln, ln_eps=1e-6,
                                   layer_index=jnp.int32(1), interpret=True)
    np.testing.assert_allclose(np.asarray(got_st), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # gating: asymmetric wo / batched rows / mismatched wo out-dim
    a_wo = quantize(jax.random.normal(ks[6], (D, D)) * 0.05, bits=4,
                    symmetric=False)
    assert not gp.attn_mlp_fusion_supported(att, a_wo, qgu, qdn)
    assert not gp.attn_mlp_fusion_supported(
        jnp.zeros((40, D), jnp.float32), qwo, qgu, qdn)
    assert not gp.attn_mlp_fusion_supported(att, qdn, qgu, qdn)


def test_attn_mlp_multiblock_interpret(monkeypatch):
    """Shrunk budgets force multi-out-block wo and multi-in-block down."""
    import hsd_tpu.ops.gptq_pallas as gp
    monkeypatch.setattr(gp, "_AM_WO_BUDGET", 1024 * 1024)
    for name in ("_AM_GU_BUDGET", "_AM_DOWN_BUDGET"):
        monkeypatch.setattr(gp, name, 3 * 1024 * 1024)
    D, F = 512, 1536
    ks = jax.random.split(jax.random.PRNGKey(10), 8)
    qwo = quantize(jax.random.normal(ks[0], (D, D)) * 0.05, bits=4,
                   symmetric=True)
    qgu = quantize(jax.random.normal(ks[1], (D, 2 * F)) * 0.05, bits=4,
                   symmetric=True)
    qdn = quantize(jax.random.normal(ks[2], (F, D)) * 0.05, bits=4,
                   symmetric=True)
    ln = jnp.abs(jax.random.normal(ks[3], (D,))) + 0.5
    att = jax.random.normal(ks[4], (3, D), jnp.float32)
    resid = jax.random.normal(ks[5], (3, D), jnp.float32)
    plan = gp._attn_mlp_blocks(qwo, qgu, qdn, 8)
    assert plan is not None and plan[0] < D          # multi-block wo
    xn = resid + att @ dequantize(qwo, jnp.float32)
    xr = xn * jax.lax.rsqrt(
        jnp.mean(xn * xn, -1, keepdims=True) + 1e-6) * ln
    gu = xr @ dequantize(qgu, jnp.float32)
    ff = jax.nn.silu(gu[:, :F]) * gu[:, F:]
    want = xn + ff @ dequantize(qdn, jnp.float32)
    got = jax.jit(lambda *a: gp.gptq_attn_mlp_int4(
        *a, ln_eps=1e-6, interpret=True))(att, resid, qwo, qgu, qdn, ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
