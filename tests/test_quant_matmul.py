"""Fused int8 quant-matmul kernel parity tests (interpret mode on CPU).

The XLA fallback inside each entry point is the numerical oracle: on TPU the
Pallas kernel runs instead, and these tests pin kernel↔fallback parity via
``force_tpu_interpret_mode``.  The attention kernels deviate from the
fallback's textbook softmax by design (score clamp instead of max-subtract;
mask+denominator folded into the p·v matmul with p rounded to bf16), so
their tolerance is the bf16 rounding floor, not exactness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patent_tpu.ops import quant_matmul as qm


@pytest.fixture(autouse=True)
def interpret_mode():
    if not qm._HAS_PALLAS:
        pytest.skip("pallas unavailable")
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _mk_weights(rng, k, n, wscale=0.05):
    w = jnp.asarray(rng.standard_normal((k, n)) * wscale, jnp.float32)
    wq, s = qm.quantize_weight(w)
    b = jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32)
    return wq, s, b


def test_quant_dense_kernel_matches_fallback(rng):
    x = jnp.asarray(rng.standard_normal((100, 128)), jnp.float32)
    wq, s, b = _mk_weights(rng, 128, 256)
    # fast=False pins kernel structure == fallback bit-for-bit (same
    # quantization decisions); the approx-reciprocal production path is
    # bounded separately in test_quant_dense_fast_path_within_quant_noise.
    got = qm.quant_dense(x, wq, s, b, m_tile=64, force=True, fast=False)
    want = qm.quant_dense(x, wq, s, b)          # fallback (off-TPU, no force)
    # M=100 is not a multiple of m_tile=64 → exercises the pad+slice path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_quant_dense_fast_path_within_quant_noise(rng):
    """The fast kernel path (approx VPU reciprocal in the dynamic-quant
    chain) may flip borderline int8 roundings by ±1 LSB vs the exact
    oracle; the output difference must stay below one activation-LSB
    propagated through the matmul."""
    x = jnp.asarray(rng.standard_normal((100, 128)), jnp.float32)
    wq, s, b = _mk_weights(rng, 128, 256)
    got = np.asarray(qm.quant_dense(x, wq, s, b, act="quick_gelu",
                                    m_tile=64, force=True, fast=True))
    want = np.asarray(qm.quant_dense(x, wq, s, b, act="quick_gelu"))
    # 1 LSB on one int8 input element contributes ≤ row_scale·|w_col| each,
    # and the approx reciprocal in the gelu denominator adds ~|g|·2^-12;
    # empirically the max deviation is ~2 LSB-equivalents.  Factor 8 gives
    # headroom for several coincident borderline flips per row (observed
    # once under full-suite interleaving with factor 4).
    lsb = np.max(np.abs(np.asarray(x)), axis=1, keepdims=True) / 127.0
    bound = (8.0 * lsb * np.max(np.abs(np.asarray(s))) * 127.0
             + np.abs(want) * 2.0 ** -10 + 1e-3)
    assert np.all(np.abs(got - want) <= bound)
    # and the results stay overwhelmingly identical in aggregate
    denom = np.maximum(np.max(np.abs(want)), 1e-6)
    assert np.max(np.abs(got - want)) / denom < 5e-2


def test_quant_dense_gelu_and_dtype(rng):
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)
    wq, s, b = _mk_weights(rng, 128, 128)
    got = qm.quant_dense(x, wq, s, b, act="quick_gelu", m_tile=64, force=True,
                         fast=False)
    want = qm.quant_dense(x, wq, s, b, act="quick_gelu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_quant_dense_approximates_f32_matmul(rng):
    """Dynamic per-row int8 quantization error stays in the ~1% band."""
    x = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.1, jnp.float32)
    wq, s = qm.quantize_weight(w)
    got = np.asarray(qm.quant_dense(x, wq, s, None))
    want = np.asarray(x @ w)
    rel = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert float(np.mean(rel)) < 0.05


def test_quant_mlp_kernel_matches_fallback(rng):
    x = jnp.asarray(rng.standard_normal((80, 128)), jnp.float32)
    w1, s1, b1 = _mk_weights(rng, 128, 256)
    w2, s2, b2 = _mk_weights(rng, 256, 128)
    got = qm.quant_mlp(x, w1, s1, b1, w2, s2, b2, m_tile=64, force=True,
                       fast=False)
    want = qm.quant_mlp(x, w1, s1, b1, w2, s2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # production fast path: within the int8 noise band of the exact oracle
    fastv = np.asarray(qm.quant_mlp(x, w1, s1, b1, w2, s2, b2, m_tile=64,
                                    force=True, fast=True))
    denom = np.maximum(np.max(np.abs(np.asarray(want))), 1e-6)
    assert np.max(np.abs(fastv - np.asarray(want))) / denom < 5e-2


def _attn_inputs(rng, b=2, s=50, d=128, scale=0.3):
    x = jnp.asarray(rng.standard_normal((b, s, d)) * scale, jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    wqkv, sqkv, bqkv = _mk_weights(rng, d, 3 * d)
    wout, sout, bout = _mk_weights(rng, d, d)
    return x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout


def test_quant_attention_block_kernel_matches_fallback(rng):
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout)
    got = np.asarray(qm.quant_attention_block(x, *args, num_heads=4,
                                              force=True))
    want = np.asarray(qm.quant_attention_block(x, *args, num_heads=4))
    # bf16 p-rounding + clamp-softmax: ~3 decimal digits on attention weights
    denom = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / denom < 2e-2
    np.testing.assert_allclose(got, want, atol=denom * 2e-2)


def test_quant_attention_block_valid_len_prepad_contract(rng):
    """Pre-padded S + valid_len == pad-per-call on the true-length input."""
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng, s=50)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout)
    xp = jnp.pad(x, ((0, 0), (0, 64 - 50), (0, 0)))
    got = np.asarray(qm.quant_attention_block(
        xp, *args, num_heads=4, valid_len=50, force=True))[:, :50]
    want = np.asarray(qm.quant_attention_block(x, *args, num_heads=4,
                                               force=True))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_quant_attention_block_valid_len_requires_tile_multiple(rng):
    x = jnp.zeros((1, 50, 128), jnp.float32)
    lns = jnp.ones((128,)); lnb = jnp.zeros((128,))
    wqkv = jnp.zeros((128, 384), jnp.int8)
    wout = jnp.zeros((128, 128), jnp.int8)
    v3 = jnp.zeros((384,)); v1 = jnp.zeros((128,))
    with pytest.raises(ValueError, match="multiple of 32"):
        qm.quant_attention_block(x, lns, lnb, wqkv, v3, v3, wout, v1, v1,
                                 num_heads=4, valid_len=50, force=True)


def test_quant_layer_block_kernel_matches_fallback(rng):
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng)
    d = 128
    ln2s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    ln2b = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    w1, s1, b1 = _mk_weights(rng, d, 256)
    w2, s2, b2 = _mk_weights(rng, 256, d)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout,
            ln2s, ln2b, w1, s1, b1, w2, s2, b2)
    got = np.asarray(qm.quant_layer_block(x, *args, num_heads=4, force=True))
    want = np.asarray(qm.quant_layer_block(x, *args, num_heads=4))
    denom = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / denom < 2e-2


def test_quant_mlp_block_kernel_matches_fallback(rng):
    d = 128
    x = jnp.asarray(rng.standard_normal((3, 40, d)) * 0.3, jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    w1, s1, b1 = _mk_weights(rng, d, 256)
    w2, s2, b2 = _mk_weights(rng, 256, d)
    got = qm.quant_mlp_block(x, lns, lnb, w1, s1, b1, w2, s2, b2,
                             m_tile=64, force=True, fast=False)
    want = qm.quant_mlp_block(x, lns, lnb, w1, s1, b1, w2, s2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    fastv = np.asarray(qm.quant_mlp_block(x, lns, lnb, w1, s1, b1, w2, s2,
                                          b2, m_tile=64, force=True,
                                          fast=True))
    denom = np.maximum(np.max(np.abs(np.asarray(want))), 1e-6)
    assert np.max(np.abs(fastv - np.asarray(want))) / denom < 5e-2


def test_required_seq_pad_contract():
    """Property check over the token-axis padding contract: the result is
    ≥ seq, idempotent, a multiple of 16 (grouped) or 32 (per-image), with
    group·S always a multiple of 32 (the int8 sublane tile applies to the
    FLATTENED group)."""
    for group in (1, 2, 4, 8):
        for seq in (1, 15, 16, 17, 31, 32, 50, 127, 128, 197, 208, 224):
            sp = qm.required_seq_pad(seq, group)
            assert sp >= seq
            assert qm.required_seq_pad(sp, group) == sp, "not idempotent"
            if group > 1:
                assert sp % 16 == 0
                assert (group * sp) % 32 == 0
            else:
                assert sp % 32 == 0


def test_quant_mlp_block_split_is_bit_identical(rng):
    """``split`` partitions each M-tile into row-independent sub-chains
    (VPU/MXU overlap — the production int8 tower runs m_tile=512/split=4);
    every stage (LN, per-row quant, gelu, both matmuls) is row-independent,
    so the output must be IDENTICAL to the single-chain kernel."""
    d = 128
    x = jnp.asarray(rng.standard_normal((3, 40, d)) * 0.3, jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    w1, s1, b1 = _mk_weights(rng, d, 256)
    w2, s2, b2 = _mk_weights(rng, 256, d)
    for fast in (False, True):
        base = np.asarray(qm.quant_mlp_block(
            x, lns, lnb, w1, s1, b1, w2, s2, b2, m_tile=64, force=True,
            fast=fast))
        split = np.asarray(qm.quant_mlp_block(
            x, lns, lnb, w1, s1, b1, w2, s2, b2, m_tile=64, force=True,
            fast=fast, split=2))
        np.testing.assert_array_equal(split, base)


def test_quant_attention_block_grouped_matches_per_image(rng):
    """group=G processes G images per grid step with M=G·S projections —
    results must match the per-image kernel (identical math, same
    quantization decisions)."""
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng, b=4,
                                                                   s=64)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout)
    per = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=50, force=True))
    grp = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=50, force=True, group=4))
    denom = np.max(np.abs(per[:, :50]))
    assert np.max(np.abs(grp[:, :50] - per[:, :50])) / denom < 1e-3
    # batch not divisible by group → silent per-image fallback, same result
    grp3 = np.asarray(qm.quant_attention_block(
        x[:3], *args, num_heads=4, valid_len=50, force=True, group=4))
    np.testing.assert_allclose(grp3[:, :50], per[:3, :50], atol=1e-5)


def test_quant_attention_block_grouped_relaxed_seq_tiles(rng):
    """Grouped pre-padded S needs only S%16 with group·S%32 (int8 tiles
    apply to the flattened group); a relaxed-16 stream reaching the
    per-image kernel (ragged batch) re-pads to 32 internally instead of
    crashing — both match the XLA oracle."""
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng, b=4,
                                                                   s=48)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout)
    want = np.asarray(qm.quant_attention_block(
        x[:, :40], *args, num_heads=4))           # XLA fallback oracle
    denom = np.max(np.abs(want))
    got = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=40, force=True, group=4))
    assert got.shape[1] == 48
    assert np.max(np.abs(got[:, :40] - want)) / denom < 2e-2
    # ragged batch (B=3 not divisible by group) on the SAME relaxed-16
    # stream: documented per-image fallback, not a ValueError
    got3 = np.asarray(qm.quant_attention_block(
        x[:3], *args, num_heads=4, valid_len=40, force=True, group=4))
    assert got3.shape[1] == 48
    assert np.max(np.abs(got3[:, :40] - want[:3])) / denom < 2e-2
    # S not a multiple of 16 stays rejected everywhere
    with pytest.raises(ValueError, match="multiple of 16"):
        qm.quant_attention_block(jnp.zeros((2, 24, 128), jnp.float32),
                                 *args, num_heads=4, valid_len=20,
                                 force=True, group=2)
    with pytest.raises(ValueError, match="multiple of 32"):
        qm.quant_attention_block(jnp.zeros((2, 24, 128), jnp.float32),
                                 *args, num_heads=4, valid_len=20,
                                 force=True)


def test_attention_cls_bit_identical(rng):
    """quant_attention_cls == row 0 of the full grouped sub-layer, BIT
    identical: LN / per-row dynamic quant / MLP are row-independent, and
    the CLS row's q-projection / score / pv dots contract over identical
    operand rows in the same order (ops/quant_matmul._qattn_cls_group_kernel;
    re-asserted on v5e hardware 2026-08-19: max abs diff 0.0 on the full
    Int8VisionTransformer at batch 128)."""
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng, b=4,
                                                                   s=64)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout)
    full = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=50, force=True, group=4))
    cls = np.asarray(qm.quant_attention_cls(
        x, *args, num_heads=4, valid_len=50, force=True, group=4))
    assert cls.shape == (4, 128)
    # interpret mode lowers the dots to CPU BLAS, whose f32 accumulation
    # ORDER depends on M — the [1, Sp] pv dot reassociates differently
    # from the full [Sp, Sp] one, and a reassociated sum can flip an int8
    # level in the ao requant.  The MXU's accumulation order is
    # M-independent, hence exact equality on hardware but only a tight
    # tolerance here.
    denom = np.max(np.abs(full[:, 0, :]))
    assert np.max(np.abs(cls - full[:, 0, :])) / denom < 2e-3
    # ragged batch → documented fallback (full sub-layer + row slice)
    cls3 = np.asarray(qm.quant_attention_cls(
        x[:3], *args, num_heads=4, valid_len=50, force=True, group=4))
    full3 = np.asarray(qm.quant_attention_block(
        x[:3], *args, num_heads=4, valid_len=50, force=True, group=4))
    np.testing.assert_array_equal(cls3, full3[:, 0, :])


def test_attention_score_i8_close_to_bf16_scores(rng):
    """score_i8=True (int8 score dots, whole-stream quantized operands)
    must track the bf16-score grouped kernel within quantization noise —
    measured on hardware: 12-layer residual-stream cosine ≥ 0.9999, and
    THROUGHPUT-NEUTRAL (66.2 vs 66.4 µs/img), so it ships OFF by default;
    the dial + this parity pin are kept for future-hardware retries."""
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng, b=4,
                                                                   s=64)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout)
    base = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=50, force=True, group=4))[:, :50]
    i8 = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=50, force=True, group=4,
        score_i8=True))[:, :50]
    a, b = base.reshape(-1, 128), i8.reshape(-1, 128)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.999


def test_attention_head_pack_matches_per_head(rng):
    """head_pack=2 (block-diagonal head-pair score/pv dots,
    ops/quant_matmul._packed_pair_attention) must reproduce the per-head
    grouped kernel up to accumulation order: the packing only ADDS
    exact-zero products, but both the MXU (measured on v5e) and CPU BLAS
    regroup the nonzero partial sums when the contraction length changes
    (64→128, Sp→2Sp), so a tight tolerance is pinned rather than bit
    equality.  Measured on v5e at the production shape (d=768, S=208,
    group=4): max rel dev 3.5e-3 — a few flipped int8 requant levels.
    head_pack=2 ships OFF — it measured SLOWER on v5e
    (tools/ab_head_pack.py); this pin keeps the recorded experiment
    honest."""
    x, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout = _attn_inputs(rng, b=4,
                                                                   s=64)
    args = (lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout)
    base = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=50, force=True, group=4))[:, :50]
    packed = np.asarray(qm.quant_attention_block(
        x, *args, num_heads=4, valid_len=50, force=True, group=4,
        head_pack=2))[:, :50]
    denom = np.max(np.abs(base))
    assert np.max(np.abs(packed - base)) / denom < 2e-3
    # ragged batch → per-image fallback ignores head_pack, same result
    p3 = np.asarray(qm.quant_attention_block(
        x[:3], *args, num_heads=4, valid_len=50, force=True, group=4,
        head_pack=2))
    b3 = np.asarray(qm.quant_attention_block(
        x[:3], *args, num_heads=4, valid_len=50, force=True, group=4))
    np.testing.assert_array_equal(p3, b3)
    # head_pack must be 1 or 2 and divide num_heads
    with pytest.raises(ValueError, match="head_pack"):
        qm.quant_attention_block(x, *args, num_heads=4, valid_len=50,
                                 force=True, group=4, head_pack=3)
