"""Whole-layer fused bf16 kernel parity (ops/bf16_layer.py).

The kernel is the bf16 serving path of the ViT tower
(`VisionTransformer(fused_layer=True)`); these tests pin it to the per-op
XLA composition in TPU interpret mode on CPU — same strategy as
tests/test_quant_matmul.py.  The real-TPU throughput claim lives in
bench.py (`embed_bf16_ips`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patent_tpu.models.vit import VIT_TINY, VisionTransformer
from patent_tpu.ops import bf16_layer

pltpu = pytest.importorskip("jax.experimental.pallas").__name__ and \
    __import__("jax.experimental.pallas", fromlist=["tpu"]).tpu


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _layer_params(rng, d, h, mlp):
    return dict(
        ln1_s=jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32),
        ln1_b=jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
        wqkv=jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32),
        bqkv=jnp.asarray(rng.standard_normal(3 * d) * 0.05, jnp.float32),
        wout=jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32),
        bout=jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32),
        ln2_s=jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32),
        ln2_b=jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
        w1=jnp.asarray(rng.standard_normal((d, mlp)) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.standard_normal(mlp) * 0.05, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((mlp, d)) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32),
    )


def test_fused_layer_matches_xla_composition():
    """Kernel vs the per-op XLA fallback on a padded stream with a real
    valid_len mask: all VALID rows agree to the bf16 rounding floor."""
    rng = np.random.default_rng(0)
    d, heads, mlp, sp, valid, b = 64, 4, 128, 32, 29, 8
    p = _layer_params(rng, d, heads, mlp)
    x = jnp.asarray(rng.standard_normal((b, sp, d)), jnp.bfloat16)
    # pad rows must not affect valid rows — poison them
    x = x.at[:, valid:].set(7.0)

    args = (p["ln1_s"], p["ln1_b"], p["wqkv"], p["bqkv"], p["wout"],
            p["bout"], p["ln2_s"], p["ln2_b"], p["w1"], p["b1"], p["w2"],
            p["b2"], heads)
    got = bf16_layer.fused_layer_block_bf16(x, *args, valid_len=valid,
                                            group=4, force=True)
    want = bf16_layer.fused_layer_block_bf16(x, *args, valid_len=valid,
                                             group=7)   # b%7 → XLA fallback
    g = np.asarray(got[:, :valid], np.float32)
    w = np.asarray(want[:, :valid], np.float32)
    np.testing.assert_allclose(g, w, atol=5e-2, rtol=5e-2)
    # and the two agree in direction everywhere that matters
    cos = np.sum(g * w, axis=-1) / (
        np.linalg.norm(g, axis=-1) * np.linalg.norm(w, axis=-1))
    assert float(cos.min()) > 0.999


def test_fused_layer_mlp_split_bit_identical():
    """mlp_split partitions row-independent work: outputs are identical."""
    rng = np.random.default_rng(1)
    d, heads, mlp, sp, b = 64, 4, 128, 32, 4
    p = _layer_params(rng, d, heads, mlp)
    x = jnp.asarray(rng.standard_normal((b, sp, d)), jnp.bfloat16)
    args = (p["ln1_s"], p["ln1_b"], p["wqkv"], p["bqkv"], p["wout"],
            p["bout"], p["ln2_s"], p["ln2_b"], p["w1"], p["b1"], p["w2"],
            p["b2"], heads)
    o1 = bf16_layer.fused_layer_block_bf16(x, *args, valid_len=sp, group=4,
                                           mlp_split=1, force=True)
    o2 = bf16_layer.fused_layer_block_bf16(x, *args, valid_len=sp, group=4,
                                           mlp_split=2, force=True)
    np.testing.assert_array_equal(np.asarray(o1, np.float32),
                                  np.asarray(o2, np.float32))


def test_tower_fused_layer_matches_plain():
    """VisionTransformer(fused_layer=True) serves the SAME param tree as
    the per-op tower — features agree (cosine) and no extra params."""
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    plain = VisionTransformer(VIT_TINY, dtype=jnp.bfloat16)
    fused = VisionTransformer(VIT_TINY, dtype=jnp.bfloat16, fused_layer=True)
    params = plain.init(jax.random.key(0), imgs[:1])
    f_plain = np.asarray(plain.apply(params, imgs), np.float32)
    f_fused = np.asarray(fused.apply(params, imgs), np.float32)
    cos = np.sum(f_plain * f_fused, axis=-1) / (
        np.linalg.norm(f_plain, axis=-1) * np.linalg.norm(f_fused, axis=-1))
    assert float(cos.min()) > 0.995, cos
    # param trees are interchangeable both ways
    params2 = fused.init(jax.random.key(0), imgs[:1])
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)


def test_required_seq_pad_bf16():
    assert bf16_layer.required_seq_pad_bf16(197) == 208
    assert bf16_layer.required_seq_pad_bf16(208) == 208
    assert bf16_layer.required_seq_pad_bf16(3) == 16


def test_fused_layer_cls_matches_full_row0():
    """fused_layer_cls_bf16 == row 0 of fused_layer_block_bf16 (the CLS
    last-layer serving specialization).  Hardware gives exact equality
    (the MXU accumulation order is M-independent); interpret mode lowers
    the dots to CPU BLAS whose f32 accumulation reassociates with M, so
    this pins a tight tolerance instead."""
    rng = np.random.default_rng(1)
    d, heads, mlp, sp, valid, b = 64, 4, 128, 32, 29, 8
    p = _layer_params(rng, d, heads, mlp)
    x = jnp.asarray(rng.standard_normal((b, sp, d)), jnp.bfloat16)
    x = x.at[:, valid:].set(7.0)
    args = (p["ln1_s"], p["ln1_b"], p["wqkv"], p["bqkv"], p["wout"],
            p["bout"], p["ln2_s"], p["ln2_b"], p["w1"], p["b1"], p["w2"],
            p["b2"], heads)
    full = np.asarray(bf16_layer.fused_layer_block_bf16(
        x, *args, valid_len=valid, group=4, force=True), np.float32)
    cls = np.asarray(bf16_layer.fused_layer_cls_bf16(
        x, *args, valid_len=valid, group=4, force=True), np.float32)
    assert cls.shape == (b, d)
    denom = np.max(np.abs(full[:, 0, :]))
    assert np.max(np.abs(cls - full[:, 0, :])) / denom < 2e-2
    # ragged batch → documented fallback (full layer + row slice)
    cls3 = np.asarray(bf16_layer.fused_layer_cls_bf16(
        x[:3], *args, valid_len=valid, group=4, force=True), np.float32)
    full3 = np.asarray(bf16_layer.fused_layer_block_bf16(
        x[:3], *args, valid_len=valid, group=4, force=True), np.float32)
    np.testing.assert_array_equal(cls3, full3[:, 0, :])


def test_tower_fused_layer_cls_consistent():
    """The fused tower (whose last block now returns [B, D] via the CLS
    kernel) still matches the plain per-op tower at the feature level."""
    rng = np.random.default_rng(2)
    px = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.4, jnp.float32)
    plain = VisionTransformer(VIT_TINY, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), px[:1])["params"]
    want = np.asarray(plain.apply({"params": params}, px), np.float32)
    fused = VisionTransformer(VIT_TINY, dtype=jnp.bfloat16, fused_layer=True)
    got = np.asarray(fused.apply({"params": params}, px), np.float32)
    a, b = want, got
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.99
