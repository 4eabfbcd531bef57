"""Pallas kernel parity tests (interpret mode on CPU) vs the pure-jax oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patent_tpu.ops import poincare
from patent_tpu.ops import pallas_kernels as pk


def rand_ball(rng, n, d, c=1.0, scale=0.7):
    v = rng.standard_normal((n, d))
    r = rng.uniform(0.05, scale, (n, 1)) / np.sqrt(c)
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True) * r,
                       jnp.float32)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    if not pk._HAS_PALLAS:
        pytest.skip("pallas unavailable")
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("c", [1.0, 2.0])
@pytest.mark.parametrize("shape", [(40, 30, 16), (256, 256, 128), (100, 300, 64)])
def test_pairwise_matches_jax(rng, c, shape):
    n, m, d = shape
    x = rand_ball(rng, n, d, c)
    y = rand_ball(rng, m, d, c)
    got = pk.pairwise_dist_pallas(x, y, c, block_n=128, block_m=128, force=True)
    want = poincare.pairwise_dist(x, y, c)
    assert got.shape == (n, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)


def test_pairwise_fallback_off_tpu(rng):
    """Without force, off-TPU calls use the pure-jax path (identical result)."""
    x = rand_ball(rng, 8, 8)
    y = rand_ball(rng, 8, 8)
    got = pk.pairwise_dist_pallas(x, y, 1.0)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(poincare.pairwise_dist(x, y, 1.0)),
                               atol=1e-6)


@pytest.mark.parametrize("c", [1.0, 2.0])
def test_mobius_dense_matches_jax(rng, c):
    n, din, dout = 100, 48, 24
    x = jnp.asarray(rng.standard_normal((n, din)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((din, dout)) * 0.2, jnp.float32)
    bias = np.asarray(poincare.expmap0(
        jnp.asarray(rng.standard_normal(dout) * 1e-3, jnp.float32), c))
    got = pk.mobius_dense_pallas(x, w, jnp.asarray(bias), c, block_n=64,
                                 force=True)
    h = poincare.expmap0(jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST), c)
    want = poincare.project(poincare.mobius_add(h, jnp.asarray(bias), c), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)


def test_mobius_dense_output_on_ball(rng):
    c = 2.0
    x = jnp.asarray(rng.standard_normal((32, 16)) * 5.0, jnp.float32)  # big
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    bias = jnp.zeros(8)
    out = pk.mobius_dense_pallas(x, w, bias, c, block_n=32, force=True)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert norms.max() <= (1 - 3e-3) / np.sqrt(c) + 1e-5


# ---------------------------------------------------------------- flash ---

def test_flash_attention_matches_xla(rng):
    from patent_tpu.ops.flash_attention import flash_attention

    q = jnp.asarray(rng.standard_normal((2, 13, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 13, 4, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 13, 4, 16)), jnp.float32)
    got = flash_attention(q, k, v, force=True)
    scale = 1.0 / np.sqrt(16)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1)
    want = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-2)


def test_flash_attention_fallback_off_tpu(rng):
    from patent_tpu.ops.flash_attention import flash_attention

    q = jnp.asarray(rng.standard_normal((1, 5, 2, 8)), jnp.float32)
    out = flash_attention(q, q, q)     # no force → XLA path on CPU
    assert out.shape == (1, 5, 2, 8)
    # rows of softmax sum to 1 → output within convex hull of values
    assert float(jnp.max(jnp.abs(out))) <= float(jnp.max(jnp.abs(q))) + 1e-4


def test_vit_with_flash_flag_matches_without(rng):
    """use_flash=True on CPU takes the fallback path — identical outputs."""
    from patent_tpu.models.vit import VIT_TINY, VisionTransformer

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m1 = VisionTransformer(VIT_TINY)
    params = m1.init(jax.random.key(0), x)
    y1 = m1.apply(params, x)
    m2 = VisionTransformer(VIT_TINY, use_flash=True)
    y2 = m2.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_fused_attention_block_matches_xla(rng):
    """The QKV+MHA+out-proj megakernel vs the unfused einsum chain."""
    from patent_tpu.ops.flash_attention import fused_attention_block

    b, s, h, hd = 2, 13, 4, 16
    d = h * hd
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
    bout = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    got = fused_attention_block(x, wqkv, bqkv, wout, bout, h, force=True)

    qkv = x @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = lambda t: t.reshape(b, s, h, hd)  # noqa: E731
    scale = 1.0 / np.sqrt(hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", heads(q) * scale, heads(k))
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1)
    want = jnp.einsum("bhqk,bkhd->bqhd", attn,
                      heads(v)).reshape(b, s, d) @ wout + bout
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-2)


def test_one_pass_softmax_no_nan_on_underflow_rows(rng):
    """A query row whose scores ALL underflow exp2 must produce finite
    output (the no-max-subtract form would otherwise hit 0/0 and the NaN
    would cascade through the residual stream of a pre-padded stack)."""
    from patent_tpu.ops.flash_attention import flash_attention

    b, s, h, hd = 1, 13, 2, 16
    q = jnp.full((b, s, h, hd), 40.0, jnp.float32)
    k = jnp.full((b, s, h, hd), -40.0, jnp.float32)   # all scores ≈ -6400
    v = jnp.asarray(rng.standard_normal((b, s, h, hd)), jnp.float32)
    out = flash_attention(q, k, v, force=True)
    assert np.isfinite(np.asarray(out)).all()


def test_attention_saturation_probe(rng):
    """The saturation observable must (a) report max pre-clamp score in the
    same exp2 domain the kernels clamp in, (b) flag a saturating block and
    clear a healthy one."""
    from patent_tpu.ops.flash_attention import (SCORE_CLAMP_HI,
                                                attention_saturation)

    b, s, h, hd = 2, 13, 2, 16
    d = h * hd
    # tie the q and k projections so a large-activation input saturates with
    # a guaranteed-POSITIVE max score (s = |q|²·scale) regardless of the
    # session rng state
    wq = rng.standard_normal((d, d)) * 0.1
    wqkv = jnp.asarray(np.concatenate(
        [wq, wq, rng.standard_normal((d, d)) * 0.1], axis=1), jnp.float32)
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    healthy = jnp.asarray(rng.standard_normal((b, s, d)) * 0.5, jnp.float32)
    sat = jnp.full((b, s, d), 40.0, jnp.float32)
    m_healthy = float(attention_saturation(healthy, wqkv, bqkv, h))
    m_sat = float(attention_saturation(sat, wqkv, bqkv, h))
    assert m_healthy < SCORE_CLAMP_HI / 2
    assert m_sat > SCORE_CLAMP_HI
    # exact domain check vs a direct einsum
    qkv = healthy @ wqkv + bqkv
    q = qkv[..., :d].reshape(b, s, h, hd)
    k = qkv[..., d:2 * d].reshape(b, s, h, hd)
    want = float(jnp.max(jnp.einsum("bqhd,bkhd->bhqk", q, k))
                 * np.log2(np.e) / np.sqrt(hd))
    assert m_healthy == pytest.approx(want, rel=1e-5)


def test_fused_attention_block_grads_finite_at_clamp_saturation(rng):
    """Scores saturating the +80 clamp must yield finite, bounded grads
    (ungated, ds would carry a ln2·dp·2^80 factor)."""
    from patent_tpu.ops.flash_attention import fused_attention_block

    b, s, h, hd = 1, 13, 2, 16
    d = h * hd
    x = jnp.full((b, s, d), 8.0, jnp.float32)      # huge logits after proj
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)), jnp.float32)
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wout = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
    bout = jnp.zeros((d,), jnp.float32)

    def loss(args):
        return jnp.sum(fused_attention_block(*args, num_heads=h, force=True))

    g = jax.grad(loss)((x, wqkv, bqkv, wout, bout))
    for t in g:
        arr = np.asarray(t)
        assert np.isfinite(arr).all()
        assert np.max(np.abs(arr)) < 1e8, "clamp-saturated grads blew up"


def test_fused_attention_block_grads_match_xla(rng):
    """custom_vjp (Pallas fwd + recompute-softmax Pallas bwd) vs plain
    autodiff through the XLA fallback — every input's gradient."""
    from patent_tpu.ops.flash_attention import fused_attention_block

    b, s, h, hd = 2, 13, 4, 16
    d = h * hd
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
    bout = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)

    def loss(args, force):
        out = fused_attention_block(*args, num_heads=h, force=force)
        return jnp.sum(out * cot)

    g_kernel = jax.grad(lambda a: loss(a, True))((x, wqkv, bqkv, wout, bout))
    g_xla = jax.grad(lambda a: loss(a, False))((x, wqkv, bqkv, wout, bout))
    names = ["dx", "dwqkv", "dbqkv", "dwout", "dbout"]
    for name, gk, gx in zip(names, g_kernel, g_xla):
        denom = np.max(np.abs(np.asarray(gx))) + 1e-9
        err = np.max(np.abs(np.asarray(gk) - np.asarray(gx))) / denom
        assert err < 2e-2, f"{name} grad mismatch: rel {err:.3e}"


def test_vit_with_fused_block_matches_without(rng):
    """fused_block=True: identical param tree, identical output (CPU takes
    the fallback path through flash_attention)."""
    from patent_tpu.models.vit import VIT_TINY, VisionTransformer

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m1 = VisionTransformer(VIT_TINY)
    params = m1.init(jax.random.key(0), x)
    m2 = VisionTransformer(VIT_TINY, fused_block=True)
    params2 = m2.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    y1 = m1.apply(params, x)
    y2 = m2.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_flash_attention_headbatch_matches_xla(rng):
    from patent_tpu.ops.flash_attention import flash_attention

    q = jnp.asarray(rng.standard_normal((2, 13, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 13, 4, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 13, 4, 16)), jnp.float32)
    got = flash_attention(q, k, v, force=True, head_batch=True)
    scale = 1.0 / np.sqrt(16)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1)
    want = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-2)


def test_fused_attention_block_grouped_matches_per_image(rng):
    """group=G (full-tile projections + one full-width out matmul) matches
    the per-image kernel forward AND backward (shared recompute VJP)."""
    from patent_tpu.ops.flash_attention import fused_attention_block

    b, s, h, hd = 4, 13, 4, 16
    d = h * hd
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
    bout = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    per = np.asarray(fused_attention_block(x, wqkv, bqkv, wout, bout, h,
                                           force=True))
    grp = np.asarray(fused_attention_block(x, wqkv, bqkv, wout, bout, h,
                                           force=True, group=4))
    denom = np.max(np.abs(per))
    assert np.max(np.abs(grp - per)) / denom < 1e-3
    # ragged batch → silent per-image fallback
    grp3 = np.asarray(fused_attention_block(x[:3], wqkv, bqkv, wout, bout,
                                            h, force=True, group=4))
    np.testing.assert_allclose(grp3, per[:3], atol=denom * 1e-3)

    # gradients: grouped fwd + shared recompute bwd vs XLA autodiff
    cot = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)

    def loss(args, **kw):
        out = fused_attention_block(*args, num_heads=h, **kw)
        return jnp.sum(out * cot)

    g_grp = jax.grad(lambda a: loss(a, force=True, group=4))(
        (x, wqkv, bqkv, wout, bout))
    g_xla = jax.grad(lambda a: loss(a))((x, wqkv, bqkv, wout, bout))
    for name, gk, gx in zip(["dx", "dwqkv", "dbqkv", "dwout", "dbout"],
                            g_grp, g_xla):
        dn = np.max(np.abs(np.asarray(gx))) + 1e-9
        err = np.max(np.abs(np.asarray(gk) - np.asarray(gx))) / dn
        assert err < 2e-2, f"{name} grad mismatch: rel {err:.3e}"
