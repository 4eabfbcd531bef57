"""Model-zoo tests: shapes, manifold membership, grad flow, GCN behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patent_tpu.models import (
    HMI,
    EnhancedVGAE,
    FigureOnlyHyperbolicModel,
    HyperbolicEmbeddingModel,
    HyperbolicEncoder,
    MobiusDense,
    VGAE,
    normalize_adjacency,
)
from patent_tpu.ops import poincare


def _on_ball(x, c, tol=1e-4):
    return bool(jnp.all(jnp.linalg.norm(x, axis=-1) <= (1.0 + tol) / np.sqrt(c)))


def test_mobius_dense_euclidean_input():
    m = MobiusDense(8, c=2.0, hyperbolic_input=False)
    x = jnp.ones((4, 16)) * 0.1
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (4, 8)
    assert _on_ball(y, 2.0)


def test_mobius_dense_hyperbolic_input_with_dropout():
    """The reference's hyperbolic-input path crashes on an undefined global
    (models.py:306); ours must work, train-mode included (weight dropout)."""
    m = MobiusDense(8, c=1.0, hyperbolic_input=True)
    x = poincare.expmap0(jnp.ones((4, 16)) * 0.05, 1.0)
    params = m.init(jax.random.key(0), x)
    y_det = m.apply(params, x, deterministic=True)
    y_trn = m.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.key(1)})
    assert _on_ball(y_det, 1.0) and _on_ball(y_trn, 1.0)
    # dropout actually changes the output
    assert not np.allclose(np.asarray(y_det), np.asarray(y_trn))


def test_hyperbolic_encoder_outputs_on_ball():
    enc = HyperbolicEncoder(hidden_dims=(32,), output_dim=16, c=2.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 64)), jnp.float32)
    params = enc.init(jax.random.key(0), x)
    y = enc.apply(params, x)
    assert y.shape == (8, 16)
    assert _on_ball(y, 2.0)


def test_hyperbolic_embedding_model_and_label_table():
    model = HyperbolicEmbeddingModel(feature_dim=32, embed_dim=16, label_num=50,
                                     hidden_dims=(24,), c=2.0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (4, 16)
    label_emb = params["params"]["label_emb"]
    assert label_emb.shape == (50, 16)
    assert _on_ball(label_emb, 2.0)
    # grads flow to both encoder and label table
    def loss(p):
        enc = model.apply(p, x)
        lbl = p["params"]["label_emb"]
        return jnp.sum(poincare.pairwise_dist(enc, lbl[:4], 2.0))
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["params"]["label_emb"]).sum()) > 0
    assert float(jnp.abs(
        g["params"]["encoder"]["first_layer"]["kernel"]).sum()) > 0


def test_figure_only_model():
    model = FigureOnlyHyperbolicModel(feature_dim=32, embed_dim=16, hidden_dims=(24,))
    x = jnp.ones((4, 32)) * 0.3
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (4, 16)
    assert _on_ball(y, 1.0)


def test_hmi_logits():
    model = HMI(feature_dim=16, embed_dim=8, label_num=12)
    x = poincare.expmap0(jnp.asarray(
        np.random.default_rng(2).standard_normal((5, 16)) * 0.1, jnp.float32), 1.0)
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (5, 12)
    assert np.all(np.isfinite(np.asarray(logits)))


# ------------------------------------------------------------------- GCN ---

def test_normalize_adjacency_matches_reference_formula():
    a = jnp.asarray([[0, 1, 0], [1, 0, 1], [0, 1, 0]], jnp.float32)
    n = normalize_adjacency(a)
    # oracle: numpy version of auxiliary.py:12-34
    an = np.asarray(a) + np.eye(3)
    d = 1.0 / np.sqrt(1e-10 + an.sum(1))
    want = np.diag(d) @ an @ np.diag(d)
    want = (want + want.T) / 2
    np.testing.assert_allclose(np.asarray(n), want, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n).T, atol=1e-7)


def test_normalize_adjacency_host_matches_device():
    """Host (numpy, in-place) normalize == device normalize, to bf16."""
    from patent_tpu.models.gcn import normalize_adjacency_host

    rng = np.random.default_rng(11)
    a = (rng.random((40, 40)) < 0.2).astype(np.float32)
    a = np.maximum(a, a.T)
    want = np.asarray(normalize_adjacency(jnp.asarray(a),
                                          out_dtype=jnp.bfloat16),
                      np.float32)
    got = np.asarray(normalize_adjacency_host(a), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-3)

    # ASYMMETRIC input: the blocked host re-symmetrization must mirror the
    # device path's (M + Mᵀ)/2 exactly (same order: normalize, then
    # symmetrize), including across block boundaries
    a2 = (rng.random((100, 100)) < 0.15).astype(np.float32)   # not symmetric
    want2 = np.asarray(normalize_adjacency(jnp.asarray(a2),
                                           out_dtype=jnp.bfloat16),
                       np.float32)
    # blk=32 forces multiple blocks on a 100-node graph (cross-block pairs
    # + the ragged tail block)
    got2 = np.asarray(normalize_adjacency_host(a2, blk=32), np.float32)
    np.testing.assert_allclose(got2, want2, atol=2e-3)
    sym = np.asarray(normalize_adjacency_host(a2, out_dtype="float32",
                                              blk=32))
    np.testing.assert_allclose(sym, sym.T, atol=1e-6)


def test_bf16_adjacency_close_to_f32():
    """The big-graph memory path (bf16 A_tilde, f32 accumulation) tracks
    the f32 encoder closely — normalized entries are ≤ 1, so the bf16
    rounding is ~0.4% relative."""
    rng = np.random.default_rng(9)
    n = 64
    a = (rng.random((n, n)) < 0.15).astype(np.float32)
    a = np.maximum(a, a.T)
    x = rng.standard_normal((n, 12)).astype(np.float32)
    a32 = normalize_adjacency(jnp.asarray(a))
    a16 = normalize_adjacency(jnp.asarray(a), out_dtype=jnp.bfloat16)
    assert a16.dtype == jnp.bfloat16
    model = EnhancedVGAE(hidden_dim=16, latent_dim=8)
    pairs = jnp.asarray([[0, 1], [2, 3]])
    variables = model.init(jax.random.key(0), jnp.asarray(x), a32, pairs,
                           method=EnhancedVGAE.encode_and_classify)
    z32 = model.apply(variables, jnp.asarray(x), a32)
    z16 = model.apply(variables, jnp.asarray(x), a16)
    err = np.max(np.abs(np.asarray(z32) - np.asarray(z16))) / (
        np.max(np.abs(np.asarray(z32))) + 1e-9)
    assert err < 3e-2, f"bf16 adjacency diverged: {err}"


def test_vgae_shapes_and_reconstruction_range():
    rng = np.random.default_rng(3)
    n = 20
    a = (rng.random((n, n)) < 0.2).astype(np.float32)
    a = np.maximum(a, a.T)
    x = rng.standard_normal((n, 12)).astype(np.float32)
    model = VGAE(hidden_dim=16, latent_dim=8)
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(a))
    (z, a_rec), _ = model.apply(variables, jnp.asarray(x), jnp.asarray(a),
                                deterministic=False,
                                mutable=["batch_stats"])
    assert z.shape == (n, 8)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(z, axis=1)), 1.0, atol=1e-4)
    assert float(a_rec.min()) >= 0 and float(a_rec.max()) <= 1


def test_enhanced_vgae_pair_classification():
    rng = np.random.default_rng(4)
    n = 16
    a = np.eye(n, dtype=np.float32)
    x = rng.standard_normal((n, 12)).astype(np.float32)
    pairs = jnp.asarray([[0, 1], [2, 3], [4, 5]])
    model = EnhancedVGAE(hidden_dim=16, latent_dim=8)
    # init through the full path so the classifier head params are created
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(a),
                           pairs, method=EnhancedVGAE.encode_and_classify)
    logits = model.apply(variables, jnp.asarray(x), jnp.asarray(a), pairs,
                         method=EnhancedVGAE.encode_and_classify)
    assert logits.shape == (3, 5)


def test_deeper_residual_gcn():
    """num_layers > 3 exercises the residual hidden blocks."""
    rng = np.random.default_rng(5)
    n = 10
    a = np.eye(n, dtype=np.float32)
    x = rng.standard_normal((n, 6)).astype(np.float32)
    model = VGAE(hidden_dim=8, latent_dim=4, num_layers=5)
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(a))
    (z, _), _ = model.apply(variables, jnp.asarray(x), jnp.asarray(a),
                            deterministic=False, mutable=["batch_stats"])
    assert z.shape == (n, 4)
