"""Loss tests: hand-computed oracles + vectorization-equals-loop checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patent_tpu.losses import (
    dist0_band_regularizers,
    figure_pair_bce,
    graph_alignment_cosine,
    hierarchical_margin_losses,
    hmi_losses,
    hyperbolic_info_nce,
    infonce_parent_neighbor,
    multi_positive_nt_xent,
    neighborhood_nce,
    pairs_to_mask,
    recon_kl_loss,
    sample_to_prototype_ce,
    sample_to_prototype_triplet,
)
from patent_tpu.ops import poincare


def rand_ball(rng, n, d, c=1.0, scale=0.7):
    v = rng.standard_normal((n, d))
    r = rng.uniform(0.05, scale, (n, 1)) / np.sqrt(c)
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True) * r, jnp.float32)


def test_sample_to_prototype_triplet_matches_loop(rng):
    c = 2.0
    s = rand_ball(rng, 6, 8, c)
    pos = rand_ball(rng, 6, 8, c)
    neg = rand_ball(rng, 12, 8, c).reshape(6, 2, 8)
    got = float(sample_to_prototype_triplet(s, pos, neg, c, margin=0.1))
    # loop oracle with elementwise dist
    total = []
    for i in range(6):
        pd = float(poincare.dist(s[i], pos[i], c))
        nd = np.mean([float(poincare.dist(s[i], neg[i, j], c)) for j in range(2)])
        total.append(max(pd - nd + 0.1, 0.0))
    assert got == pytest.approx(float(np.mean(total)), abs=1e-4)


def test_sample_to_prototype_triplet_zero_when_pos_close():
    s = jnp.asarray([[0.1, 0.0]], jnp.float32)
    pos = jnp.asarray([[0.1, 0.0]], jnp.float32)       # d=0
    neg = jnp.asarray([[[0.9, 0.0]]], jnp.float32)     # far
    assert float(sample_to_prototype_triplet(s, pos, neg, 1.0, margin=0.1)) == 0.0


def test_sample_to_prototype_ce_prefers_positive(rng):
    s = rand_ball(rng, 4, 8)
    loss_good = sample_to_prototype_ce(s, s, rand_ball(rng, 8, 8).reshape(4, 2, 8))
    loss_bad = sample_to_prototype_ce(s, rand_ball(rng, 4, 8),
                                      jnp.repeat(s[:, None], 2, 1))
    assert float(loss_good) < float(loss_bad)


def test_hyperbolic_info_nce_matches_loop(rng):
    c = 1.0
    a = rand_ball(rng, 5, 6, c)
    p = rand_ball(rng, 5, 6, c)
    got = float(hyperbolic_info_nce(a, p, c, temperature=0.07))
    # loop oracle
    D = np.zeros((5, 5))
    for i in range(5):
        for j in range(5):
            D[i, j] = float(poincare.dist(a[i], p[j], c))
    sims = -D / 0.07
    def ce(logits):
        logits = logits - logits.max(1, keepdims=True)
        lsm = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        return -np.mean(np.diag(lsm))
    want = (ce(sims) + ce(sims.T)) / 2
    assert got == pytest.approx(want, rel=1e-3)


def test_figure_pair_bce_separates():
    a = jnp.asarray([[0.1, 0.0], [0.5, 0.0]], jnp.float32)
    b_close = a
    b_far = jnp.asarray([[-0.9, 0.0], [-0.9, 0.0]], jnp.float32)
    labels_pos = jnp.ones(2)
    labels_neg = jnp.zeros(2)
    # close pairs labeled positive → low loss; far pairs labeled positive → high
    low = float(figure_pair_bce(a, b_close, labels_pos))
    high = float(figure_pair_bce(a, b_far, labels_pos))
    assert low < high
    # far pairs labeled negative → low loss
    assert float(figure_pair_bce(a, b_far, labels_neg)) < high


def test_multi_positive_nt_xent_soft_targets(rng):
    feats = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    loss = multi_positive_nt_xent(feats, 10.0)
    assert np.isfinite(float(loss))
    # aligned anchor/positive features → lower loss than random
    base = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    aligned = jnp.concatenate([base, base * 1.01], axis=0)
    assert float(multi_positive_nt_xent(aligned, 10.0)) < float(loss)


def test_graph_alignment_cosine_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    assert float(graph_alignment_cosine(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(graph_alignment_cosine(x, -x)) == pytest.approx(2.0, abs=1e-6)


def test_neighborhood_nce_matches_reference_semantics(rng):
    z = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    pairs = jnp.asarray([[0, 1], [2, 3]])
    mask = pairs_to_mask(pairs, 6)
    # symmetric mask
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask).T)
    loss = neighborhood_nce(z, mask)
    assert np.isfinite(float(loss))
    # rows without positives (4, 5) are excluded: adding an isolated row
    # doesn't change the loss
    z2 = jnp.concatenate([z, z[:1] * 3.0], axis=0)
    mask2 = pairs_to_mask(pairs, 7)
    # loss differs only through the denominator of softmax... so just finite
    assert np.isfinite(float(neighborhood_nce(z2, mask2)))


def test_hierarchical_margin_losses_zero_for_perfect_nesting():
    # child deep along a ray inside parent's sphere, margins satisfied
    label_emb = jnp.asarray([[0.95, 0.0], [0.3, 0.0], [-0.95, 0.0]], jnp.float32)
    implication = jnp.asarray([[0, 1]])   # 0 inside 1
    exclusion = jnp.asarray([[0, 2]])     # 0 and 2 disjoint
    ins, dis = hierarchical_margin_losses(label_emb, implication, exclusion, 1.0)
    assert float(ins) == 0.0
    assert float(dis) == 0.0
    # flipped implication violates nesting → positive loss
    ins2, _ = hierarchical_margin_losses(label_emb, jnp.asarray([[1, 0]]), None, 1.0)
    assert float(ins2) > 0


def test_dist0_band_regularizers():
    c = 1.0
    # labels at dist0 ≈ 4.0 (inside the [2, 8] band) → no label reg
    r = np.tanh(2.0)  # dist0 = 2*artanh(r) = 4
    labels = jnp.asarray([[r, 0.0]], jnp.float32)
    figs = jnp.asarray([[0.1, 0.0]], jnp.float32)
    lr_, ir_ = dist0_band_regularizers(labels, figs, c)
    assert float(lr_) == pytest.approx(0.0, abs=1e-3)
    assert float(ir_) == 0.0
    # label collapsed to origin → positive reg
    lr2, _ = dist0_band_regularizers(jnp.asarray([[0.01, 0.0]], jnp.float32), figs, c)
    assert float(lr2) > 1.0


def test_hmi_losses_structure(rng):
    enc = rand_ball(rng, 4, 6, scale=0.5)
    labels = rand_ball(rng, 10, 6, scale=0.6)
    out = hmi_losses(enc, labels, jnp.asarray([[0, 1]]), jnp.asarray([[2, 3]]))
    assert set(out) == {"inside_loss", "disjoint_loss", "label_reg", "instance_reg"}
    assert all(np.isfinite(float(v)) for v in out.values())


def test_recon_kl_loss_matches_oracle(rng):
    n = 6
    a = jnp.asarray((rng.random((n, n)) < 0.3).astype(np.float32))
    a_rec = jnp.asarray(rng.random((n, n)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    ls = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    got = float(recon_kl_loss(a, a_rec, mu, ls, beta=0.001))
    an, rn = np.asarray(a, np.float64), np.clip(np.asarray(a_rec, np.float64), 1e-7, 1 - 1e-7)
    recon = -(an * np.log(rn) + (1 - an) * np.log(1 - rn)).sum() / an.size
    lsn = np.clip(np.asarray(ls, np.float64), -10, 10)
    kl = -0.5 * np.sum(1 + lsn - np.asarray(mu, np.float64) ** 2 - np.exp(lsn)) / n
    assert got == pytest.approx(recon + 0.001 * kl, rel=1e-4)


def test_infonce_parent_neighbor(rng):
    z = jnp.asarray(rng.standard_normal((10, 8)), jnp.float32)
    pairs = jnp.asarray([[0, 1], [2, 3], [4, 5]])
    negs = jnp.asarray(rng.integers(0, 10, (3, 5)))
    loss = infonce_parent_neighbor(z, pairs, negs)
    assert np.isfinite(float(loss))
    # identical pair embeddings → lower loss than anti-aligned
    z_good = z.at[1].set(z[0]).at[3].set(z[2]).at[5].set(z[4])
    assert float(infonce_parent_neighbor(z_good, pairs, negs)) < float(loss) + 1.0
