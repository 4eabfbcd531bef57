"""Graph convolutional models (VGAE family) in Flax.

Re-design of the reference's GCN stack (src/models.py:187-245 GCNLayer /
InferenceModel, 840-879 EnhancedVGAE, 881-903 VGAE).  On TPU the whole
~44k-node, 512-d graph forward is a chain of dense matmuls — ideal MXU work —
so the encoder is expressed as plain jitted matmul chains; the normalized
adjacency is precomputed once on the host (see ``normalize_adjacency``)
instead of being re-normalized inside every forward like the reference
(models.py:233 renormalizes per call — kept, it is cheap and fused).
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class SparseAdj:
    """Normalized adjacency in sorted COO form for the sparse GCN path.

    The dense path materializes the [N, N] normalized adjacency — 7.7 GB
    f32 at the reference's 2018 scale (44k nodes, fits bf16) and ~36 GB at
    its 2019 scale (95,299 figures + labels, split_query.ipynb cell 10) —
    IMPOSSIBLE on a 16 GB chip.  The patent graph is extremely sparse
    (tree-like hierarchy: figure→patent→medium→big→main, ~2-4 edges/node),
    so the same contraction runs as gather + segment-sum over the E edges:
    O(E·D) HBM traffic instead of O(N²) — both faster at 44k and the only
    option at 95k.

    ``rows`` are sorted ascending (scipy CSR→COO order) so ``segment_sum``
    takes the sorted fast path; ``n`` is static for jit."""

    rows: jax.Array                                   # [E] int32, sorted
    cols: jax.Array                                   # [E] int32
    vals: jax.Array                                   # [E] f32
    n: int = flax.struct.field(pytree_node=False)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)


def spmm(adj: SparseAdj, y: jax.Array) -> jax.Array:
    """A @ y for a SparseAdj: gather + sorted segment-sum on the VPU."""
    return jax.ops.segment_sum(adj.vals[:, None] * y[adj.cols], adj.rows,
                               num_segments=adj.n, indices_are_sorted=True)


def adj_rowsum(a_tilde) -> jax.Array:
    """Row sums [N] for either adjacency representation (f32)."""
    if isinstance(a_tilde, SparseAdj):
        return jax.ops.segment_sum(a_tilde.vals, a_tilde.rows,
                                   num_segments=a_tilde.n,
                                   indices_are_sorted=True)
    return jnp.sum(a_tilde.astype(jnp.float32), axis=1)


def normalize_adjacency(a: jax.Array, out_dtype=None) -> jax.Array:
    """Self-loops + symmetric D^{-1/2} A D^{-1/2} + re-symmetrization.

    Matches ``normalize_adjacency_dense_gpu`` (reference src/auxiliary.py:12-34).

    ``out_dtype=jnp.bfloat16`` halves the resident N×N matrix — required at
    the reference's full 2018 graph scale on v5e (a 44k-node f32 adjacency
    is 7.7 GB and two copies exhaust 16 GB HBM); normalized entries are
    ≤ 1, well inside bf16 range, and the GCN matmuls accumulate in f32.
    """
    a = a + jnp.eye(a.shape[0], dtype=a.dtype)
    row_sum = jnp.sum(a, axis=1)
    d_inv_sqrt = 1.0 / jnp.sqrt(1e-10 + row_sum)
    normalized = a * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]
    out = (normalized + normalized.T) / 2.0
    return out.astype(out_dtype) if out_dtype is not None else out


def normalize_adjacency_host(a: "np.ndarray", out_dtype: str = "bfloat16",
                             blk: int = 4096) -> "np.ndarray":
    """Host-side (numpy, in-place where possible) version of
    ``normalize_adjacency`` for graphs too big to normalize on device: the
    eager device path materializes several N×N f32 intermediates (a 44k
    graph OOMs v5e HBM even though the bf16 RESULT fits comfortably), and
    host→device traffic drops to the one bf16 upload."""
    import ml_dtypes
    import numpy as np

    a = np.array(a, np.float32, copy=True)
    n = a.shape[0]
    np.fill_diagonal(a, a.diagonal() + 1.0)
    d = 1.0 / np.sqrt(1e-10 + a.sum(axis=1))
    a *= d[:, None]
    a *= d[None, :]
    # blocked in-place (M + Mᵀ)/2 — the SAME re-symmetrization the device
    # path performs, so asymmetric (or float-noisy near-symmetric) inputs
    # produce identical results on both paths instead of diverging at the
    # train_gcn size threshold.  Block tiles keep the transposed access
    # cache-resident (a naive a + a.T at 44k nodes is a cache-hostile
    # full-matrix gather); ~2 passes over the matrix, seconds at 44k.
    for i0 in range(0, n, blk):
        i1 = min(i0 + blk, n)
        diag = a[i0:i1, i0:i1]
        a[i0:i1, i0:i1] = 0.5 * (diag + diag.T)
        for j0 in range(i1, n, blk):
            j1 = min(j0 + blk, n)
            avg = 0.5 * (a[i0:i1, j0:j1] + a[j0:j1, i0:i1].T)
            a[i0:i1, j0:j1] = avg
            a[j0:j1, i0:i1] = avg.T
    return a.astype(ml_dtypes.bfloat16 if out_dtype == "bfloat16"
                    else out_dtype)


def normalize_adjacency_sparse(a, out_dtype=None) -> SparseAdj:
    """Sparse (scipy) twin of ``normalize_adjacency``: self-loops +
    symmetric D^{-1/2} A D^{-1/2} + (M + Mᵀ)/2 re-symmetrization — the SAME
    math as the dense and host paths, so all three agree bit-for-bit up to
    float rounding (pinned in tests/test_gcn_sparse.py).  Accepts any
    scipy.sparse matrix; returns a sorted-COO ``SparseAdj``."""
    import numpy as np
    import scipy.sparse as sp

    a = sp.csr_matrix(a, dtype="float32", copy=True)
    n = a.shape[0]
    a = a + sp.identity(n, dtype="float32", format="csr")
    d = np.asarray(a.sum(axis=1)).ravel()
    d_inv_sqrt = 1.0 / np.sqrt(1e-10 + d)
    dmat = sp.diags(d_inv_sqrt)
    m = dmat @ a @ dmat
    m = (m + m.T) * 0.5
    coo = m.tocsr().tocoo()                 # CSR round-trip sorts by row
    vals = coo.data.astype(out_dtype if out_dtype is not None else "float32")
    return SparseAdj(rows=jnp.asarray(coo.row, jnp.int32),
                     cols=jnp.asarray(coo.col, jnp.int32),
                     vals=jnp.asarray(vals), n=n)


class GCNLayer(nn.Module):
    """A_tilde @ (X @ W) with xavier init (reference src/models.py:187-197).

    Dense path: a bf16 ``a_tilde`` runs the [N, N] matmul on the bf16 MXU
    with f32 accumulation (the dominant FLOPs at graph scale) — X·W stays
    f32 and is cast down only for the A contraction.  A ``SparseAdj``
    contracts via gather + sorted segment-sum instead (O(E·D))."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, a_tilde) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (x.shape[-1], self.features))
        xw = jnp.dot(x, kernel)             # [N, out]  (MXU)
        if isinstance(a_tilde, SparseAdj):
            return spmm(a_tilde, xw)
        return jnp.dot(a_tilde, xw.astype(a_tilde.dtype),
                       preferred_element_type=jnp.float32)


class ResidualGCNEncoder(nn.Module):
    """Deep residual GCN encoder (reference InferenceModel, src/models.py:200-245):
    input GCN+BN+ReLU, residual hidden GCN+BN+ReLU blocks, linear GCN output.
    Row-normalizes A on the fly like the reference (models.py:233)."""

    hidden_dim: int
    latent_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, a_tilde,
                 *, deterministic: bool = True) -> jax.Array:
        # the reference row-normalizes A on the fly (models.py:233).  Use
        # (A @ Y) / rowsum instead of (A / rowsum) @ Y — same math, but no
        # second N×N tensor is ever materialized (at 44k nodes that
        # intermediate alone is 3.9-7.7 GB); adj_rowsum dispatches dense /
        # SparseAdj
        inv_row = 1.0 / (adj_rowsum(a_tilde)[:, None] + 1e-8)

        def gcn(feats, layer):
            return layer(feats, a_tilde) * inv_row

        h = gcn(x, GCNLayer(self.hidden_dim, name="gcn_in"))
        h = nn.BatchNorm(use_running_average=deterministic, name="bn_in")(h)
        h = nn.relu(h)
        for i in range(self.num_layers - 3):
            hn = gcn(h, GCNLayer(self.hidden_dim, name=f"gcn_h{i}"))
            hn = nn.BatchNorm(use_running_average=deterministic, name=f"bn_h{i}")(hn)
            h = h + nn.relu(hn)
        return gcn(h, GCNLayer(self.latent_dim, name="gcn_out"))


class VGAE(nn.Module):
    """GCN encoder + L2-normalize + sigmoid(Z Zᵀ) adjacency reconstruction
    (reference src/models.py:881-903)."""

    hidden_dim: int
    latent_dim: int
    num_layers: int = 3

    def setup(self):
        self.encoder = ResidualGCNEncoder(self.hidden_dim, self.latent_dim,
                                          self.num_layers, name="encoder")

    def __call__(self, x: jax.Array, a_tilde,
                 *, deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        z = self.encode(x, a_tilde, deterministic=deterministic)
        a_rec = jax.nn.sigmoid(jnp.dot(z, z.T))
        return z, a_rec

    def encode(self, x: jax.Array, a_tilde,
               *, deterministic: bool = True) -> jax.Array:
        """Latents only — no [N, N] reconstruction tensor.  The sampled-edge
        trainer (train_vgae mode='sampled') scores individual pairs from z,
        which is what makes VGAE training possible at the 2019 graph scale
        (sigmoid(Z Zᵀ) at 108k nodes is a 47 GB tensor)."""
        z = self.encoder(x, a_tilde, deterministic=deterministic)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)


class EnhancedVGAE(nn.Module):
    """Residual GCN encoder + MLP pair classifier over concatenated embeddings
    → 5 CPC-connection levels (reference src/models.py:840-879)."""

    hidden_dim: int
    latent_dim: int
    num_layers: int = 3
    num_classes: int = 5
    dropout_rate: float = 0.3

    def setup(self):
        self.encoder = ResidualGCNEncoder(self.hidden_dim, self.latent_dim,
                                          self.num_layers)
        self.linear = nn.Dense(self.latent_dim)
        self.linear2 = nn.Dense(self.latent_dim // 2)
        self.classifier = nn.Dense(self.num_classes)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x: jax.Array, a_tilde: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        z = self.encoder(x, a_tilde, deterministic=deterministic)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)

    def classify_pair(self, z1: jax.Array, z2: jax.Array,
                      *, deterministic: bool = True) -> jax.Array:
        pair = jnp.concatenate([z1, z2], axis=1)
        h = nn.relu(self.linear(pair))
        h = self.dropout(h, deterministic=deterministic)
        h = nn.relu(self.linear2(h))
        h = self.dropout(h, deterministic=deterministic)
        return self.classifier(h)

    def encode_and_classify(self, x, a_tilde, pair_idx,
                            *, deterministic: bool = True) -> jax.Array:
        """Full-graph encode + classify the given [P, 2] node-index pairs.

        The reference re-runs the full-graph GCN forward inside every batch
        (src/train.py:240); under jit the encode is shared per step here.
        """
        z = self(x, a_tilde, deterministic=deterministic)
        return self.classify_pair(z[pair_idx[:, 0]], z[pair_idx[:, 1]],
                                  deterministic=deterministic)
