"""Synthetic DeepPatent-like corpus generator for tests, CI, and benches.

Produces a miniature dataset with the exact shape of the real corpus
(metadata JSON, figure PNGs, CPC hierarchy) so every pipeline stage — ETL,
graph build, training, retrieval eval — runs end-to-end without the
(unavailable) Chen et al. data.  Figures of the same patent share a base
drawing plus noise, so retrieval ground truth is learnable by construction.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from .schema import FigureRecord, records_from_metadata

# a small CPC hierarchy: sections → classes → subclasses
_SECTIONS = ["A", "B", "F"]
_CLASSES = {"A": ["A01", "A41"], "B": ["B25", "B60"], "F": ["F21"]}
_SUBCLASSES = {"A01": ["A01G", "A01K"], "A41": ["A41D"],
               "B25": ["B25J"], "B60": ["B60R", "B60Q"], "F21": ["F21S"]}


def synthetic_metadata(num_patents: int = 20, figures_per_patent: int = 4,
                       seed: int = 0, year: int = 2018) -> list[dict]:
    """Metadata JSON records in the corpus schema (split_query cell 2)."""
    rng = np.random.default_rng(seed)
    subclasses = [s for subs in _SUBCLASSES.values() for s in subs]
    out = []
    for p in range(num_patents):
        sub = subclasses[int(rng.integers(0, len(subclasses)))]
        month = int(rng.integers(1, 13))
        day = int(rng.integers(1, 29))
        patent = f"USD{700000 + p:07d}"
        nfig = int(figures_per_patent if figures_per_patent > 0
                   else rng.integers(2, 6))
        for f in range(nfig):
            name = f"{patent}-{year}{month:02d}{day:02d}-D{f + 1:05d}_1.png"
            out.append({"patentID": f"{patent}-{year}{month:02d}{day:02d}",
                        "subfigure_file": name, "cpc": [sub]})
    return out


def synthetic_records(num_patents: int = 20, figures_per_patent: int = 4,
                      seed: int = 0, max_month: int | None = None
                      ) -> list[FigureRecord]:
    return records_from_metadata(
        synthetic_metadata(num_patents, figures_per_patent, seed),
        max_month=max_month)


def synthetic_features(records: Sequence[FigureRecord], dim: int = 64,
                       seed: int = 0, noise: float = 0.15) -> dict[str, np.ndarray]:
    """figure name → feature vector; same-patent figures cluster, and patents
    sharing a CPC subclass are closer than unrelated ones."""
    rng = np.random.default_rng(seed)
    cpc_centers: dict[str, np.ndarray] = {}
    patent_centers: dict[str, np.ndarray] = {}
    out = {}
    for r in records:
        if r.medium_cpc not in cpc_centers:
            cpc_centers[r.medium_cpc] = rng.standard_normal(dim)
        if r.patent_id not in patent_centers:
            patent_centers[r.patent_id] = (cpc_centers[r.medium_cpc] +
                                           0.5 * rng.standard_normal(dim))
        out[r.figure_id] = (patent_centers[r.patent_id] +
                            noise * rng.standard_normal(dim)).astype(np.float32)
    return out


def synthetic_drawing_arrays(n: int, size: int = 224, seed: int = 0,
                             line_width: float = 0.10) -> np.ndarray:
    """[n, size, size, 3] float32 in [0, 1]: patent-drawing-like line art.

    Real DeepPatent figures are near-binary — white paper, thin black
    strokes — with activation statistics nothing like Gaussian noise (sparse
    dark pixels, long runs of saturated white).  Thin curvy strokes are
    produced as level-set bands of smoothed random fields (|f| < eps traces
    the zero contour, a collection of smooth curves), plus an axis-aligned
    frame box like a figure border.  Vectorized numpy; used by bench.py's
    int8-fidelity probe and tests/test_vit_int8.py so quantization quality
    is attested on the serving input distribution (retrieval.ipynb cell 2's
    corpus), not on noise.
    """
    def box1d(x: np.ndarray, k: int, axis: int) -> np.ndarray:
        """Moving average, window 2k+1, edge-padded, via cumsum."""
        pad_width = [(0, 0)] * x.ndim
        pad_width[axis] = (k, k)
        xp = np.pad(x, pad_width, mode="edge")
        zero_shape = list(xp.shape)
        zero_shape[axis] = 1
        c = np.concatenate([np.zeros(zero_shape, x.dtype),
                            np.cumsum(xp, axis=axis, dtype=np.float32)], axis)
        m = x.shape[axis]
        hi = np.take(c, np.arange(m) + 2 * k + 1, axis=axis)
        lo = np.take(c, np.arange(m), axis=axis)
        return (hi - lo) / np.float32(2 * k + 1)

    rng = np.random.default_rng(seed)
    low_res = size // 8 + 1
    canvas = np.ones((n, size, size), np.float32)
    for _ in range(2):  # two independent stroke fields per image
        field = rng.standard_normal((n, low_res, low_res)).astype(np.float32)
        up = np.repeat(np.repeat(field, 8, axis=1), 8, axis=2)[:, :size, :size]
        smooth = box1d(box1d(up, 9, 1), 9, 2)
        band = np.abs(smooth) < line_width * smooth.std(axis=(1, 2),
                                                        keepdims=True)
        canvas = np.where(band, 0.0, canvas)
    # figure border frame (2px) at a random inset per image
    inset = rng.integers(4, 20, n)
    for i in range(n):
        a = int(inset[i])
        b = size - a
        canvas[i, a:a + 2, a:b] = 0.0
        canvas[i, b - 2:b, a:b] = 0.0
        canvas[i, a:b, a:a + 2] = 0.0
        canvas[i, a:b, b - 2:b] = 0.0
    return np.repeat(canvas[..., None], 3, axis=-1)


def _entity_rng(seed: int, kind: str, name: str) -> np.random.Generator:
    """Deterministic per-entity RNG: the same (seed, entity) yields the same
    stream no matter how many or in what order entities were generated
    before it.  This makes query/gallery splits written by SEPARATE calls
    consistent by construction — a shared patent draws the same base
    drawing in both — which sequential-rng generation silently broke
    (the two calls desynchronize after the first patent)."""
    import zlib

    return np.random.default_rng(
        np.random.SeedSequence([seed, zlib.crc32(kind.encode()),
                                zlib.crc32(name.encode())]))


def write_synthetic_images(records: Sequence[FigureRecord], root: str,
                           image_size: int = 64, seed: int = 0,
                           noise: int = 20, hard: bool = False) -> list[str]:
    """Write PNG figures (same-patent figures share a base drawing) and the
    metadata JSON; returns written image paths.

    ``hard=False`` (default): each patent gets an independent random base
    drawing — trivially separable, good for convergence tests.

    ``hard=True``: realistic confusability, mirroring the published
    mid-range numbers of the reference eval (retrieval.ipynb cell 4, MRR
    0.820 / mAP 0.140 — far from saturation).  Patents sharing a medium-CPC
    subclass derive from ONE subclass base drawing with only a modest
    per-patent delta, while per-figure noise is comparable to that delta —
    so same-subclass distractors are near-duplicates of true positives and
    ranking errors become possible.  Used by the retrieval eval corpus so
    the committed golden metrics sit mid-range and can DETECT
    ranking-quality drift (an all-1.0 golden cannot).
    """
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    bases: dict[str, np.ndarray] = {}
    sub_bases: dict[str, np.ndarray] = {}
    paths = []
    for r in records:
        if r.patent_id not in bases:
            if hard:
                if r.medium_cpc not in sub_bases:
                    sub_bases[r.medium_cpc] = _entity_rng(
                        seed, "sub", r.medium_cpc).integers(
                        0, 255, (image_size, image_size, 3), np.int64)
                # small per-patent delta off the shared subclass drawing
                bases[r.patent_id] = np.clip(
                    sub_bases[r.medium_cpc]
                    + _entity_rng(seed, "pat", r.patent_id).normal(
                        0.0, 18.0, (image_size, image_size, 3)),
                    0, 255)
            else:
                bases[r.patent_id] = _entity_rng(
                    seed, "pat", r.patent_id).integers(
                    0, 255, (image_size, image_size, 3), np.int64)
        frng = _entity_rng(seed, "fig", r.figure_id)
        if hard:
            # figure noise on the order of the patent delta: same-subclass
            # neighbours are genuinely confusable with same-patent positives
            img = np.clip(bases[r.patent_id]
                          + frng.normal(0.0, 28.0,
                                        (image_size, image_size, 3)),
                          0, 255).astype(np.uint8)
        else:
            img = np.clip(bases[r.patent_id] +
                          frng.integers(-noise, noise + 1,
                                        (image_size, image_size, 3)),
                          0, 255).astype(np.uint8)
        path = os.path.join(root, r.figure_id)
        Image.fromarray(img).save(path)
        paths.append(path)
    return paths


def apply_view(img: np.ndarray, view_index: int) -> np.ndarray:
    """Deterministic geometric view of a drawing, by figure index.

    Real DeepPatent figures of one patent are different VIEWS of one design
    (front / side / perspective …), not noisy near-duplicates — retrieval
    therefore requires view-invariant features.  Four synthetic stand-ins:
    identity, left-right flip, 90° rotation, and a non-patch-aligned
    translation.  All change patch *contents* (not just patch order), so a
    randomly initialized ViT — whose near-uniform attention is already
    quasi-invariant to patch permutations — does NOT solve them for free,
    while global stroke-structure statistics remain learnable invariants.
    """
    k = view_index % 4
    if k == 0:
        return img
    if k == 1:
        return img[:, ::-1]
    if k == 2:
        return np.rot90(img, 1, (0, 1))
    return np.roll(img, (4, 12), (0, 1))


def write_synthetic_view_images(records: Sequence[FigureRecord], root: str,
                                image_size: int = 64, seed: int = 0,
                                noise: float = 8.0) -> list[str]:
    """Views corpus: same-patent figures are geometric views of ONE line-art
    base drawing, with per-figure ink-contrast jitter.

    This is the corpus on which the reference's core claim — contrastive
    fine-tuning IMPROVES retrieval (retrieval.ipynb cell 20 → cell 3/4) — is
    demonstrable with held-out patents (tests/test_finetune_lift.py):

    * base drawings are patent-drawing-like line art
      (``synthetic_drawing_arrays``), one per patent, per-entity seeded;
    * figure k of a patent is ``apply_view(base, k)`` — so positives share
      structure but not pixels, defeating near-duplicate matching;
    * per-figure contrast jitter makes global ink density non-discriminative,
      so retrieval must rely on stroke structure (a trained tower normalizes
      contrast; a random tower's DC channel cannot).

    On the ``hard=True`` noise corpus (near-duplicate positives) a random
    encoder already wins and 2-step fine-tuning can only hurt — measured
    MRR 0.767 → 0.081 — which is an artifact of that corpus, not of L8.
    """
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    bases: dict[str, np.ndarray] = {}
    view_counter: dict[str, int] = {}
    paths = []
    for r in records:
        if r.patent_id not in bases:
            s = int(_entity_rng(seed, "viewbase", r.patent_id)
                    .integers(0, 2**31 - 1))
            bases[r.patent_id] = (
                synthetic_drawing_arrays(1, image_size, seed=s)[0] * 255.0)
        # view index from the synthetic '-D<k>_' name pattern when present;
        # generic records (real-corpus FigureRecords carry no view field)
        # fall back to a per-patent counter so the function honors its
        # Sequence[FigureRecord] signature instead of raising on foreign
        # naming schemes
        try:
            fidx = int(r.figure_id.split("-D")[1].split("_")[0]) - 1
        except (IndexError, ValueError):
            fidx = view_counter.get(r.patent_id, 0)
        view_counter[r.patent_id] = fidx + 1
        img = apply_view(bases[r.patent_id], fidx)
        frng = _entity_rng(seed, "fig", r.figure_id)
        c = frng.uniform(0.35, 1.0)
        img = 255.0 - (255.0 - img) * c
        img = np.clip(img + frng.normal(0.0, noise, img.shape), 0, 255)
        path = os.path.join(root, r.figure_id)
        Image.fromarray(img.astype(np.uint8)).save(path)
        paths.append(path)
    return paths


def write_synthetic_corpus(root: str, num_patents: int = 20,
                           figures_per_patent: int = 4, image_size: int = 64,
                           seed: int = 0) -> tuple[list[FigureRecord], str]:
    """Full on-disk corpus: images/ + metadata.json; → (records, images_dir)."""
    meta = synthetic_metadata(num_patents, figures_per_patent, seed)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(meta, f)
    records = records_from_metadata(meta)
    images_dir = os.path.join(root, "images")
    write_synthetic_images(records, images_dir, image_size=image_size, seed=seed)
    return records, images_dir
