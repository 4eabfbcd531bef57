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


def write_synthetic_images(records: Sequence[FigureRecord], root: str,
                           image_size: int = 64, seed: int = 0,
                           noise: int = 20) -> list[str]:
    """Write PNG figures (same-patent figures share a base drawing) and the
    metadata JSON; returns written image paths."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    bases: dict[str, np.ndarray] = {}
    paths = []
    for r in records:
        if r.patent_id not in bases:
            bases[r.patent_id] = rng.integers(0, 255,
                                              (image_size, image_size, 3),
                                              np.int64)
        img = np.clip(bases[r.patent_id] +
                      rng.integers(-noise, noise + 1,
                                   (image_size, image_size, 3)),
                      0, 255).astype(np.uint8)
        path = os.path.join(root, r.figure_id)
        Image.fromarray(img).save(path)
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
