"""N-pair batch construction for contrastive image training.

Re-design of the reference's ``NPairBatchSampler`` / ``collate_npairs``
(src/models.py:97-145, 147-180) and ``create_n_pair_batch``
(src/train.py:1758-1789): group positives by anchor, sample one positive
per anchor, and emit fixed-size ``[a_1..a_B, p_1..p_B]`` index batches —
the anchors∥positives layout every contrastive loss in losses/ expects.
Pure index arithmetic on the host; decode/encode happens downstream.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterator, Mapping, Sequence

import numpy as np


def build_anchor_positives(pairs: Sequence[tuple[int, int]]
                           ) -> dict[int, list[int]]:
    """(anchor, positive) pairs → anchor → positives list (models.py:104-109)."""
    out: dict[int, list[int]] = defaultdict(list)
    for a, p in pairs:
        out[int(a)].append(int(p))
    return dict(out)


def npair_batches(anchor_to_positives: Mapping[int, Sequence[int]],
                  batch_pairs: int, rng: np.random.Generator,
                  shuffle: bool = True, drop_remainder: bool = False
                  ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yields (anchor_idx [B], positive_idx [B]) with one sampled positive
    per anchor (models.py:111-145 semantics; the interleaved flat layout of
    collate_npairs is ``np.stack([a, p]).T.ravel()`` if needed)."""
    anchors = np.asarray(sorted(anchor_to_positives), np.int64)
    if shuffle:
        anchors = anchors[rng.permutation(len(anchors))]
    for s in range(0, len(anchors), batch_pairs):
        chunk = anchors[s:s + batch_pairs]
        if drop_remainder and len(chunk) < batch_pairs:
            return
        pos = np.asarray([
            anchor_to_positives[int(a)][
                int(rng.integers(len(anchor_to_positives[int(a)])))]
            for a in chunk], np.int64)
        yield chunk, pos


def interleave(anchors: np.ndarray, positives: np.ndarray) -> np.ndarray:
    """[a1, p1, a2, p2, ...] — the reference's batch layout
    (models.py:128-131)."""
    return np.stack([anchors, positives], axis=1).ravel()


def stacked(anchors: np.ndarray, positives: np.ndarray) -> np.ndarray:
    """[a1..aB, p1..pB] — the layout used by multi_positive_nt_xent."""
    return np.concatenate([anchors, positives])
