"""Feature correspondence (features/correspondence.cpp).

``find_correspondences`` replicates the brute-force nearest-neighbour match
with the Lowe-style ratio rule: accept iff best < 0.5 and
best < 0.8 * secondBest (correspondence.cpp:46-52).

Feature compare costs:
* checkerboard: 0 iff same image-set id and same corner index, else inf
  (checkerboard.cpp:58-66) — so checkerboard matching reduces to equal-index
  pairing;
* surf: L1 distance between descriptors (surf.cpp:60-72), done in one
  device matmul-free batched op here.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..config import MatchConfig
from ..data.project_io import FeatureRecord


def match_checkerboard(feats1: Sequence[FeatureRecord],
                       feats2: Sequence[FeatureRecord]
                       ) -> List[Tuple[int, int]]:
    """Equal-(imageSet, cindex) pairing."""
    index2 = {(f.image_set_id, f.corner_index): j
              for j, f in enumerate(feats2)}
    out = []
    for i, f in enumerate(feats1):
        j = index2.get((f.image_set_id, f.corner_index))
        if j is not None:
            out.append((i, j))
    return out


def match_descriptors(desc1: np.ndarray, desc2: np.ndarray,
                      cfg: MatchConfig = MatchConfig()
                      ) -> List[Tuple[int, int]]:
    """L1 nearest-neighbour with ratio test; desc: [N, D]."""
    if len(desc1) == 0 or len(desc2) == 0:
        return []
    # [N1, N2] L1 distances (batched; this is the device-friendly form)
    d = np.abs(desc1[:, None, :] - desc2[None, :, :]).sum(-1)
    out = []
    for i in range(len(desc1)):
        row = d[i]
        j = int(np.argmin(row))
        best = row[j]
        row2 = np.delete(row, j)
        second = row2.min() if len(row2) else np.inf
        if best < cfg.max_cost and best < cfg.ratio * second:
            out.append((i, j))
    return out


def find_correspondences(feats1: Sequence[FeatureRecord],
                         feats2: Sequence[FeatureRecord],
                         cfg: MatchConfig = MatchConfig()
                         ) -> List[Tuple[int, int]]:
    """Dispatch on feature kind (mirrors findCorrespondences over the
    generic compare)."""
    if not feats1 or not feats2:
        return []
    if feats1[0].kind == "checkerboard":
        return match_checkerboard(feats1, feats2)
    d1 = np.stack([f.descriptor for f in feats1
                   if f.descriptor is not None])
    d2 = np.stack([f.descriptor for f in feats2
                   if f.descriptor is not None])
    return match_descriptors(d1, d2, cfg)
