"""Host (numpy) twin of the featsense feature extraction.

Faithful re-derivation of the F-LOAM-style organized-cloud feature stage
(/root/reference/src/featsense/lidar_processing.cpp:125-286) used as the
golden reference for the vectorized device op (features.py), exactly like
the reference validates every CUDA kernel against a CPU twin
(/root/reference/test/cuda.cpp).

Spec notes (deliberate cleanups of reference quirks, mirrored in both
twins so they stay bit-identical):

* the reference's edge pass starts at ``k = ep`` which reads one element
  past the sorted block (lidar_processing.cpp:245) — here both passes stay
  inside [sp, ep);
* the reference decrements its feature budget inside the if-condition so
  the counter wanders negative (lidar_processing.cpp:250) — here it is a
  plain "accept at most N" counter (same accepted set);
* ties in the curvature sort are broken by index (stable sort) — the
  reference's std::sort leaves tie order unspecified;
* blocks are INDEPENDENT: the reference's serial loop lets a suppression
  mark at a block edge leak into the next block/row (coupling every block
  to all earlier ones); here each (row, block) starts from the shared
  occlusion mask and suppression stays inside the block — the parallelism
  the block partition exists to provide.  Within a block the edge pass
  still precedes (and suppresses) the surf pass.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class FeatureParams:
    min_distance: float = 2.0
    max_distance: float = 50.0
    edge_threshold: float = 2.5
    surf_threshold: float = 0.1
    max_edge_per_block: int = 20
    max_surf_per_block: int = 20


def curvature_and_ranges(cloud: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cloud: (H, W, 3).  Returns (curvature (H, W), ranges (H, W)).

    Curvature = |sum_{o=-5..5} p[v+o] - 11 p[v]|^2 over the row window
    (lidar_processing.cpp:190-216); defined for v in [5, W-6), +inf
    elsewhere (never a candidate).
    """
    H, W = cloud.shape[:2]
    curv = np.full((H, W), np.inf, dtype=np.float64)
    ranges = np.zeros((H, W), dtype=np.float64)
    pts = cloud.astype(np.float64)
    for u in range(H):
        for v in range(5, W - 6):
            window = pts[u, v - 5:v + 6].sum(axis=0) - 11.0 * pts[u, v]
            curv[u, v] = float(window @ window)
            ranges[u, v] = float(np.linalg.norm(pts[u, v]))
    return curv, ranges


def mark_occluded(ranges: np.ndarray, p: FeatureParams) -> np.ndarray:
    """Occlusion / range / parallel-beam mask (lidar_processing.cpp:136-188).
    True = point may not become a feature."""
    H, W = ranges.shape
    picked = np.zeros((H, W), dtype=bool)
    for u in range(H):
        for v in range(5, W - 6):
            d = ranges[u, v]
            dn = ranges[u, v + 1]
            dp = ranges[u, v - 1]
            if d < p.min_distance or d > p.max_distance:
                picked[u, v] = True
            if d - dn > 0.3:
                picked[u, v - 5:v + 1] = True
            if dn - d > 0.3:
                picked[u, v + 1:v + 7] = True
            if abs(dp - d) > 0.02 * d and abs(dn - d) > 0.02 * d:
                picked[u, v] = True
    return picked


def block_bounds(W: int) -> list[tuple[int, int]]:
    """[sp, ep) column ranges of the per-row extraction blocks
    (lidar_processing.cpp:230-237): starts at 5, step W//6, clipped to W-6."""
    step = W // 6
    out = []
    for sp in range(5, W - 6, step):
        ep = min(sp + step, W - 6)
        out.append((sp, ep))
    return out


def extract_features(cloud: np.ndarray, p: FeatureParams = FeatureParams()
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Full feature stage.  cloud: (H, W, 3) float, invalid points (0,0,0).

    Returns (edge_idx, surf_idx): arrays of flat indices u*W+v into the
    organized cloud, in (row, block, curvature-rank) acceptance order.
    """
    H, W = cloud.shape[:2]
    curv, ranges = curvature_and_ranges(cloud)
    picked = mark_occluded(ranges, p)

    edge_idx: list[int] = []
    surf_idx: list[int] = []
    for u in range(H):
        for sp, ep in block_bounds(W):
            cols = np.arange(sp, ep)
            order = cols[np.argsort(curv[u, sp:ep], kind="stable")]
            blocked = picked[u].copy()     # block-local suppression state

            n_edge = 0
            for v in order[::-1]:          # descending curvature
                if n_edge >= p.max_edge_per_block:
                    break
                if curv[u, v] >= p.edge_threshold and not blocked[v]:
                    edge_idx.append(u * W + v)
                    n_edge += 1
                    blocked[max(v - 5, 0):v + 5] = True

            n_surf = 0
            for v in order:                # ascending curvature
                if n_surf >= p.max_surf_per_block:
                    break
                if curv[u, v] <= p.surf_threshold and not blocked[v]:
                    surf_idx.append(u * W + v)
                    n_surf += 1
                    blocked[max(v - 5, 0):v + 6] = True

    return (np.asarray(edge_idx, dtype=np.int64),
            np.asarray(surf_idx, dtype=np.int64))
