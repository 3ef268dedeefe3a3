"""Device (XLA/TPU) featsense feature extraction.

TPU-first re-design of the F-LOAM organized-cloud feature stage
(/root/reference/src/featsense/lidar_processing.cpp:125-286):

* curvature over the 11-point row window and the occlusion / range /
  parallel-beam masks are fully vectorized sweeps over the (H, W) grid
  (the reference runs serial per-row loops);
* per-(row, block) feature selection — take up to 20 highest-curvature
  edge and 20 lowest-curvature surf points with +-5-column greedy
  suppression — runs ONE ACCEPTANCE PER ROUND per block: every round,
  each of the H*6 blocks picks its best still-unsuppressed candidate
  simultaneously (argmax over the block), so the loop is bounded by the
  20-feature BUDGET instead of the ~W/6 curvature ranks (suppression is
  block-local, making the round-parallel greedy EXACTLY the sequential
  greedy per block — pinned against the numpy twin).  This replaced a
  rank-ordered loop of up to BLK iterations: 8.3 -> ~1 ms/scan on v5e;
* outputs are fixed-capacity, valid-first compacted point arrays — the
  static-shape contract every downstream op (odometry association, VGICP)
  relies on.

The numpy twin (features_reference.py) is the golden reference, mirroring
the reference repo's CUDA-vs-CPU parity testing (test/cuda.cpp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .features_reference import FeatureParams, block_bounds


def _shift(x: jax.Array, k: int, fill) -> jax.Array:
    """x shifted so out[v] = x[v + k] along the last axis, edge-filled."""
    if k == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (abs(k),), fill, x.dtype)
    if k > 0:
        return jnp.concatenate([x[..., k:], pad], axis=-1)
    return jnp.concatenate([pad, x[..., :k]], axis=-1)


def curvature_and_ranges(cloud: jax.Array) -> tuple[jax.Array, jax.Array]:
    """cloud: (H, W, 3) f32.  Returns (curvature, ranges), both (H, W);
    curvature is +inf outside the valid column band [5, W-6)."""
    H, W = cloud.shape[:2]
    window = jnp.zeros_like(cloud)
    for o in range(-5, 6):
        window = window + _shift(cloud.swapaxes(-1, -2), -o, 0.0).swapaxes(-1, -2)
    diff = window - 11.0 * cloud
    curv = jnp.sum(diff * diff, axis=-1)
    cols = jnp.arange(W)
    band = (cols >= 5) & (cols < W - 6)
    curv = jnp.where(band, curv, jnp.inf)
    ranges = jnp.linalg.norm(cloud, axis=-1)
    return curv, ranges


def mark_occluded(ranges: jax.Array, p: FeatureParams) -> jax.Array:
    """(H, W) bool occlusion/range/parallel-beam mask
    (parity lidar_processing.cpp:136-188, vectorized)."""
    W = ranges.shape[-1]
    cols = jnp.arange(W)
    band = (cols >= 5) & (cols < W - 6)
    # the reference only ever fills ranges_ inside the band, so the edge
    # comparisons at v-1 / v+1 see 0 there (lidar_processing.cpp:211)
    d = jnp.where(band, ranges, 0.0)
    dn = _shift(d, 1, 0.0)         # d[v+1]
    dp = _shift(d, -1, 0.0)        # d[v-1]

    picked = band & ((d < p.min_distance) | (d > p.max_distance))
    c1 = band & (d - dn > 0.3)     # marks [v-5, v]
    c2 = band & (dn - d > 0.3)     # marks [v+1, v+6]
    for k in range(0, 6):
        picked = picked | _shift(c1, k, False)
    for k in range(1, 7):
        picked = picked | _shift(c2, -k, False)
    parallel = (jnp.abs(dp - d) > 0.02 * d) & (jnp.abs(dn - d) > 0.02 * d)
    return picked | (band & parallel)


def _compact(points: jax.Array, idx: jax.Array, valid: jax.Array,
             capacity: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Valid-first stable compaction to a fixed capacity."""
    order = jnp.argsort(~valid, stable=True)
    take = order[:capacity]
    return points[take], valid[take][:capacity], idx[take]


@functools.partial(
    jax.jit,
    static_argnames=("params", "edge_capacity", "surf_capacity"))
def extract_features(cloud: jax.Array, *, params: FeatureParams = FeatureParams(),
                     edge_capacity: int = 2048, surf_capacity: int = 4096):
    """Full feature stage on device.

    cloud: (H, W, 3) f32 meters, organized OS1 scan, invalid rays (0,0,0).
    Returns (edge_pts, edge_mask, surf_pts, surf_mask) with static shapes
    (edge_capacity, 3) / (surf_capacity, 3), valid-first.
    """
    H, W = cloud.shape[:2]
    bounds = block_bounds(W)
    nb = len(bounds)
    BLK = max(ep - sp for sp, ep in bounds)
    LOC = BLK + 10                       # block-local columns sp-5 .. sp+BLK+4

    curv, ranges = curvature_and_ranges(cloud)
    picked = mark_occluded(ranges, params)

    sps = jnp.asarray([sp for sp, _ in bounds])                    # (nb,)
    lens = jnp.asarray([ep - sp for sp, ep in bounds])             # (nb,)
    pos_in_block = jnp.arange(BLK)
    cols = sps[:, None] + pos_in_block[None, :]                    # (nb, BLK)
    in_block = pos_in_block[None, :] < lens[:, None]               # (nb, BLK)
    cols_c = jnp.clip(cols, 0, W - 1)

    bcurv = curv[:, cols_c]                                        # (H, nb, BLK)
    bvalid = in_block[None] & jnp.isfinite(bcurv)

    # block-local suppression state, seeded from the occlusion mask
    loc_cols = sps[:, None] - 5 + jnp.arange(LOC)[None, :]         # (nb, LOC)
    blocked0 = picked[:, jnp.clip(loc_cols, 0, W - 1)]             # (H, nb, LOC)

    loc_iota = jnp.arange(LOC)[None, None, :]                      # (1,1,LOC)
    blk_iota = jnp.arange(BLK)[None, None, :]                      # (1,1,BLK)

    def run_pass(blocked, cand, keyvals, mark_lo, mark_hi, budget):
        """One greedy selection pass: EVERY round, each block accepts its
        best (max ``keyvals``) still-available candidate and suppresses
        the mark range around it — one acceptance per block per round, so
        the loop runs at most ``budget`` rounds (vs the previous
        rank-ordered loop's up-to-BLK trips; the per-trip cost is the
        dominant front-end term).  Because suppression never crosses block
        boundaries (blocked is per-(H, nb)), the round-parallel greedy is
        EXACTLY the per-block sequential greedy: within a block, the j-th
        round's argmax is the j-th greedy selection (ties resolve to the
        lowest position, matching the stable rank order).  All per-round
        ops are broadcast compares + reductions — no gathers, no scatters
        (an XLA scatter here serializes per element on TPU: measured
        ~45 ms/scan in round 2)."""
        span = mark_hi - mark_lo

        def cond(carry):
            r, _, _, alive = carry
            return (r < budget) & alive

        def body(carry):
            r, blocked, sel, _ = carry
            avail = cand & ~blocked[..., 5:5 + BLK]                # static slice
            key = jnp.where(avail, keyvals, -jnp.inf)
            best = jnp.max(key, axis=-1)                           # (H, nb)
            pos = jnp.argmax(key, axis=-1)
            accept = jnp.isfinite(best)
            at_pos = blk_iota == pos[..., None]
            sel = sel | (accept[..., None] & at_pos)
            lo = pos[..., None] + (5 + mark_lo)                    # (H,nb,1)
            mark = (loc_iota >= lo) & (loc_iota < lo + span)
            blocked = blocked | (accept[..., None] & mark)
            return r + 1, blocked, sel, jnp.any(accept)

        init = (jnp.int32(0), blocked, jnp.zeros((H, nb, BLK), bool),
                jnp.bool_(True))
        _, blocked, sel, _ = jax.lax.while_loop(cond, body, init)
        return blocked, sel

    edge_cand = bvalid & (bcurv >= params.edge_threshold)
    blocked, edge_sel = run_pass(blocked0, edge_cand, bcurv,
                                 -5, 5, params.max_edge_per_block)
    surf_cand = bvalid & (bcurv <= params.surf_threshold)
    _, surf_sel = run_pass(blocked, surf_cand, -bcurv,
                           -5, 6, params.max_surf_per_block)

    flat_idx = (jnp.arange(H)[:, None, None] * W + cols_c[None]).reshape(-1)
    pts = cloud.reshape(-1, 3)[flat_idx]
    e_pts, e_mask, e_idx = _compact(pts, flat_idx, edge_sel.reshape(-1),
                                    edge_capacity)
    s_pts, s_mask, s_idx = _compact(pts, flat_idx, surf_sel.reshape(-1),
                                    surf_capacity)
    return (e_pts, e_mask, e_idx), (s_pts, s_mask, s_idx)
