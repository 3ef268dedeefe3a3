"""Device (XLA/TPU) F-LOAM scan-to-map odometry.

TPU-first re-design of featsense's ``OdomEstimation`` + Ceres stack
(/root/reference/src/featsense/odom_estimation.cpp,
 /root/reference/src/featsense/lidar_optimization.cpp):

* the nanoflann kd-trees become one brute-force 5-NN on the MXU — a
  (queries x map) squared-distance matmul + ``top_k``.  Feature maps are
  fixed-capacity masked point arrays (the static-shape contract), so the
  "rebuild the kd-tree every frame" cost disappears entirely;
* the per-point Ceres problems become batched closed-form fits: 3x3
  ``eigh`` for the edge line fit (eigenvalue gate lambda_max > 3
  lambda_mid, odom_estimation.cpp:168-177) and a least-squares plane fit
  with the 0.2 m inlier gate (odom_estimation.cpp:219-235);
* Ceres' Huber(0.1)-loss LM solve becomes an IRLS Gauss-Newton over the
  analytic residual Jacobians (lidar_optimization.cpp:14-80), with the
  same quaternion-left-increment manifold update
  (PoseSE3Parameterization::Plus, lidar_optimization.cpp:83-98).  The
  whole (re-associate -> 4 GN steps) x optimization_count loop runs in ONE
  jitted function — no per-iteration host round trips;
* PCL VoxelGrid / CropBox map maintenance becomes sort + segment-mean
  voxel centroids over the fixed-capacity arrays.

Replicated reference quirk: the surf map is voxel-filtered at
``edge_resolution`` (odom_estimation.cpp:27-28 binds both leaf sizes to
edge_resolution) — kept as the default for trajectory parity, overridable
via ``surf_leaf``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import geometry


class FeatureMapState(NamedTuple):
    """Fixed-capacity world-frame feature map (meters)."""
    points: jax.Array   # (CAP, 3) f32
    mask: jax.Array     # (CAP,) bool


def empty_map(capacity: int) -> FeatureMapState:
    return FeatureMapState(points=jnp.zeros((capacity, 3), jnp.float32),
                           mask=jnp.zeros((capacity,), bool))


# ------------------------------------------------------------------ primitives

def knn(query: jax.Array, map_pts: jax.Array, map_mask: jax.Array, k: int,
        *, exact: bool = False):
    """Brute-force k-NN: (Nq, k) indices + squared distances (MXU matmul).

    Replaces nanoflann::KdTreeFLANN::nearestKSearch
    (odom_estimation.cpp:143,205).  The selection uses the TPU-native
    ``approx_max_k`` (recall ~0.95 per neighbor; a missed neighbor only
    swaps in the 6th-nearest, well inside the fits' robustness — the
    reference's kd-tree is exact but order-of-magnitude slower here);
    ``exact=True`` keeps the full ``top_k``."""
    d2 = (jnp.sum(query * query, axis=-1)[:, None]
          - 2.0 * query @ map_pts.T
          + jnp.sum(map_pts * map_pts, axis=-1)[None, :])
    d2 = jnp.where(map_mask[None, :], d2, jnp.inf)
    if exact or jax.default_backend() not in ("tpu",):
        neg, idx = jax.lax.top_k(-d2, k)
    else:
        neg, idx = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
    return idx, -neg


def _solve3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 3x3 solve via the adjugate (vector ops; batched LU
    measures ~2 ms for 4K systems on v5e)."""
    a00, a01, a02 = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    a10, a11, a12 = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
    a20, a21, a22 = A[:, 2, 0], A[:, 2, 1], A[:, 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    x = (c00 * b[:, 0] + c10 * b[:, 1] + c20 * b[:, 2]) / det
    y = (c01 * b[:, 0] + c11 * b[:, 1] + c21 * b[:, 2]) / det
    z = (c02 * b[:, 0] + c12 * b[:, 1] + c22 * b[:, 2]) / det
    return jnp.stack([x, y, z], axis=-1)


def _eigh3_top(cov: jax.Array):
    """Closed-form top of the spectrum for batched symmetric 3x3.

    Returns (lambda_max, lambda_mid, principal unit eigenvector) via the
    trigonometric characteristic-root formula + the cross-product
    eigenvector construction — pure vector ops, ~50 flops per matrix;
    ``jnp.linalg.eigh`` on batched 3x3 runs QR iterations and measures
    ~8 ms for 6K matrices on v5e (the odometry hot-path cost, hence
    this)."""
    a = cov
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0                 # (N,)
    aq = a - q[:, None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(aq * aq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    b = aq / p[:, None, None]
    detb = jnp.linalg.det(b)
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)                            # max
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)       # min
    l2 = 3.0 * q - l1 - l3                                     # mid
    # eigenvector of l1: columns of (A - l2 I)(A - l3 I) span its space
    c = ((a - l2[:, None, None] * jnp.eye(3, dtype=a.dtype))
         @ (a - l3[:, None, None] * jnp.eye(3, dtype=a.dtype)))
    norms = jnp.linalg.norm(c, axis=1)                         # column norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(c, best[:, None, None], axis=2)[..., 0]
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    return l1, l2, v


def fit_lines(neighbors: jax.Array, ok: jax.Array):
    """Edge line fit: (Nq, 5, 3) neighbor sets -> (point_a, point_b, valid).

    Parity odom_estimation.cpp:146-177: centroid, scatter matrix, principal
    eigenvector; valid when lambda_max > 3 * lambda_mid; line endpoints
    center +- 0.1 * direction."""
    center = jnp.mean(neighbors, axis=1)                       # (Nq, 3)
    zm = neighbors - center[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", zm, zm)                   # (Nq, 3, 3)
    l1, l2, direction = _eigh3_top(cov)
    valid = ok & (l1 > 3.0 * l2)
    point_a = center + 0.1 * direction
    point_b = center - 0.1 * direction
    return point_a, point_b, valid


def fit_planes(neighbors: jax.Array, ok: jax.Array):
    """Surf plane fit: solve A n = -1, gate on 0.2 m inlier distance.

    Parity odom_estimation.cpp:207-235.  Returns (normal, d, valid)."""
    A = neighbors                                              # (Nq, 5, 3)
    # relative jitter: an absolute 1e-9 underflows against f32 entries of
    # O(10^2), leaving singular systems (coplanar-through-origin sets) that
    # solve() turns into inf/NaN
    AtA = jnp.einsum("nki,nkj->nij", A, A)
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[:, None, None]
    AtA = AtA + (1e-6 * tr + 1e-9) * jnp.eye(3)
    Atb = -jnp.sum(A, axis=1)
    # Cramer/adjugate instead of batched LU: ~30 flops per system; the
    # downstream finite/residual gates already absorb near-singular sets
    n = _solve3(AtA, Atb)                                      # (Nq, 3)
    norm = jnp.linalg.norm(n, axis=-1)
    safe = jnp.maximum(norm, 1e-12)
    d = 1.0 / safe
    n = n / safe[:, None]
    finite = jnp.all(jnp.isfinite(n), axis=-1) & jnp.isfinite(d)
    n = jnp.where(finite[:, None], n, 0.0)
    d = jnp.where(finite, d, 0.0)
    resid = jnp.abs(jnp.einsum("nki,ni->nk", A, n) + d[:, None])
    valid = ok & finite & (norm > 1e-12) & jnp.all(resid <= 0.2, axis=1)
    return n, d, valid


def edge_residuals(q, t, pts, point_a, point_b, valid):
    """Point-to-line residual + analytic Jacobian wrt (omega, upsilon).

    Parity EdgeAnalyticCostFunction (lidar_optimization.cpp:14-45)."""
    lp = geometry.quat_rotate(q, pts) + t
    nu = jnp.cross(lp - point_a, lp - point_b)
    de = point_a - point_b
    de_norm = jnp.linalg.norm(de, axis=-1)
    nu_norm = jnp.linalg.norm(nu, axis=-1)
    safe_de = jnp.maximum(de_norm, 1e-12)
    safe_nu = jnp.maximum(nu_norm, 1e-12)
    r = nu_norm / safe_de
    # J = -nu^T/|nu| @ skew(de) @ [-skew(lp) | I] / |de|.  With the identity
    # a^T skew(b) = (a x b)^T:  dr/dlp = -(nhat x de)^T / |de| =: row/|de|,
    # and row^T (-skew(lp)) = (lp x row)^T.
    nhat = nu / safe_nu[:, None]
    row = -jnp.cross(nhat, de)
    J_rot = jnp.cross(lp, row)
    J = jnp.concatenate([J_rot, row], axis=-1) / safe_de[:, None]
    # where-mask (not multiply): 0 * NaN from degenerate invalid rows is NaN
    return (jnp.where(valid, r, 0.0),
            jnp.where(valid[:, None], J, 0.0))


def surf_residuals(q, t, pts, normal, d, valid):
    """Point-to-plane residual + analytic Jacobian.

    Parity SurfNormAnalyticCostFunction (lidar_optimization.cpp:56-80)."""
    pw = geometry.quat_rotate(q, pts) + t
    r = jnp.einsum("ni,ni->n", normal, pw) + d
    # J = n^T [-skew(pw) | I];  n^T(-skew(pw)) = -(n x pw)^T = (pw x n)^T
    J_rot = jnp.cross(pw, normal)
    J = jnp.concatenate([J_rot, normal], axis=-1)
    return (jnp.where(valid, r, 0.0),
            jnp.where(valid[:, None], J, 0.0))


def _huber_weights(r: jax.Array, delta: float) -> jax.Array:
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


def gn_step(q, t, r, J, delta: float = 0.1, damping: float = 1e-6):
    """One Huber-IRLS Gauss-Newton step on the se3 left increment."""
    w = _huber_weights(r, delta)
    Jw = J * w[:, None]
    H = Jw.T @ J                                              # (6, 6) MXU
    g = Jw.T @ r
    count = jnp.sum((jnp.sum(jnp.abs(J), axis=-1) > 0).astype(jnp.float32))
    ok = count >= 6.0
    A = H + damping * jnp.eye(6, dtype=jnp.float32)
    A = jnp.where(ok, A, jnp.eye(6, dtype=jnp.float32))
    dx = jnp.where(ok, jnp.linalg.solve(A, -g), jnp.zeros(6, jnp.float32))
    dq, dt = geometry.se3_exp(dx)
    # manifold plus (lidar_optimization.cpp:83-98): q <- dq*q, t <- dq*t + dt
    q_new = geometry.quat_mul(dq, q)
    q_new = q_new / jnp.linalg.norm(q_new)
    t_new = geometry.quat_rotate(dq, t[None, :])[0] + dt
    return q_new, t_new


# ------------------------------------------------------------- voxel centroid

@functools.partial(jax.jit, static_argnames=("leaf", "capacity"))
def voxel_downsample(points: jax.Array, mask: jax.Array, leaf: float,
                     capacity: int):
    """PCL-VoxelGrid-style centroid downsample on fixed-shape arrays.

    Returns (points (capacity, 3), mask (capacity,)).
    Replaces downSizeFilterEdge/Surf (odom_estimation.cpp:118-127).
    Jitted (leaf/capacity static — config constants): the ~20 eager ops
    otherwise cost one remote dispatch EACH on a tunneled device."""
    N = points.shape[0]
    key = jnp.floor(points / leaf).astype(jnp.int32)
    big = jnp.int32(2 ** 24)
    kx = jnp.where(mask, key[:, 0], big)
    ky = jnp.where(mask, key[:, 1], big)
    kz = jnp.where(mask, key[:, 2], big)
    order = jnp.lexsort((kz, ky, kx))
    sk = jnp.stack([kx, ky, kz], axis=-1)[order]               # (N, 3)
    sp = points[order]
    sm = mask[order]
    new_group = jnp.concatenate([
        jnp.ones((1,), bool),
        jnp.any(sk[1:] != sk[:-1], axis=-1)])
    gid = jnp.cumsum(new_group) - 1                            # (N,)
    wf = sm.astype(jnp.float32)
    sums = jax.ops.segment_sum(sp * wf[:, None], gid, num_segments=N)
    cnts = jax.ops.segment_sum(wf, gid, num_segments=N)
    centroid = sums / jnp.maximum(cnts, 1.0)[:, None]
    vmask = cnts > 0.0
    ordv = jnp.argsort(~vmask, stable=True)[:capacity]
    return centroid[ordv], vmask[ordv]


@functools.partial(jax.jit, static_argnames=("crop", "leaf"))
def merge_map(map_state: FeatureMapState, new_pts: jax.Array,
              new_mask: jax.Array, center: jax.Array, *, crop: float,
              leaf: float) -> FeatureMapState:
    """Append world-frame points, crop +-crop meters around ``center``,
    voxel-centroid downsample back into the fixed capacity
    (addPointsToMap, odom_estimation.cpp:255-296).  Jitted: one dispatch
    per call instead of ~20 (see voxel_downsample)."""
    cap = map_state.points.shape[0]
    pts = jnp.concatenate([map_state.points, new_pts])
    msk = jnp.concatenate([map_state.mask, new_mask])
    inside = jnp.all(jnp.abs(pts - center[None, :]) <= crop, axis=-1)
    p, m = voxel_downsample(pts, msk & inside, leaf, cap)
    return FeatureMapState(points=p, mask=m)


# ------------------------------------------------------------ jitted odometry

@functools.partial(jax.jit, static_argnames=("inner_iters",))
def odom_update(edge_map: FeatureMapState, surf_map: FeatureMapState,
                edge_pts: jax.Array, edge_mask: jax.Array,
                surf_pts: jax.Array, surf_mask: jax.Array,
                q0: jax.Array, t0: jax.Array, opt_count: jax.Array,
                *, inner_iters: int = 4):
    """(re-associate -> ``inner_iters`` GN steps) x ``opt_count``, one jit.

    Scan features are in the SENSOR frame; maps in world frame (meters).
    Returns the refined (q, t)."""

    def outer(carry, _):
        q, t, i = carry

        def associate_and_solve(q, t):
            ew = geometry.quat_rotate(q, edge_pts) + t
            eidx, ed2 = knn(ew, edge_map.points, edge_map.mask, 5)
            e_ok = edge_mask & (ed2[:, 4] < 1.0)
            pa, pb, e_valid = fit_lines(edge_map.points[eidx], e_ok)

            sw = geometry.quat_rotate(q, surf_pts) + t
            sidx, sd2 = knn(sw, surf_map.points, surf_map.mask, 5)
            s_ok = surf_mask & (sd2[:, 4] < 1.0)
            nrm, d, s_valid = fit_planes(surf_map.points[sidx], s_ok)

            def inner(carry2, _):
                q, t = carry2
                re, Je = edge_residuals(q, t, edge_pts, pa, pb, e_valid)
                rs, Js = surf_residuals(q, t, surf_pts, nrm, d, s_valid)
                r = jnp.concatenate([re, rs])
                J = jnp.concatenate([Je, Js])
                return gn_step(q, t, r, J), None

            (q, t), _ = jax.lax.scan(inner, (q, t), None, length=inner_iters)
            return q, t

        q, t = jax.lax.cond(i < opt_count, associate_and_solve,
                            lambda q, t: (q, t), q, t)
        return (q, t, i + 1), None

    max_outer = 20  # initMapWithPoints bootstrap count (odom_estimation.cpp:46)
    (q, t, _), _ = jax.lax.scan(outer, (q0, t0, jnp.int32(0)), None,
                                length=max_outer)
    return q, t


# --------------------------------------------------------------- host shell

class OdomEstimation:
    """Host orchestration mirroring the reference class: constant-velocity
    prediction, bootstrap init, jitted solve, map maintenance."""

    def __init__(self, *, edge_map_capacity: int = 8192,
                 surf_map_capacity: int = 16384, edge_leaf: float = 0.4,
                 surf_leaf: float | None = None, optimization_steps: int = 3,
                 crop: float = 100.0, inner_iters: int = 4):
        # reference quirk: surf leaf defaults to the EDGE resolution
        # (odom_estimation.cpp:27-28)
        self.edge_leaf = float(edge_leaf)
        self.surf_leaf = float(surf_leaf if surf_leaf is not None else edge_leaf)
        self.optimization_steps = int(optimization_steps)
        self.crop = float(crop)
        self.inner_iters = int(inner_iters)
        self.edge_map = empty_map(edge_map_capacity)
        self.surf_map = empty_map(surf_map_capacity)
        self.odom = np.eye(4, dtype=np.float64)
        self.last_odom = np.eye(4, dtype=np.float64)
        self.optimization_count = 2
        self.initialized = False

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def _occupied_prefix(m: FeatureMapState, n: int,
                         lo: int = 256) -> FeatureMapState:
        """Slice a feature map to the smallest power-of-4 bucket >= its
        occupied count (valid entries live in a prefix by construction).
        Power of 4, not 2: every bucket is a fresh jit shape, and on a
        remote/tunneled device each odom_update compile costs tens of
        seconds — halving the level count costs at most 4x padding on
        the knn map side, still far below full capacity."""
        cap = m.points.shape[0]
        c = lo
        while c < n:
            c *= 4
        if c >= cap:
            return m
        return FeatureMapState(points=m.points[:c], mask=m.mask[:c])

    def _pose_qt(self):
        q = np.asarray(geometry.mat_to_quat(
            jnp.asarray(self.odom[:3, :3], jnp.float32)))
        t = self.odom[:3, 3].astype(np.float32)
        return jnp.asarray(q), jnp.asarray(t)

    def _set_pose(self, q, t):
        R = np.asarray(geometry.quat_to_mat(q), dtype=np.float64)
        self.odom = np.eye(4)
        self.odom[:3, :3] = R
        self.odom[:3, 3] = np.asarray(t, dtype=np.float64)

    def _downsample_scan(self, pts, mask, leaf):
        return voxel_downsample(pts, mask, leaf, pts.shape[0])

    def _world(self, q, t, pts):
        return geometry.quat_rotate(q, pts) + t

    # -- main entry (updatePointsToMap, odom_estimation.cpp:50-105) ----------
    def update(self, edge_pts, edge_mask, surf_pts, surf_mask) -> np.ndarray:
        """One scan of sensor-frame features -> new world pose (4x4 f64)."""
        edge_pts = jnp.asarray(edge_pts, jnp.float32)
        surf_pts = jnp.asarray(surf_pts, jnp.float32)
        edge_mask = jnp.asarray(edge_mask)
        surf_mask = jnp.asarray(surf_mask)

        if not self.initialized:
            q, t = self._pose_qt()
            self._absorb(q, t, edge_pts, edge_mask, surf_pts, surf_mask)
            self.optimization_count = 20
            self.initialized = True
            return self.odom.copy()

        if self.optimization_count > self.optimization_steps:
            self.optimization_count -= 1

        # constant-velocity prediction (odom_estimation.cpp:59-61)
        prediction = self.odom @ (np.linalg.inv(self.last_odom) @ self.odom)
        self.last_odom = self.odom.copy()
        self.odom = prediction

        d_edge, m_edge = self._downsample_scan(edge_pts, edge_mask,
                                               self.edge_leaf)
        d_surf, m_surf = self._downsample_scan(surf_pts, surf_mask,
                                               self.surf_leaf)

        q, t = self._pose_qt()
        n_edge = int(np.asarray(jnp.sum(self.edge_map.mask)))
        n_surf = int(np.asarray(jnp.sum(self.surf_map.mask)))
        if n_edge > 10 and n_surf > 50:
            # the 5-NN matmul runs over the MAP capacity; feature maps are
            # typically a small fraction full after crop + voxel filter
            # (measured 302/8192 edge, 3598/16384 surf at bench shapes), so
            # slice to the occupied prefix in power-of-2 buckets — results
            # are identical (masked entries were +inf in the distance
            # matrix) and odometry halved, 3.1 -> 1.6 ms/scan on v5e.  The
            # valid-prefix invariant comes from voxel_downsample's
            # valid-first ordering; bucket count is log2(capacity), so
            # recompiles stay bounded.
            q, t = odom_update(self._occupied_prefix(self.edge_map, n_edge),
                               self._occupied_prefix(self.surf_map, n_surf),
                               d_edge, m_edge, d_surf, m_surf, q, t,
                               jnp.int32(self.optimization_count),
                               inner_iters=self.inner_iters)
        self._set_pose(np.asarray(q), np.asarray(t))
        self._absorb(q, t, d_edge, m_edge, d_surf, m_surf)
        return self.odom.copy()

    def _absorb(self, q, t, edge_pts, edge_mask, surf_pts, surf_mask):
        center = jnp.asarray(np.asarray(t), jnp.float32)
        self.edge_map = merge_map(self.edge_map, self._world(q, t, edge_pts),
                                  edge_mask, center, crop=self.crop,
                                  leaf=self.edge_leaf)
        self.surf_map = merge_map(self.surf_map, self._world(q, t, surf_pts),
                                  surf_mask, center, crop=self.crop,
                                  leaf=self.surf_leaf)
