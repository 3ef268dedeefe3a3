"""Device (XLA/TPU) point-to-TSDF Gauss-Newton registration.

TPU-first re-design of the CUDA pair ``calc_jacobis_krnl`` +
``h_g_e_reduction_krnl`` (src/warpsense/cuda/registration.cu:14-257) and the
host GN loop (src/warpsense/tsdf_registration.cpp:28-105):

* the per-point Jacobian is a gather of 7 TSDF cells (self + 6 neighbors)
  from the ring-buffer window, masked central differences, J = [p x grad,
  grad] — fully vectorized over the (padded) cloud;
* the 27-scalar reduction (H 6x6 symmetric, g 6, error, count) is two small
  matmuls on the MXU: ``H = Js^T Js``, ``g = Js^T v`` — no shared-memory
  tree, no 32-partial host reduce, no per-iteration host round trip;
* the *entire* <=max_iterations GN loop runs inside one jitted
  ``lax.while_loop`` — pose update, 6x6 solve, Levenberg damping and the
  reference's 4-error convergence window all stay on device.  The reference
  instead uploads the pose and downloads partials every iteration
  (registration.cu:351-361).

Numerics: the reference accumulates H and g in int64.  f32 matmuls with
*column scaling* give the same GN step to ~1e-6 relative: scale columns of J
by D = diag([sc]*3, [sg]*3), solve (D H D + a c D^2) y = -D g, then
xi = D y — an exact reparametrization of (H + a c I) xi = -g, but with all
matmul operands O(1)-ranged so f32 (and the MXU) is sufficient.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.consts import MATRIX_RESOLUTION
from ..core.geometry import div_trunc, transform_point_fixed, xi_to_transform
from ..map.local_map import LocalMapState, in_bounds, ring_index

# Column scaling: cross terms ~ p[mm] * grad[mm] ~ 2e4 * 1e3; grad ~ 1e3.
_SC = 1.0 / (1 << 24)
_SG = 1.0 / (1 << 10)


def jacobian_stats(state: LocalMapState, points: jax.Array, mask: jax.Array,
                   total_transform: jax.Array, *, size: tuple[int, int, int],
                   resolution: int, normalize_gradient: bool = False):
    """One iteration's scaled normal-equation statistics.

    Returns (Hs 6x6 f32, gs 6 f32, e f32, c f32) where Hs = D H D and
    gs = D g for D = diag([_SC]*3, [_SG]*3).
    points: (N, 3) int32 mm; mask: (N,) bool.
    """
    int_mat = jnp.trunc(total_transform.astype(jnp.float32)
                        * MATRIX_RESOLUTION).astype(jnp.int32)
    center = total_transform[:3, 3].astype(jnp.int32)  # C cast truncation

    pts = transform_point_fixed(points, int_mat)
    # floor cells, matching the fusion op's voxel addressing (see
    # ops/tsdf.py on the deliberate deviation from the reference's trunc)
    buf = jnp.floor_divide(pts, resolution)
    p = (pts - center).astype(jnp.float32)

    valid = mask & in_bounds(buf, state.pos, jnp.asarray(size), 1)
    value_flat = state.value.reshape(-1)
    weight_flat = state.weight.reshape(-1)

    def lookup(offset):
        idx = ring_index(buf + jnp.asarray(offset, jnp.int32),
                         state.pos, state.offset, size)
        return (value_flat[idx].astype(jnp.int32),
                weight_flat[idx].astype(jnp.int32))

    cur_v, cur_w = lookup((0, 0, 0))
    valid = valid & (cur_w != 0)

    grads = []
    for ax in range(3):
        off = [0, 0, 0]
        off[ax] = 1
        nv, nw = lookup(tuple(off))
        off[ax] = -1
        pv, pw = lookup(tuple(off))
        sign_change = ((nv > 0) & (pv < 0)) | ((nv < 0) & (pv > 0))
        ok = (nw != 0) & (pw != 0) & ~sign_change
        grads.append(jnp.where(ok, div_trunc(nv - pv, 2), 0))
    grad = jnp.stack(grads, axis=-1).astype(jnp.float32)   # (N, 3)
    if normalize_gradient:
        # proper directional derivative (mm per mm instead of mm per voxel):
        # turns the reference's ~1/resolution-scaled creep steps into true
        # Gauss-Newton steps (an improvement mode, not parity).
        grad = grad / float(resolution)

    cross = jnp.cross(p, grad)                              # (N, 3)
    Js = jnp.concatenate([cross * _SC, grad * _SG], axis=-1)  # (N, 6)
    vf = valid.astype(jnp.float32)
    Js = Js * vf[:, None]
    v = cur_v.astype(jnp.float32) * vf

    H = Js.T @ Js                                           # MXU 6x6
    g = Js.T @ v
    e = jnp.sum(jnp.abs(v))
    c = jnp.sum(vf)
    return H, g, e, c


@functools.partial(
    jax.jit,
    static_argnames=("size", "resolution", "max_iterations", "mode"),
)
def register_cloud(state: LocalMapState, points: jax.Array, mask: jax.Array,
                   pretransform: jax.Array, *, size: tuple[int, int, int],
                   resolution: int, max_iterations: int,
                   it_weight_gradient: float, epsilon: float,
                   mode: str = "parity") -> jax.Array:
    """Full GN registration; returns the refined 4x4 pose (f32).

    Convergence: |err - prev[2]| < eps and |err - prev[0]| < eps over the
    4-error sliding window (tsdf_registration.cpp:81-93).

    ``mode``:
    * ``"parity"`` — the reference's exact scheme: un-normalized voxel
      gradient (so steps creep at ~1/resolution of the GN step) and the
      rotation centered on the *initial* pretransform translation.
    * ``"fast"`` — resolution-normalized gradients (true GN steps) and
      per-iteration recentering on the current pose translation; converges
      in a handful of iterations and avoids the parity mode's coupling of
      far-from-origin rotation with translation.
    """
    fast = mode == "fast"
    center = pretransform[:3, 3].astype(jnp.int32)
    D = jnp.concatenate([jnp.full((3,), _SC, jnp.float32),
                         jnp.full((3,), _SG, jnp.float32)])

    def cond(carry):
        i, _, _, _, finished = carry
        return (i < max_iterations) & ~finished

    def body(carry):
        i, total, alpha, prev, _ = carry
        H, g, e, c = jacobian_stats(state, points, mask, total,
                                    size=size, resolution=resolution,
                                    normalize_gradient=fast)
        # (D H D + alpha c D^2) y = -D g;  xi = D y
        A = H + alpha * c * jnp.diag(D * D)
        ok = c > 0.0
        A = jnp.where(ok, A, jnp.eye(6, dtype=jnp.float32))
        y = jnp.linalg.solve(A, -g)
        xi = jnp.where(ok, D * y, jnp.zeros(6, jnp.float32))
        ctr = total[:3, 3].astype(jnp.int32) if fast else center
        transform = xi_to_transform(xi, ctr)
        total = jnp.where(ok, transform @ total, total)

        err = e / jnp.maximum(c, 1.0)
        finished = ((jnp.abs(err - prev[2]) < epsilon)
                    & (jnp.abs(err - prev[0]) < epsilon)) | ~ok
        prev = jnp.concatenate([prev[1:], err[None]])
        return i + 1, total, alpha + it_weight_gradient, prev, finished

    init = (jnp.int32(0), pretransform.astype(jnp.float32), jnp.float32(0.0),
            jnp.zeros((4,), jnp.float32), jnp.bool_(False))
    _, total, _, _, _ = jax.lax.while_loop(cond, body, init)
    return total
