"""Shared TSDF fusion-backend dispatch for the pipelines.

The reference shares ONE cuda::TSDFMapping between warpsense and
featsense (tsdf_mapping.cpp); this module is that shared seam on TPU:
both pipelines resolve "auto"/"pallas"/"projective"/"raymarch" here, so
kernel eligibility gates (window z extent, channel count, identity-rot
precondition) live in exactly one place.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.consts import MATRIX_RESOLUTION
from ..core.geometry import to_int_mat, transform_point_fixed
from ..map.local_map import LocalMapState


def sensor_tilt_deg(pose_mm: np.ndarray) -> float:
    """Tilt of the sensor z axis from the map vertical, degrees."""
    R = np.asarray(pose_mm, np.float64)[:3, :3]
    return float(np.degrees(np.arccos(np.clip(R[2, 2], -1.0, 1.0))))


def level_tilt_budget_deg(vfov_deg: float) -> float:
    """Tilt envelope of the LEVEL map-aligned beam grid.

    Two loss mechanisms under sensor tilt t (measured coverage-deficit
    curve vs the attitude-aware grid on the indoor box scene,
    tests/test_tsdf_projective.py::test_level_grid_tilt_envelope):

    * ring ALIASING — the scan's discrete elevation fan no longer aligns
      with the level table's ring centers, leaving hole rings: ~6-7%
      written-voxel deficit at ANY tilt > 0 (exactly 0 at t = 0);
    * band CLIPPING — returns whose map-frame elevation leaves
      [-vfov/2, vfov/2] drop entirely: grows with t (measured 18% at
      5.6 deg, 32% at 11.25 deg, 43% at 22.5 deg).

    2 degrees keeps the deficit around ~10% worst-case-scene (sub-voxel
    ATE impact, pinned by the rotation-rich accuracy bench) while the
    fast level kernel serves near-level platforms; beyond it dispatch
    falls back to the attitude-aware grid (general-rotation Pallas kernel
    / attitude XLA sweep; the reference's ray-march handles attitude via
    up-vector interpolation, update_tsdf.cu:49-63).  Measured fallback
    cost at the 91M-voxel bench window on v5e: the general-rotation
    Pallas kernel fuses in 14.6 ms vs the level kernel's 8.0 ms — a
    tilted platform still clears 20 Hz with fusion every scan."""
    del vfov_deg        # measured dominated by aliasing, not band width
    return 2.0


def grid_rotation_for(pose_mm: np.ndarray, vfov_deg: float,
                      budget_deg: float | None = None):
    """(rotation 3x3 f32, level: bool) — the beam-grid attitude for a scan
    captured at ``pose_mm``: identity (level grid, fast kernels) inside
    the tilt envelope, the true sensor attitude beyond it."""
    budget = (level_tilt_budget_deg(vfov_deg) if budget_deg is None
              else budget_deg)
    if sensor_tilt_deg(pose_mm) <= budget:
        return jnp.eye(3, dtype=jnp.float32), True
    return jnp.asarray(np.asarray(pose_mm)[:3, :3], jnp.float32), False


def resolve_fusion(fusion: str, *, size, channels: int,
                   columns: int = 1024) -> str:
    """"auto" -> "pallas" on TPU when the level kernel's constraints hold
    (z extent fits one lane block, ring axis fits one vreg row, the
    azimuth axis fits the 30-bank int32 bitmask), else "projective";
    explicit names pass through."""
    if fusion != "auto":
        return fusion
    import jax
    ok = (jax.default_backend() == "tpu" and size[2] <= 256
          and channels <= 128 and columns <= 2048)
    return "pallas" if ok else "projective"


def fuse_cloud(state: LocalMapState, pts_mm, mask, pose_mm: np.ndarray, *,
               params, size, fusion: str, max_steps=None, max_isteps=None
               ) -> LocalMapState:
    """One fusion step of a map-frame mm cloud captured at ``pose_mm``.

    ``fusion``: "raymarch" (reference-exact march), "projective" (dense
    sweep twin), "projective-level" (dense sweep binning on the LEVEL
    map-aligned grid — the single-chip twin of the sharded production
    fusion, parallel/sharded.py), "pallas" (level-grid kernel; bins on a
    map-aligned grid — the identity_rot precondition is satisfied here by
    construction), or "auto".
    """
    m = params.map
    scanner_pos = jnp.asarray(
        np.floor(np.asarray(pose_mm)[:3, 3] / m.resolution).astype(np.int32))
    fusion = resolve_fusion(fusion, size=size,
                            channels=params.lidar.channels,
                            columns=params.lidar.hresolution)
    if fusion in ("projective", "projective-level", "pallas"):
        from ..kernels.tsdf_pallas import tsdf_update_projective_pallas
        from ..ops.tsdf_projective import tsdf_update_projective
        update = (tsdf_update_projective_pallas if fusion == "pallas"
                  else tsdf_update_projective)
        # The beam grid attitude only defines the spherical binning of
        # the (already map-frame) scan, not the geometry.  "projective"
        # always bins with the sensor attitude (reference-exact);
        # "pallas"/"projective-level" bin on the LEVEL map-aligned grid
        # INSIDE the tilt envelope (the fast production configuration) and
        # automatically fall back to the attitude-aware grid beyond it —
        # the general-rotation Pallas kernel / attitude XLA sweep — so
        # sustained pitch/roll never silently drops returns
        # (level_tilt_budget_deg; reference role: update_tsdf.cu:49-63).
        if fusion == "projective":
            grid_rot, level = (
                jnp.asarray(np.asarray(pose_mm)[:3, :3], jnp.float32), False)
        else:
            grid_rot, level = grid_rotation_for(pose_mm,
                                                params.lidar.vfov)
        extra = {"identity_rot": level} if fusion == "pallas" else {}
        return update(
            state, pts_mm, mask, scanner_pos, grid_rot,
            size=size, tau=m.tau, max_weight=m.max_weight_scaled,
            resolution=m.resolution, channels=params.lidar.channels,
            columns=params.lidar.hresolution,
            vfov_deg=params.lidar.vfov, **extra)
    from ..ops.tsdf import tsdf_update
    int_rot = to_int_mat(jnp.asarray(np.asarray(pose_mm), jnp.float32))
    up = transform_point_fixed(
        jnp.asarray([0, 0, MATRIX_RESOLUTION], jnp.int32),
        int_rot.at[:3, 3].set(0))
    return tsdf_update(
        state, pts_mm, mask, scanner_pos, up, size=size, tau=m.tau,
        max_weight=m.max_weight_scaled, resolution=m.resolution,
        max_steps=max_steps, max_isteps=max_isteps,
        channels=params.lidar.channels, vfov_deg=params.lidar.vfov)
