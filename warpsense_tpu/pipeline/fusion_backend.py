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


def resolve_fusion(fusion: str, *, size, channels: int) -> str:
    """"auto" -> "pallas" on TPU when the level kernel's constraints hold
    (z extent fits one lane block, ring axis fits one vreg row), else
    "projective"; explicit names pass through."""
    if fusion != "auto":
        return fusion
    import jax
    ok = (jax.default_backend() == "tpu" and size[2] <= 256
          and channels <= 128)
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
    fusion = resolve_fusion(fusion, size=size, channels=params.lidar.channels)
    if fusion in ("projective", "projective-level", "pallas"):
        from ..kernels.tsdf_pallas import tsdf_update_projective_pallas
        from ..ops.tsdf_projective import tsdf_update_projective
        update = (tsdf_update_projective_pallas if fusion == "pallas"
                  else tsdf_update_projective)
        # The beam grid attitude only defines the spherical binning of
        # the (already map-frame) scan, not the geometry.  The Pallas
        # kernel's beam-window invariant is exact for a LEVEL grid, so
        # that path always bins map-aligned; the XLA twin keeps the
        # sensor attitude for reference-exact behavior ("projective") or
        # matches the level binning on request ("projective-level").
        grid_rot = (jnp.asarray(np.asarray(pose_mm)[:3, :3], jnp.float32)
                    if fusion == "projective"
                    else jnp.eye(3, dtype=jnp.float32))
        extra = {"identity_rot": True} if fusion == "pallas" else {}
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
