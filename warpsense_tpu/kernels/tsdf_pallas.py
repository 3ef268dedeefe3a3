"""Pallas TPU kernel: single-pass projective TSDF fusion.

The XLA sweep (ops/tsdf_projective.py) is exact but pays one random gather
per voxel into the beam table — measured at ~31 ns/element on v5e (latency-
bound, serialized), i.e. ~0.7 s per table plane for the reference's 91M-voxel
window.  TPUs have no fast arbitrary gather; what they DO have is:

* free *row* gathers (a (X*Y,)-indexed gather of whole 128-lane rows from a
  small table runs at bandwidth — measured ~free at 390K rows), and
* an in-register per-lane shuffle: Mosaic lowers
  ``jnp.take_along_axis(tab (S,128), idx (S,128), axis=-1)`` to a dynamic
  lane gather, thousands of lookups per VPU op.

This kernel restructures the sweep around those two primitives
(reference semantics: cu_min_tsdf_krnl, update_tsdf.cu:45-128, re-derived
projectively; merge: cu_avg_tsdf_krnl, update_tsdf.cu:13-43):

1. (XLA, host of the kernel) each (x, y) voxel column gets the table row of
   its central azimuth: ``mini = T[col_c]`` — a free row gather producing
   (X, Y, 3*128) relative-endpoint lanes + the selector column.
2. (Pallas, this file) one pass over the window: per voxel compute the
   sensor-frame direction from separable per-axis coordinate vectors
   (no integer ring-wrap logic in-kernel — the wrap is folded into the
   coordinate arrays), derive (ring, col), lane-gather the beam endpoint
   from the column's mini row, run the exact shared projective math
   (_projective_math) and the exact shared merge (_merge_planes), and
   write the fused (value, weight) planes in place (input/output aliased).

Beam-window invariant (the one deliberate deviation from the XLA twin):
a voxel only fuses when its azimuth column equals its (x, y) column's
central azimuth column ``col_c``.  For a level scanner (R without roll/
pitch) the azimuth of a vertical voxel column is exactly z-invariant, so
coverage is identical to the twin; under tilt, voxels whose azimuth
rounds to a different column skip this fusion step — equivalent to the
reference dropping rays that exit the window (update_tsdf.cu:69-75) —
and are refreshed by subsequent scans.  tests/test_tsdf_pallas.py checks
bit-parity at R=I and statistical coverage under tilt.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.consts import MATRIX_RESOLUTION, WEIGHT_RESOLUTION
from ..map.local_map import LocalMapState, in_bounds
from ..ops.tsdf_projective import (_ATAN_COEFFS, _global_coords,
                                   _merge_planes, _projective_math,
                                   atan2_poly, banded_atan,
                                   build_beam_table, check_fusion_config)
from ..ops.tsdf_reference import dz_per_distance

_LANES = 128            # ring axis padded to one vreg row of lanes
_YB = 64                # y rows per block (general-rotation kernel)
_YB2 = 128              # y rows per block (production level kernel)
_ZB = 256               # z lanes per block (covers Z<=256 in one block)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Mosaic has no atan2/asin lowering; atan2_poly/banded_atan live in
# ops/tsdf_projective.py and are SHARED with the XLA twin so the twin and
# the kernels stay bit-identical (imported above; re-exported here for
# callers that historically imported them from this module).


def _gather_lanes(tab: jax.Array, idx: jax.Array) -> jax.Array:
    """take_along_axis(tab (S, 128), idx (S, Z)) in proven 128-lane chunks."""
    outs = []
    for z0 in range(0, idx.shape[-1], _LANES):
        outs.append(jnp.take_along_axis(tab, idx[:, z0:z0 + _LANES],
                                        axis=-1))
    return jnp.concatenate(outs, axis=-1)


def _fusion_kernel(mini_ref, cxs_ref, cys_ref, czs_ref, v_ref, w_ref,
                   out_v_ref, out_w_ref, *, tau, max_weight, resolution,
                   channels, columns, vfov_deg):
    # separable coordinates (all relative to the scanner, mm, f32):
    # cxs (X, 4) SMEM whole-array: [dx, R00*dx, R01*dx, R02*dx] per x slice
    # cys (YB, 4) VMEM; czs (4, ZB) VMEM — same 4 lanes per axis
    i = pl.program_id(0)
    dx = cxs_ref[i, 0]
    dy = cys_ref[:, 0:1]                                   # (YB, 1)
    dz = czs_ref[0:1, :]                                   # (1, ZB)
    dsx = cxs_ref[i, 1] + cys_ref[:, 1:2] + czs_ref[1:2, :]
    dsy = cxs_ref[i, 2] + cys_ref[:, 2:3] + czs_ref[2:3, :]
    dsz = cxs_ref[i, 3] + cys_ref[:, 3:4] + czs_ref[3:4, :]

    rho2 = dsx * dsx + dsy * dsy
    r_vox = jnp.sqrt(rho2 + dsz * dsz)                     # (YB, ZB)
    az = atan2_poly(dsy, dsx)
    el = atan2_poly(dsz, jnp.sqrt(rho2))    # == asin(dsz / r_vox)
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    ringf = (half_v - el) / spacing
    ring = jnp.round(ringf).astype(jnp.int32)
    ring_ok = (ring >= 0) & (ring < channels)
    colf = (az + math.pi) / (2 * math.pi) * columns
    col = jnp.mod(jnp.round(colf).astype(jnp.int32), columns)

    mini = mini_ref[0]                                     # (YB, 3*128+1)
    col_c = mini[:, 3 * _LANES:3 * _LANES + 1].astype(jnp.int32)
    on_column = col == col_c                               # beam-window W=0
    ridx = jnp.clip(ring, 0, channels - 1)
    bx = _gather_lanes(mini[:, 0 * _LANES:1 * _LANES], ridx)
    by = _gather_lanes(mini[:, 1 * _LANES:2 * _LANES], ridx)
    bz = _gather_lanes(mini[:, 2 * _LANES:3 * _LANES], ridx)
    r_beam = jnp.sqrt(bx * bx + by * by + bz * bz)
    r_beam = jnp.where(jnp.isfinite(bx), r_beam, jnp.inf)

    dxb = dx + jnp.zeros_like(r_vox)
    dyb = dy + jnp.zeros_like(r_vox)
    dzb = dz + jnp.zeros_like(r_vox)
    new_v, new_w = _projective_math(
        dxb, dyb, dzb, r_vox, ringf, ring, ring_ok & on_column, colf,
        r_beam, bx, by, bz, tau=tau, resolution=resolution,
        channels=channels, columns=columns, vfov_deg=vfov_deg)

    ev = v_ref[0].astype(jnp.int32)
    ew = w_ref[0].astype(jnp.int32)
    out_v, out_w = _merge_planes(ev, ew, new_v, new_w, max_weight)
    out_v_ref[0] = out_v.astype(jnp.int16)
    out_w_ref[0] = out_w.astype(jnp.int16)


def _fusion_kernel_level16(bank_ref, t3b_ref, colc_ref, cxs_ref, cys_ref,
                           czs_ref, v_ref, w_ref, out_v_ref, out_w_ref,
                           acc_ref, *, tau, max_weight, resolution,
                           channels, columns, vfov_deg,
                           hole_sentinel=32767.0):
    """The PRODUCTION level-grid fusion kernel (identity beam attitude).
    Restructured for VPU throughput (measured round 5: the whole fusion op
    dropped 8.0 -> ~6.5 ms at the 91M-voxel window, bit-identical):

    * IN-KERNEL banked mini expansion — the beam table rides along whole
      in VMEM as ``t3b`` (columns banked into 128-lane chunks of the
      TRANSPOSED table, ~1.5 MB) and each (x-slice, y-block) lane-gathers
      its own per-column beam rows from it, selecting between banks with a
      per-block bank bitmask (``pl.when`` skips absent banks — most
      blocks' azimuth arc touches 1-2 of 8).  This deletes the XLA row
      gather that materialized the 600 MB ``t3[col_c]`` mini (measured
      2.88 ms at the 208 GB/s small-row gather ceiling, r4) AND its
      600 MB kernel re-read;
    * per-(row, ring) endpoint precompute at HALF the voxel lane volume —
      a level column's voxel centers share (cx, cy), so the x/y legs of
      the point-to-endpoint distance collapse to per-ring work;
    * elevation binning drops the atan2 quadrant swap: t = dz/rho with
      |t| <= 1 inside the vFOV; outside, the raw odd polynomial is
      provably >= pi/4, so ring_ok rejects exactly what the swap would;
    * f32-exact merge: every magnitude is < 2^24 (check_fusion_config),
      so the averaging merge runs in f32 without the int16<->int32
      sublane repacks (bit-identical to _merge_planes; holes use a NaN
      r_beam sentinel whose comparisons reject exactly the isfinite set);
    * 128-row y blocks and 5-slice x blocks (DMA efficiency: +25%
      effective HBM bandwidth measured vs (1, 64, 256) blocks).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    xb = v_ref.shape[0]
    yb = v_ref.shape[1]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    nbanks = t3b_ref.shape[0]
    for k in range(xb):                     # unrolled x slices per block
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]                               # (YB, 1)
        dz = czs_ref[0:1, :]                               # (1, ZB)

        # ---- banked mini expansion.  Index math is hoisted out of the
        # bank branches: within bank b the relative index is iy & 127, and
        # lanes outside the bank gather garbage that the bank-id select
        # discards — one (iy & 127, iy >> 7) pair serves every bank.
        bits = bank_ref[i * xb + k, j]
        iy = jnp.broadcast_to(colc_ref[0, pl.ds(i * xb + k, 1), :],
                              (3 * _LANES, yb))
        idx_lo = iy & 127
        bank_id = iy >> 7
        for b in range(nbanks):
            @pl.when(bits == (1 << b))
            def _(b=b):                 # single-bank block: no select
                acc_ref[...] = jnp.take_along_axis(t3b_ref[b], idx_lo,
                                                   axis=-1)

            @pl.when((((bits >> b) & 1) == 1) & (bits != (1 << b)))
            def _(b=b):
                part = jnp.take_along_axis(t3b_ref[b], idx_lo, axis=-1)
                acc_ref[...] = jnp.where(bank_id == b, part, acc_ref[...])
        mini = acc_ref[...].T                              # (YB, 3*128)

        rho2 = dx * dx + dy * dy                           # (YB, 1)
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)                   # (YB, ZB)

        # banded atan (shared with the XLA twin): |t| <= 1 <=> |el| <= 45
        # deg covers the vFOV; the reciprocal is hoisted per row
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)            # (YB, 1)
        el = banded_atan(dz * inv_rho)
        ringf = jnp.clip((half_v - el) * (1.0 / spacing), -1e4, 1e4)
        rr = jnp.round(ringf)                              # ring in f32
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]               # bz (scanner-rel)
        hole = bx >= hole_sentinel
        bxr = bx - dx                                      # bx - cx
        byr = by - dy                                      # by - cy
        sq_xy = bxr * bxr + byr * byr         # (dx-bx)^2 + (dy-by)^2
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)  # NaN sentinel

        sq = _gather_lanes(sq_xy, ridx)                    # (YB, ZB)
        bz = _gather_lanes(bzr, ridx)
        r_beam = _gather_lanes(r_beam_row, ridx)

        dzb = dz - bz
        value = jnp.sqrt(sq + dzb * dzb)
        value = jnp.minimum(value, tau_f)
        behind = r_vox > r_beam
        value = jnp.where(behind, -value, value)

        delta_z = dzpd * r_vox * (1.0 / MATRIX_RESOLUTION)
        v_res = r_vox * jnp.abs(ringf - rr) * spacing
        vertical_ok = v_res <= jnp.maximum(delta_z, resolution * 0.5)
        # horizontal: level grid -> per-row azimuth residual (z-invariant);
        # h_res keeps the twin's exact r_vox * col_res * k evaluation order
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))       # (YB, 1)
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.round(colf))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))                      # f32 weight
        # a NaN r_beam makes r_vox <= r_beam + tau False for holes —
        # exactly the set isfinite() used to reject
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

        # f32-exact merge (bit-identical to _merge_planes: all magnitudes
        # < 2^24; same trunc-division-with-correction as _div_trunc_by_pos)
        ev = v_ref[k].astype(jnp.float32)
        ew = w_ref[k].astype(jnp.float32)
        avg_case = (new_w > 0) & (ew > 0)
        over_case = (new_w != 0) & (ew <= 0)
        den = jnp.where(avg_case, ew + new_w, 1.0)
        num = ev * ew + new_v * new_w
        af = jnp.abs(num)
        q = jnp.floor(af / den)
        r = af - q * den
        q = q + (r >= den).astype(jnp.float32) - (r < 0).astype(jnp.float32)
        q = jnp.where(num < 0, -q, q)
        out_v = jnp.where(avg_case, q, jnp.where(over_case, new_v, ev))
        out_w = jnp.where(avg_case,
                          jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)


def build_t3(rng_tab, endpoint, scanner_mm, *, channels: int, columns: int):
    """Beam table -> the kernel's (columns, 3*128) f32 table of RELATIVE
    endpoints (rings padded to 128 lanes; holes +inf).  Shared by the
    single-chip wrapper and the per-shard sharded fusion (which builds the
    beam table replicated outside shard_map)."""
    rel = endpoint - scanner_mm.astype(jnp.float32)
    rel = jnp.where(jnp.isfinite(rng_tab)[:, None], rel, jnp.inf)
    tab = rel.reshape(columns, channels, 3)
    tab = jnp.pad(tab, ((0, 0), (0, _LANES - channels), (0, 0)),
                  constant_values=jnp.inf)
    return jnp.concatenate([tab[:, :, 0], tab[:, :, 1], tab[:, :, 2]],
                           axis=-1)                        # (cols, 3*128)


def level_sweep_merge(value, weight, cx, cy, cz, t3, rotation, *, tau,
                      max_weight, resolution, channels, columns, vfov_deg):
    """Level-grid Pallas fusion + merge over an arbitrary box of voxels at
    scanner-RELATIVE coords (cx, cy, cz) (f32 mm, per axis) — the shared
    core of ``tsdf_update_projective_pallas(identity_rot=True)`` and the
    per-shard path in parallel/sharded.py (each shard passes its own cx
    slice; bit-identical to the XLA twin's sweep at R = I, so mesh and
    single-chip trajectories agree exactly).

    ``rotation`` must be the identity (the level-grid contract); it is
    still threaded through the central-azimuth formula verbatim so the
    arithmetic matches the general path bit-for-bit.

    Returns (value, weight) int16 planes of the merged map block."""
    X, Y, Z = value.shape[0], cy.shape[0], cz.shape[0]
    assert columns <= 30 * _LANES, (
        "the per-block bank bitmask is one int32; dispatch >3840-column "
        "scans to the XLA sweep")
    R = rotation.astype(jnp.float32)
    cxs = jnp.stack([cx, cx * R[0, 0], cx * R[0, 1], cx * R[0, 2]], axis=-1)
    cys = jnp.stack([cy, cy * R[1, 0], cy * R[1, 1], cy * R[1, 2]], axis=-1)
    czs = jnp.stack([cz, cz * R[2, 0], cz * R[2, 1], cz * R[2, 2]], axis=0)
    czs = jnp.pad(czs, ((0, 0), (0, _ZB - Z)))
    zc = Z // 2
    dsx_c = cxs[:, None, 1] + cys[None, :, 1] + czs[1, zc]
    dsy_c = cxs[:, None, 2] + cys[None, :, 2] + czs[2, zc]
    az_c = atan2_poly(dsy_c, dsx_c)
    col_c = jnp.mod(jnp.round((az_c + math.pi) / (2 * math.pi) * columns)
                    .astype(jnp.int32), columns)           # (X, Y)

    # in-kernel banked mini expansion: no 600 MB host-side t3[col_c]
    # materialization at all — the whole (transposed, banked) beam table
    # rides along in VMEM (~1.5 MB) and each block lane-gathers its own
    # rows; holes stay +inf (>= the 1e8 sentinel test)
    yb = _YB2
    xb = 5 if X % 5 == 0 else 1
    nbanks = pl.cdiv(columns, _LANES)
    t3b = jnp.pad(t3, ((0, nbanks * _LANES - columns), (0, 0)),
                  constant_values=jnp.inf)
    t3b = t3b.T.reshape(3 * _LANES, nbanks, _LANES).transpose(1, 0, 2)
    nyb = pl.cdiv(Y, yb)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * yb - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*yb)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, yb), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, yb).transpose(1, 0, 2)   # (nyb, X, yb)
    kern = functools.partial(
        _fusion_kernel_level16, tau=tau, max_weight=max_weight,
        resolution=resolution, channels=channels, columns=columns,
        vfov_deg=vfov_deg, hole_sentinel=1e8)
    return pl.pallas_call(
        kern,
        grid=(X // xb, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),           # t3b whole
            pl.BlockSpec((1, X, yb), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),           # colc rows
            pl.BlockSpec(memory_space=pltpu.SMEM),           # cxs
            pl.BlockSpec((yb, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
            jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, yb), jnp.float32)],
        interpret=_interpret(),
    )(bankmask, t3b, colc_r, cxs, cys, czs, value, weight)


@functools.partial(
    jax.jit,
    static_argnames=("size", "tau", "max_weight", "resolution", "channels",
                     "columns", "vfov_deg", "identity_rot"),
    donate_argnames=("state",),
)
def tsdf_update_projective_pallas(
        state: LocalMapState, points: jax.Array, points_mask: jax.Array,
        scanner_pos: jax.Array, rotation: jax.Array, *,
        size: tuple[int, int, int], tau: int, max_weight: int,
        resolution: int, channels: int = 128, columns: int = 1024,
        vfov_deg: float = 45.0, identity_rot: bool = False) -> LocalMapState:
    """Drop-in Pallas replacement for ops.tsdf_projective
    .tsdf_update_projective (same signature/semantics, see module doc).

    ``identity_rot=True`` switches to the bit-exact level-grid kernel
    specialization (per-column azimuth, no beam-window test) — the
    pipeline's standard configuration.  PRECONDITION (unchecked, the
    rotation is traced): the caller must pass the identity rotation;
    otherwise the beam table and the per-voxel az/el bins silently
    disagree."""
    check_fusion_config(tau, max_weight, vfov_deg)
    assert channels <= _LANES, "ring axis must fit one 128-lane vreg row"
    X, Y, Z = size
    assert Z <= _ZB, "window z extent must fit a single 256-lane block"
    scanner_mm = scanner_pos * resolution + resolution // 2

    # --- beam table with relative endpoints (holes -> +inf), same ray gate
    # as the XLA twin (whole rays dropped when the endpoint leaves the
    # window grown by tau/2; ops/tsdf.py point_ok, update_tsdf.cu:69-75)
    cell = jnp.floor_divide(points, resolution)
    points_mask = points_mask & in_bounds(
        cell, state.pos, jnp.asarray(size), -(tau // resolution // 2))
    rng_tab, endpoint = build_beam_table(
        points, points_mask, scanner_mm, rotation, channels=channels,
        columns=columns, vfov_deg=vfov_deg)
    t3 = build_t3(rng_tab, endpoint, scanner_mm, channels=channels,
                  columns=columns)

    # --- separable relative coordinates (ring wrap folded in, f32 mm)
    gx, gy, gz = _global_coords(state.pos, state.offset, size)
    cx = (gx * resolution + resolution // 2
          - scanner_mm[0]).astype(jnp.float32)
    cy = (gy * resolution + resolution // 2
          - scanner_mm[1]).astype(jnp.float32)
    cz = (gz * resolution + resolution // 2
          - scanner_mm[2]).astype(jnp.float32)

    if identity_rot:
        out_v, out_w = level_sweep_merge(
            state.value, state.weight, cx, cy, cz, t3, rotation, tau=tau,
            max_weight=max_weight, resolution=resolution, channels=channels,
            columns=columns, vfov_deg=vfov_deg)
        return LocalMapState(value=out_v, weight=out_w, pos=state.pos,
                             offset=state.offset)

    R = rotation.astype(jnp.float32)
    cxs = jnp.stack([cx, cx * R[0, 0], cx * R[0, 1], cx * R[0, 2]], axis=-1)
    cys = jnp.stack([cy, cy * R[1, 0], cy * R[1, 1], cy * R[1, 2]], axis=-1)
    czs = jnp.stack([cz, cz * R[2, 0], cz * R[2, 1], cz * R[2, 2]], axis=0)
    czs = jnp.pad(czs, ((0, 0), (0, _ZB - Z)))

    # --- central azimuth per (x, y) column at the window's mid z slice,
    # then the free row gather building each column's mini beam row
    zc = Z // 2
    dsx_c = cxs[:, None, 1] + cys[None, :, 1] + czs[1, zc]
    dsy_c = cxs[:, None, 2] + cys[None, :, 2] + czs[2, zc]
    az_c = atan2_poly(dsy_c, dsx_c)
    col_c = jnp.mod(jnp.round((az_c + math.pi) / (2 * math.pi) * columns)
                    .astype(jnp.int32), columns)           # (X, Y)

    mini = t3[col_c]                                       # (X, Y, 3*128)
    mini = jnp.concatenate([mini, col_c[..., None].astype(jnp.float32)],
                           axis=-1)                        # (X, Y, 3*128+1)
    yb, mini_lanes, xb = _YB, 3 * _LANES + 1, 1
    kern = functools.partial(
        _fusion_kernel, tau=tau, max_weight=max_weight,
        resolution=resolution, channels=channels, columns=columns,
        vfov_deg=vfov_deg)
    grid = (X // xb, pl.cdiv(Y, yb))
    out_v, out_w = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((xb, yb, mini_lanes),
                         lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((yb, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
            jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=_interpret(),
    )(mini, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(value=out_v, weight=out_w, pos=state.pos,
                         offset=state.offset)
