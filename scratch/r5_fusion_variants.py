"""Round-5 fusion assault: micro-opt (f32 merge) + in-kernel banked mini.

Variants (all must be BIT-IDENTICAL to the production level kernel):
  prod : kernels/tsdf_pallas.py tsdf_update_projective_pallas (baseline)
  v1   : f32-dominant kernel — ring ops in f32, NaN hole sentinel (drops
         isfinite), f32-exact merge without int32 intermediates
  v2   : v1 + in-kernel banked mini expansion (t3 banked in VMEM, per-block
         dynamic bank skip via pl.when) — kills the 2.88 ms XLA row gather
"""
import functools
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import room_cloud, FULL
from warpsense_tpu.core.consts import MATRIX_RESOLUTION, WEIGHT_RESOLUTION
from warpsense_tpu.map.local_map import LocalMapState, in_bounds
from warpsense_tpu.kernels.tsdf_pallas import (
    _LANES, _ZB, _gather_lanes, tsdf_update_projective_pallas)
from warpsense_tpu.ops.tsdf_projective import (
    _global_coords, atan2_poly, banded_atan, build_beam_table)
from warpsense_tpu.ops.tsdf_reference import dz_per_distance

SIZE = FULL["size"]
TAU, RES = FULL["tau"], FULL["res"]
CH, COLS = FULL["channels"], FULL["columns"]
VFOV = FULL["vfov_deg"]
MAXW = 32 * WEIGHT_RESOLUTION
X, Y, Z = SIZE
YB, XB = 128, 5
K = 8


# ---------------------------------------------------------------- v1 kernel

def _kernel_v1(mini_ref, cxs_ref, cys_ref, czs_ref, v_ref, w_ref,
               out_v_ref, out_w_ref, *, tau, max_weight, resolution,
               channels, columns, vfov_deg, hole_sentinel=1e8):
    i = pl.program_id(0)
    xb = v_ref.shape[0]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    for k in range(xb):
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]
        dz = czs_ref[0:1, :]
        rho2 = dx * dx + dy * dy
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        el = banded_atan(dz * inv_rho)
        ringf = jnp.clip((half_v - el) * (1.0 / spacing), -1e4, 1e4)
        rr = jnp.round(ringf)                             # ring kept in f32
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        mini = mini_ref[k].astype(jnp.float32)
        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]
        hole = bx >= hole_sentinel
        bxr = bx - dx
        byr = by - dy
        sq_xy = bxr * bxr + byr * byr
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)  # NaN sentinel

        sq = _gather_lanes(sq_xy, ridx)
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
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.round(colf))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))                     # f32 weight
        # NaN r_beam makes r_vox <= r_beam + tau False for holes — exactly
        # the set isfinite() used to reject
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

        # f32-exact merge (all magnitudes < 2^24, check_fusion_config)
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
        out_w = jnp.where(avg_case, jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)


# ---------------------------------------------------------------- v2 kernel

def _kernel_v2(bank_ref, t3b_ref, colc_ref, cxs_ref, cys_ref, czs_ref,
               v_ref, w_ref, out_v_ref, out_w_ref, acc_ref, *, tau,
               max_weight, resolution, channels, columns, vfov_deg,
               hole_sentinel=1e8):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xb = v_ref.shape[0]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    for k in range(xb):
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]
        dz = czs_ref[0:1, :]

        # ---- in-kernel mini expansion: banked lane gather from VMEM t3.
        # Index math hoisted out of the bank branches: within bank b the
        # relative index iy - 128*b equals iy & 127, and lanes outside the
        # bank gather garbage that the bank-id select discards — so one
        # (iy & 127, iy >> 7) pair serves every bank.
        bits = bank_ref[i * xb + k, j]
        iy = jnp.broadcast_to(colc_ref[0, pl.ds(i * xb + k, 1), :],
                              (3 * _LANES, YB))
        idx_lo = iy & 127
        bank_id = iy >> 7
        for b in range(8):
            @pl.when(bits == (1 << b))
            def _(b=b):                    # single-bank block: no select
                acc_ref[...] = jnp.take_along_axis(t3b_ref[b], idx_lo,
                                                   axis=-1)
            @pl.when((((bits >> b) & 1) == 1) & (bits != (1 << b)))
            def _(b=b):
                part = jnp.take_along_axis(t3b_ref[b], idx_lo, axis=-1)
                acc_ref[...] = jnp.where(bank_id == b, part, acc_ref[...])
        mini = acc_ref[...].T                              # (YB, 384)

        rho2 = dx * dx + dy * dy
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        el = banded_atan(dz * inv_rho)
        ringf = jnp.clip((half_v - el) * (1.0 / spacing), -1e4, 1e4)
        rr = jnp.round(ringf)
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]
        hole = bx >= hole_sentinel
        bxr = bx - dx
        byr = by - dy
        sq_xy = bxr * bxr + byr * byr
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)

        sq = _gather_lanes(sq_xy, ridx)
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
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.round(colf))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

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
        out_w = jnp.where(avg_case, jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)




# ---------------------------------------------------------------- v3 kernel
# v2 + shared-semantics cuts (would be mirrored in the XLA twin): 5-coeff
# atan for elevation (|err| ~1e-5 rad vs bin half-width 3.1e-3), round via
# floor(x+0.5), no ringf clip (non-finite ringf self-rejects via NaN
# comparisons).  Mismatches vs prod are expected ONLY at bin boundaries.

_ATAN5 = (0.999866, -0.3302995, 0.180141, -0.085133, 0.0208351)


def _atan5(t):
    s = t * t
    p = jnp.float32(_ATAN5[-1])
    for c in reversed(_ATAN5[:-1]):
        p = p * s + jnp.float32(c)
    return p * t


def _kernel_v3(bank_ref, t3b_ref, colc_ref, cxs_ref, cys_ref, czs_ref,
               v_ref, w_ref, out_v_ref, out_w_ref, acc_ref, *, tau,
               max_weight, resolution, channels, columns, vfov_deg,
               hole_sentinel=1e8):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xb = v_ref.shape[0]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    for k in range(xb):
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]
        dz = czs_ref[0:1, :]

        bits = bank_ref[i * xb + k, j]
        iy = jnp.broadcast_to(colc_ref[0, pl.ds(i * xb + k, 1), :],
                              (3 * _LANES, YB))
        idx_lo = iy & 127
        bank_id = iy >> 7
        for b in range(8):
            @pl.when(bits == (1 << b))
            def _(b=b):
                acc_ref[...] = jnp.take_along_axis(t3b_ref[b], idx_lo,
                                                   axis=-1)
            @pl.when((((bits >> b) & 1) == 1) & (bits != (1 << b)))
            def _(b=b):
                part = jnp.take_along_axis(t3b_ref[b], idx_lo, axis=-1)
                acc_ref[...] = jnp.where(bank_id == b, part, acc_ref[...])
        mini = acc_ref[...].T

        rho2 = dx * dx + dy * dy
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        el = _atan5(dz * inv_rho)
        ringf = (half_v - el) * (1.0 / spacing)
        rr = jnp.floor(ringf + 0.5)
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]
        hole = bx >= hole_sentinel
        bxr = bx - dx
        byr = by - dy
        sq_xy = bxr * bxr + byr * byr
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)

        sq = _gather_lanes(sq_xy, ridx)
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
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.floor(colf + 0.5))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

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
        out_w = jnp.where(avg_case, jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)


def _kernel_ab_nobank(bank_ref, t3b_ref, colc_ref, cxs_ref, cys_ref, czs_ref,
               v_ref, w_ref, out_v_ref, out_w_ref, acc_ref, *, tau,
               max_weight, resolution, channels, columns, vfov_deg,
               hole_sentinel=1e8):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xb = v_ref.shape[0]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    for k in range(xb):
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]
        dz = czs_ref[0:1, :]

        # ---- in-kernel mini expansion: banked lane gather from VMEM t3.
        # Index math hoisted out of the bank branches: within bank b the
        # relative index iy - 128*b equals iy & 127, and lanes outside the
        # bank gather garbage that the bank-id select discards — so one
        # (iy & 127, iy >> 7) pair serves every bank.
        bits = bank_ref[i * xb + k, j] * 0
        iy = jnp.broadcast_to(colc_ref[0, pl.ds(i * xb + k, 1), :],
                              (3 * _LANES, YB))
        idx_lo = iy & 127
        bank_id = iy >> 7
        for b in range(8):
            @pl.when(bits == (1 << b))
            def _(b=b):                    # single-bank block: no select
                acc_ref[...] = jnp.take_along_axis(t3b_ref[b], idx_lo,
                                                   axis=-1)
            @pl.when((((bits >> b) & 1) == 1) & (bits != (1 << b)))
            def _(b=b):
                part = jnp.take_along_axis(t3b_ref[b], idx_lo, axis=-1)
                acc_ref[...] = jnp.where(bank_id == b, part, acc_ref[...])
        mini = acc_ref[...].T                              # (YB, 384)

        rho2 = dx * dx + dy * dy
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        el = banded_atan(dz * inv_rho)
        ringf = jnp.clip((half_v - el) * (1.0 / spacing), -1e4, 1e4)
        rr = jnp.round(ringf)
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]
        hole = bx >= hole_sentinel
        bxr = bx - dx
        byr = by - dy
        sq_xy = bxr * bxr + byr * byr
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)

        sq = _gather_lanes(sq_xy, ridx)
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
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.round(colf))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

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
        out_w = jnp.where(avg_case, jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)



def _kernel_ab_nomerge(bank_ref, t3b_ref, colc_ref, cxs_ref, cys_ref, czs_ref,
               v_ref, w_ref, out_v_ref, out_w_ref, acc_ref, *, tau,
               max_weight, resolution, channels, columns, vfov_deg,
               hole_sentinel=1e8):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xb = v_ref.shape[0]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    for k in range(xb):
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]
        dz = czs_ref[0:1, :]

        # ---- in-kernel mini expansion: banked lane gather from VMEM t3.
        # Index math hoisted out of the bank branches: within bank b the
        # relative index iy - 128*b equals iy & 127, and lanes outside the
        # bank gather garbage that the bank-id select discards — so one
        # (iy & 127, iy >> 7) pair serves every bank.
        bits = bank_ref[i * xb + k, j]
        iy = jnp.broadcast_to(colc_ref[0, pl.ds(i * xb + k, 1), :],
                              (3 * _LANES, YB))
        idx_lo = iy & 127
        bank_id = iy >> 7
        for b in range(8):
            @pl.when(bits == (1 << b))
            def _(b=b):                    # single-bank block: no select
                acc_ref[...] = jnp.take_along_axis(t3b_ref[b], idx_lo,
                                                   axis=-1)
            @pl.when((((bits >> b) & 1) == 1) & (bits != (1 << b)))
            def _(b=b):
                part = jnp.take_along_axis(t3b_ref[b], idx_lo, axis=-1)
                acc_ref[...] = jnp.where(bank_id == b, part, acc_ref[...])
        mini = acc_ref[...].T                              # (YB, 384)

        rho2 = dx * dx + dy * dy
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        el = banded_atan(dz * inv_rho)
        ringf = jnp.clip((half_v - el) * (1.0 / spacing), -1e4, 1e4)
        rr = jnp.round(ringf)
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]
        hole = bx >= hole_sentinel
        bxr = bx - dx
        byr = by - dy
        sq_xy = bxr * bxr + byr * byr
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)

        sq = _gather_lanes(sq_xy, ridx)
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
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.round(colf))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

        out_v_ref[k] = new_v.astype(jnp.int16)
        out_w_ref[k] = new_w.astype(jnp.int16)
        continue
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
        out_w = jnp.where(avg_case, jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)



def _kernel_ab_nogather(bank_ref, t3b_ref, colc_ref, cxs_ref, cys_ref, czs_ref,
               v_ref, w_ref, out_v_ref, out_w_ref, acc_ref, *, tau,
               max_weight, resolution, channels, columns, vfov_deg,
               hole_sentinel=1e8):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xb = v_ref.shape[0]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    for k in range(xb):
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]
        dz = czs_ref[0:1, :]

        # ---- in-kernel mini expansion: banked lane gather from VMEM t3.
        # Index math hoisted out of the bank branches: within bank b the
        # relative index iy - 128*b equals iy & 127, and lanes outside the
        # bank gather garbage that the bank-id select discards — so one
        # (iy & 127, iy >> 7) pair serves every bank.
        bits = bank_ref[i * xb + k, j]
        iy = jnp.broadcast_to(colc_ref[0, pl.ds(i * xb + k, 1), :],
                              (3 * _LANES, YB))
        idx_lo = iy & 127
        bank_id = iy >> 7
        for b in range(8):
            @pl.when(bits == (1 << b))
            def _(b=b):                    # single-bank block: no select
                acc_ref[...] = jnp.take_along_axis(t3b_ref[b], idx_lo,
                                                   axis=-1)
            @pl.when((((bits >> b) & 1) == 1) & (bits != (1 << b)))
            def _(b=b):
                part = jnp.take_along_axis(t3b_ref[b], idx_lo, axis=-1)
                acc_ref[...] = jnp.where(bank_id == b, part, acc_ref[...])
        mini = acc_ref[...].T                              # (YB, 384)

        rho2 = dx * dx + dy * dy
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        el = banded_atan(dz * inv_rho)
        ringf = jnp.clip((half_v - el) * (1.0 / spacing), -1e4, 1e4)
        rr = jnp.round(ringf)
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]
        hole = bx >= hole_sentinel
        bxr = bx - dx
        byr = by - dy
        sq_xy = bxr * bxr + byr * byr
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)

        sq = sq_xy[:, 0:1] + jnp.zeros_like(r_vox)
        bz = bzr[:, 0:1] + jnp.zeros_like(r_vox)
        r_beam = r_beam_row[:, 0:1] + jnp.zeros_like(r_vox)

        dzb = dz - bz
        value = jnp.sqrt(sq + dzb * dzb)
        value = jnp.minimum(value, tau_f)
        behind = r_vox > r_beam
        value = jnp.where(behind, -value, value)

        delta_z = dzpd * r_vox * (1.0 / MATRIX_RESOLUTION)
        v_res = r_vox * jnp.abs(ringf - rr) * spacing
        vertical_ok = v_res <= jnp.maximum(delta_z, resolution * 0.5)
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.round(colf))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

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
        out_w = jnp.where(avg_case, jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)



def _kernel_ab_noel(bank_ref, t3b_ref, colc_ref, cxs_ref, cys_ref, czs_ref,
               v_ref, w_ref, out_v_ref, out_w_ref, acc_ref, *, tau,
               max_weight, resolution, channels, columns, vfov_deg,
               hole_sentinel=1e8):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xb = v_ref.shape[0]
    spacing = math.radians(vfov_deg) / (channels - 1)
    half_v = math.radians(vfov_deg) / 2.0
    dzpd = dz_per_distance(channels, vfov_deg)
    weight_epsilon = tau // 10
    tau_f = float(tau)
    for k in range(xb):
        dx = cxs_ref[i * xb + k, 0]
        dy = cys_ref[:, 0:1]
        dz = czs_ref[0:1, :]

        # ---- in-kernel mini expansion: banked lane gather from VMEM t3.
        # Index math hoisted out of the bank branches: within bank b the
        # relative index iy - 128*b equals iy & 127, and lanes outside the
        # bank gather garbage that the bank-id select discards — so one
        # (iy & 127, iy >> 7) pair serves every bank.
        bits = bank_ref[i * xb + k, j]
        iy = jnp.broadcast_to(colc_ref[0, pl.ds(i * xb + k, 1), :],
                              (3 * _LANES, YB))
        idx_lo = iy & 127
        bank_id = iy >> 7
        for b in range(8):
            @pl.when(bits == (1 << b))
            def _(b=b):                    # single-bank block: no select
                acc_ref[...] = jnp.take_along_axis(t3b_ref[b], idx_lo,
                                                   axis=-1)
            @pl.when((((bits >> b) & 1) == 1) & (bits != (1 << b)))
            def _(b=b):
                part = jnp.take_along_axis(t3b_ref[b], idx_lo, axis=-1)
                acc_ref[...] = jnp.where(bank_id == b, part, acc_ref[...])
        mini = acc_ref[...].T                              # (YB, 384)

        rho2 = dx * dx + dy * dy
        rho = jnp.sqrt(rho2)
        r_vox = jnp.sqrt(rho2 + dz * dz)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        el = dz * inv_rho * 0.3
        ringf = jnp.clip((half_v - el) * (1.0 / spacing), -1e4, 1e4)
        rr = jnp.round(ringf)
        ring_ok = (rr >= 0) & (rr < channels)
        ridx = jnp.clip(rr, 0, channels - 1).astype(jnp.int32)

        bx = mini[:, 0 * _LANES:1 * _LANES]
        by = mini[:, 1 * _LANES:2 * _LANES]
        bzr = mini[:, 2 * _LANES:3 * _LANES]
        hole = bx >= hole_sentinel
        bxr = bx - dx
        byr = by - dy
        sq_xy = bxr * bxr + byr * byr
        r_beam_row = jnp.sqrt(bx * bx + by * by + bzr * bzr)
        r_beam_row = jnp.where(hole, jnp.nan, r_beam_row)

        sq = _gather_lanes(sq_xy, ridx)
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
        az = atan2_poly(dy, dx + jnp.zeros_like(dy))
        colf = (az + math.pi) * (columns / (2 * math.pi))
        col_res = jnp.abs(colf - jnp.round(colf))
        h_res = r_vox * col_res * (2 * math.pi / columns)
        horizontal_ok = h_res <= resolution * 0.5

        interp = v_res > resolution * 0.5
        w = jnp.where(
            value < -weight_epsilon,
            jnp.floor((WEIGHT_RESOLUTION * (tau_f + value))
                      * (1.0 / (tau - weight_epsilon))),
            float(WEIGHT_RESOLUTION))
        ok = (ring_ok & vertical_ok & horizontal_ok
              & (r_vox <= r_beam + tau) & (w != 0))
        w = jnp.where(interp, -w, w)
        value_t = jnp.trunc(value)
        new_v = jnp.where(ok, value_t, 0.0)
        new_w = jnp.where(ok, w, 0.0)

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
        out_w = jnp.where(avg_case, jnp.minimum(float(max_weight), ew + new_w),
                          jnp.where(over_case, new_w, ew))
        out_v_ref[k] = out_v.astype(jnp.int16)
        out_w_ref[k] = out_w.astype(jnp.int16)




# -------------------------------------------------------------- host wrappers

def _prologue(state, points, mask, scanner_pos, rotation):
    scanner_mm = scanner_pos * RES + RES // 2
    cell = jnp.floor_divide(points, RES)
    pm = mask & in_bounds(cell, state.pos, jnp.asarray(SIZE),
                          -(TAU // RES // 2))
    rng_tab, endpoint = build_beam_table(
        points, pm, scanner_mm, rotation, channels=CH, columns=COLS,
        vfov_deg=VFOV)
    rel = endpoint - scanner_mm.astype(jnp.float32)
    rel = jnp.where(jnp.isfinite(rng_tab)[:, None], rel, jnp.inf)
    tab = rel.reshape(COLS, CH, 3)
    tab = jnp.pad(tab, ((0, 0), (0, _LANES - CH), (0, 0)),
                  constant_values=jnp.inf)
    t3 = jnp.concatenate([tab[:, :, 0], tab[:, :, 1], tab[:, :, 2]], axis=-1)

    gx, gy, gz = _global_coords(state.pos, state.offset, SIZE)
    cx = (gx * RES + RES // 2 - scanner_mm[0]).astype(jnp.float32)
    cy = (gy * RES + RES // 2 - scanner_mm[1]).astype(jnp.float32)
    cz = (gz * RES + RES // 2 - scanner_mm[2]).astype(jnp.float32)
    R = rotation.astype(jnp.float32)
    cxs = jnp.stack([cx, cx * R[0, 0], cx * R[0, 1], cx * R[0, 2]], axis=-1)
    cys = jnp.stack([cy, cy * R[1, 0], cy * R[1, 1], cy * R[1, 2]], axis=-1)
    czs = jnp.stack([cz, cz * R[2, 0], cz * R[2, 1], cz * R[2, 2]], axis=0)
    czs = jnp.pad(czs, ((0, 0), (0, _ZB - Z)))
    zc = Z // 2
    dsx_c = cxs[:, None, 1] + cys[None, :, 1] + czs[1, zc]
    dsy_c = cxs[:, None, 2] + cys[None, :, 2] + czs[2, zc]
    az_c = atan2_poly(dsy_c, dsx_c)
    col_c = jnp.mod(jnp.round((az_c + math.pi) / (2 * math.pi) * COLS)
                    .astype(jnp.int32), COLS)
    return t3, cxs, cys, czs, col_c


_std_specs = dict(
    out_specs=[
        pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ],
    out_shape=[
        jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
        jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
    ],
)


@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_v1(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    mini = t3[col_c]
    kern = functools.partial(_kernel_v1, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, pl.cdiv(Y, YB)),
        in_specs=[
            pl.BlockSpec((XB, YB, 3 * _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={4: 0, 5: 1},
        **_std_specs,
    )(mini, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)


@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_v2(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_v2, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)


@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_v3(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_v3, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)



@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_ab_nobank(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_ab_nobank, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)


@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_v3(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_v3, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)




@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_ab_nomerge(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_ab_nomerge, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)


@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_v3(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_v3, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)




@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_ab_nogather(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_ab_nogather, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)


@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_v3(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_v3, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)




@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_ab_noel(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_ab_noel, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)


@functools.partial(jax.jit, donate_argnames=("state",))
def fuse_v3(state, points, mask, scanner_pos, rotation):
    t3, cxs, cys, czs, col_c = _prologue(state, points, mask, scanner_pos,
                                         rotation)
    # banked transposed table: t3b[b] = t3.T[:, 128b:128(b+1)]
    t3b = t3.T.reshape(3 * _LANES, 8, 128).transpose(1, 0, 2)
    # per-(x, y-block) bank bitmask
    nyb = pl.cdiv(Y, YB)
    colp = jnp.pad(col_c, ((0, 0), (0, nyb * YB - Y)))
    banks = jnp.left_shift(jnp.int32(1), colp >> 7)        # (X, nyb*YB)
    bankmask = jax.lax.reduce(banks.reshape(X, nyb, YB), jnp.int32(0),
                              jax.lax.bitwise_or, (2,))    # (X, nyb)
    colc_r = colp.reshape(X, nyb, YB).transpose(1, 0, 2)   # (nyb, X, YB)
    kern = functools.partial(_kernel_v3, tau=TAU, max_weight=MAXW,
                             resolution=RES, channels=CH, columns=COLS,
                             vfov_deg=VFOV)
    out_v, out_w = pl.pallas_call(
        kern, grid=(X // XB, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bankmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t3b whole
            pl.BlockSpec((1, X, YB), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # colc
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ZB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, YB, _ZB), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.VMEM((3 * _LANES, YB), jnp.float32)],
        **_std_specs,
    )(bankmask, t3b, colc_r, cxs, cys, czs, state.value, state.weight)
    return LocalMapState(out_v, out_w, state.pos, state.offset)




# ------------------------------------------------------------------- driver

def fresh():
    return LocalMapState(
        value=jnp.full(SIZE, TAU, jnp.int16),
        weight=jnp.zeros(SIZE, jnp.int16),
        pos=jnp.zeros(3, jnp.int32),
        offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32))


def main():
    pts = jnp.asarray(room_cloud(FULL["n"]))
    mask = jnp.ones((pts.shape[0],), bool)
    origin = jnp.zeros(3, jnp.int32)
    eye = jnp.eye(3, dtype=jnp.float32)

    def prod(state, pts, mask, spos, rot):
        return tsdf_update_projective_pallas(
            state, pts, mask, spos, rot, size=SIZE, tau=TAU, max_weight=MAXW,
            resolution=RES, channels=CH, columns=COLS, vfov_deg=VFOV,
            identity_rot=True)

    variants = {"prod": prod, "v1": fuse_v1, "v2": fuse_v2, "v3": fuse_v3, "ab_nobank": fuse_ab_nobank, "ab_nomerge": fuse_ab_nomerge, "ab_nogather": fuse_ab_nogather, "ab_noel": fuse_ab_noel}
    if len(sys.argv) > 1:
        variants = {k: variants[k] for k in ["prod"] + sys.argv[1:]}

    # --- parity: two chained fusions (fresh + merge-into-existing)
    ref = None
    for name, fn in variants.items():
        if name.startswith("ab_"):
            continue
        st = fn(fresh(), pts, mask, origin, eye)
        st = fn(st, pts, mask, origin + 1, eye)
        v, w = np.asarray(st.value), np.asarray(st.weight)
        if ref is None:
            ref = (v, w)
            print(f"{name}: reference ({np.sum(w != 0)} written voxels)",
                  flush=True)
        else:
            mism = int(np.sum((v != ref[0]) | (w != ref[1])))
            print(f"{name}: {mism} bit mismatches", flush=True)

    # --- timing: K-chained loops
    def await_s(x):
        return float(np.asarray(x))

    tiny = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(jnp.sum)
    for _ in range(2):
        await_s(triv(tiny))
    rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    for name, fn in variants.items():
        @jax.jit
        def loop(state, fn=fn):
            def body(_, st):
                return fn(st, pts, mask, origin, eye)
            st = jax.lax.fori_loop(0, K, body, state)
            return jnp.sum(st.value[:2, :2, :2].astype(jnp.int32))

        await_s(loop(fresh()))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            await_s(loop(fresh()))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {(best - rtt) / K * 1e3:.2f} ms/fusion", flush=True)


if __name__ == "__main__":
    main()
