"""Ablate pieces of the level16 kernel to localize the VPU cost."""
import sys
import time
import functools
import math

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import room_cloud
from warpsense_tpu.core.consts import MATRIX_RESOLUTION, WEIGHT_RESOLUTION
from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.kernels import tsdf_pallas as tp
from warpsense_tpu.ops.tsdf_projective import _merge_planes
from warpsense_tpu.ops.tsdf_reference import dz_per_distance

K = 8
TAU, RES = 600, 64
SIZE = (625, 625, 235)
X, Y, Z = SIZE
CH, COLS = 128, 1024
_LANES = 128
_ZB = 256
YB, XB = 128, 5


def await_s(x):
    return float(np.asarray(x))


tiny = jnp.zeros((8, 128), jnp.float32)
triv = jax.jit(jnp.sum)
for _ in range(2):
    await_s(triv(tiny))
rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter() - t0)[1])(
    time.perf_counter()) for _ in range(5))
print(f"rtt {rtt*1e3:.1f} ms", flush=True)


def timed(fn, *args, reps=3):
    await_s(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        await_s(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / K


# prebuilt inputs (mimic the host side of the packed f32 path)
rng = np.random.default_rng(0)
mini = jnp.asarray(rng.uniform(-2e4, 2e4, (X, Y, 384)).astype(np.float32))
cx = jnp.asarray(np.arange(X, dtype=np.float32) * RES - X * RES / 2)
cy = jnp.asarray(np.arange(Y, dtype=np.float32) * RES - Y * RES / 2)
cz = np.zeros((4, _ZB), np.float32)
cz[0, :Z] = np.arange(Z) * RES - Z * RES / 2
czs = jnp.asarray(cz)
cxs = jnp.stack([cx, cx, cx, cx], axis=-1)
cys = jnp.stack([cy, cy, cy, cy], axis=-1)
v0 = jnp.zeros((X, Y, Z), jnp.int16)
w0 = jnp.zeros((X, Y, Z), jnp.int16)


def make_variant(mode):
    spacing = math.radians(45.0) / (CH - 1)
    half_v = math.radians(45.0) / 2.0
    dzpd = dz_per_distance(CH, 45.0)
    weight_epsilon = TAU // 10

    def kern(mini_ref, cxs_ref, cys_ref, czs_ref, v_ref, w_ref,
             out_v_ref, out_w_ref):
        i = pl.program_id(0)
        for k in range(XB):
            dx = cxs_ref[i * XB + k, 0]
            dy = cys_ref[:, 0:1]
            dz = czs_ref[0:1, :]
            rho2 = dx * dx + dy * dy
            rho = jnp.sqrt(rho2)
            r_vox = jnp.sqrt(rho2 + dz * dz)

            t = dz / jnp.maximum(rho, 1e-20)
            s = t * t
            p = jnp.float32(tp._ATAN_COEFFS[-1])
            for c in reversed(tp._ATAN_COEFFS[:-1]):
                p = p * s + jnp.float32(c)
            el = p * t
            ringf = jnp.clip((half_v - el) / spacing, -1e4, 1e4)
            ring = jnp.round(ringf).astype(jnp.int32)
            ring_ok = (ring >= 0) & (ring < CH)
            ridx = jnp.clip(ring, 0, CH - 1)

            m = mini_ref[k]
            bxr = m[:, 0:128]
            byr = m[:, 128:256]
            bzr = m[:, 256:384]
            hole = bxr >= 1e8
            sq_xy = bxr * bxr + byr * byr
            abx = bxr + dx
            aby = byr + dy
            r_beam_row = jnp.sqrt(abx * abx + aby * aby + bzr * bzr)
            r_beam_row = jnp.where(hole, jnp.inf, r_beam_row)

            if mode == "noel":
                ringf = r_vox * 0.001
                ring = jnp.round(ringf).astype(jnp.int32)
                ring_ok = (ring >= 0) & (ring < CH)
                ridx = jnp.clip(ring, 0, CH - 1)
            if mode == "nogather":
                sq = sq_xy[:, 0:1] + jnp.zeros_like(r_vox)
                bz = bzr[:, 0:1] + jnp.zeros_like(r_vox)
                r_beam = r_beam_row[:, 0:1] + jnp.zeros_like(r_vox)
            else:
                sq = tp._gather_lanes(sq_xy, ridx)
                bz = tp._gather_lanes(bzr, ridx)
                r_beam = tp._gather_lanes(r_beam_row, ridx)

            if mode == "novalue":
                new_v = ring
                new_w = jnp.where(ring_ok, 64, 0)
            else:
                dzb = dz - bz
                value = jnp.sqrt(sq + dzb * dzb)
                value = jnp.minimum(value, float(TAU))
                behind = r_vox > r_beam
                value = jnp.where(behind, -value, value)
                delta_z = dzpd * r_vox / MATRIX_RESOLUTION
                v_res = r_vox * jnp.abs(ringf - ring.astype(jnp.float32)) \
                    * spacing
                vertical_ok = v_res <= jnp.maximum(delta_z, RES * 0.5)
                az = tp.atan2_poly(dy, dx + jnp.zeros_like(dy))
                colf = (az + math.pi) / (2 * math.pi) * COLS
                col_res = jnp.abs(colf - jnp.round(colf))
                h_res = r_vox * col_res * (2 * math.pi / COLS)
                horizontal_ok = h_res <= RES * 0.5
                interp = v_res > RES * 0.5
                w = jnp.where(
                    value < -weight_epsilon,
                    (WEIGHT_RESOLUTION * (float(TAU) + value))
                    // (TAU - weight_epsilon),
                    float(WEIGHT_RESOLUTION)).astype(jnp.int32)
                ok = (ring_ok & jnp.isfinite(r_beam) & vertical_ok
                      & horizontal_ok & (r_vox <= r_beam + TAU) & (w != 0))
                w = jnp.where(interp, -w, w)
                value_i = jnp.trunc(value).astype(jnp.int32)
                new_v = jnp.where(ok, value_i, 0)
                new_w = jnp.where(ok, w, 0)

            if mode == "nomerge":
                out_v_ref[k] = new_v.astype(jnp.int16)
                out_w_ref[k] = new_w.astype(jnp.int16)
            else:
                ev = v_ref[k].astype(jnp.int32)
                ew = w_ref[k].astype(jnp.int32)
                out_v, out_w = _merge_planes(ev, ew, new_v, new_w,
                                             32 * WEIGHT_RESOLUTION)
                out_v_ref[k] = out_v.astype(jnp.int16)
                out_w_ref[k] = out_w.astype(jnp.int16)

    grid = (X // XB, pl.cdiv(Y, YB))

    @jax.jit
    def run(mini, v, w):
        def body(_, carry):
            v, w, acc = carry
            ov, ow = pl.pallas_call(
                kern, grid=grid,
                in_specs=[
                    pl.BlockSpec((XB, YB, 384), lambda i, j: (i, j, 0),
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
            )(mini, cxs, cys, czs, v, w)
            return ov, ow, acc + ov[0, 0, 0].astype(jnp.int32)
        v, w, acc = jax.lax.fori_loop(0, K, body, (v, w, jnp.int32(0)))
        return acc

    return run


for mode in ("full", "nomerge", "nogather", "novalue", "noel"):
    r = make_variant(mode)
    print(f"{mode}: {timed(r, mini, v0, w0)*1e3:.2f} ms", flush=True)
