"""Break down featsense front-end cost (feat 26ms + odom 26ms) on chip."""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import organized_room_scan
from warpsense_tpu.frontends.featsense import features as F
from warpsense_tpu.frontends.featsense.features_reference import (
    FeatureParams, block_bounds)
from warpsense_tpu.frontends.featsense import odometry as O

K = 8
scan = jnp.asarray(organized_room_scan())
H, W = 128, 1024
params = FeatureParams()


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


def loop(fn_body):
    @jax.jit
    def run(scan):
        def body(_, carry):
            sc, acc = carry
            sc = sc + acc * 1e-12
            acc = acc + fn_body(sc)
            return sc, acc
        _, acc = jax.lax.fori_loop(0, K, body, (scan, jnp.float32(0)))
        return acc
    return run


# 1. curvature + occlusion only
def curv_occl(sc):
    curv, ranges = F.curvature_and_ranges(sc)
    picked = F.mark_occluded(ranges, params)
    return jnp.sum(jnp.where(jnp.isfinite(curv), curv, 0.0)) * 1e-9 \
        + picked.sum().astype(jnp.float32)


print(f"curv+occl: {timed(loop(curv_occl), scan)*1e3:.2f} ms", flush=True)


# 2. + argsorts
def with_sorts(sc):
    curv, ranges = F.curvature_and_ranges(sc)
    bounds = block_bounds(W)
    nb = len(bounds)
    BLK = max(ep - sp for sp, ep in bounds)
    sps = jnp.asarray([sp for sp, _ in bounds])
    pos = jnp.arange(BLK)
    cols_c = jnp.clip(sps[:, None] + pos[None, :], 0, W - 1)
    bcurv = curv[:, cols_c]
    lens = jnp.asarray([ep - sp for sp, ep in bounds])
    bvalid = (pos[None, :] < lens[:, None])[None] & jnp.isfinite(bcurv)
    o1 = jnp.argsort(jnp.where(bvalid, bcurv, jnp.inf), axis=-1, stable=True)
    o2 = jnp.argsort(jnp.where(bvalid, -bcurv, jnp.inf), axis=-1, stable=True)
    return (o1.sum() + o2.sum()).astype(jnp.float32)


print(f"curv+sorts: {timed(loop(with_sorts), scan)*1e3:.2f} ms", flush=True)


# 3. full extract_features
def full(sc):
    (e, em, _), (s, sm, _) = F.extract_features(sc)
    return em.sum().astype(jnp.float32) + sm.sum().astype(jnp.float32)


print(f"extract_features full: {timed(loop(full), scan)*1e3:.2f} ms", flush=True)

# ---------------- odometry breakdown
(e, em, _), (s, sm, _) = jax.block_until_ready(F.extract_features(scan))
center = jnp.zeros(3, jnp.float32)
emap = O.merge_map(O.empty_map(8192), e, em, center, crop=100.0, leaf=0.4)
smap = O.merge_map(O.empty_map(16384), s, sm, center, crop=100.0, leaf=0.4)
emap = jax.block_until_ready(emap)
q0 = jnp.asarray([0, 0, 0, 1], jnp.float32)
t0v = jnp.zeros(3, jnp.float32)


def loop2(fn_body, *inputs):
    @jax.jit
    def run(*ins):
        def body(_, acc):
            return acc + fn_body(*ins, acc)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return run, inputs


# knn alone (edge + surf associations)
def knn_body(acc):
    ew = e + acc * 1e-12
    eidx, ed2 = O.knn(ew, emap.points, emap.mask, 5)
    sw = s + acc * 1e-12
    sidx, sd2 = O.knn(sw, smap.points, smap.mask, 5)
    return jnp.sum(ed2[:, 4]) * 1e-6 + jnp.sum(sd2[:, 4]) * 1e-6


@jax.jit
def knn_loop():
    def body(_, acc):
        return acc + knn_body(acc)
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


print(f"knn (edge+surf): {timed(knn_loop)*1e3:.2f} ms", flush=True)


# fits alone
eidx, ed2 = O.knn(e, emap.points, emap.mask, 5)
sidx, sd2 = O.knn(s, smap.points, smap.mask, 5)
egat = jax.block_until_ready(emap.points[eidx])
sgat = jax.block_until_ready(smap.points[sidx])
e_ok = em & (ed2[:, 4] < 1.0)
s_ok = sm & (sd2[:, 4] < 1.0)


@jax.jit
def fits_loop(egat, sgat):
    def body(_, acc):
        pa, pb, ev = O.fit_lines(egat + acc * 1e-12, e_ok)
        nrm, d, sv = O.fit_planes(sgat + acc * 1e-12, s_ok)
        return acc + jnp.sum(pa) * 1e-6 + jnp.sum(nrm) * 1e-6
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


print(f"fits (lines+planes): {timed(fits_loop, egat, sgat)*1e3:.2f} ms",
      flush=True)


# one full associate_and_solve equivalent: odom_update with opt_count=1
@jax.jit
def odom1_loop(e, em, s, sm):
    def body(_, carry):
        q, t = carry
        q, t = O.odom_update(emap, smap, e, em, s, sm, q, t, jnp.int32(1))
        return q, t
    q, t = jax.lax.fori_loop(0, K, body, (q0, t0v))
    return jnp.sum(q) + jnp.sum(t)


print(f"odom_update(opt=1): {timed(odom1_loop, e, em, s, sm)*1e3:.2f} ms",
      flush=True)


@jax.jit
def odom2_loop(e, em, s, sm):
    def body(_, carry):
        q, t = carry
        q, t = O.odom_update(emap, smap, e, em, s, sm, q, t, jnp.int32(2))
        return q, t
    q, t = jax.lax.fori_loop(0, K, body, (q0, t0v))
    return jnp.sum(q) + jnp.sum(t)


print(f"odom_update(opt=2): {timed(odom2_loop, e, em, s, sm)*1e3:.2f} ms",
      flush=True)
