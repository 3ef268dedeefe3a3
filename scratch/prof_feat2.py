"""Quick: extract_features + odom timing only."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import organized_room_scan
from warpsense_tpu.frontends.featsense import features as F
from warpsense_tpu.frontends.featsense import odometry as O

K = 8
scan = jnp.asarray(organized_room_scan())


def await_s(x):
    return float(np.asarray(x))


tiny = jnp.zeros((8, 128), jnp.float32)
triv = jax.jit(jnp.sum)
for _ in range(2):
    await_s(triv(tiny))
rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter() - t0)[1])(
    time.perf_counter()) for _ in range(5))


def timed(fn, *args, reps=5):
    await_s(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        await_s(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / K


@jax.jit
def feat_loop(scan):
    def body(_, carry):
        sc, acc = carry
        sc = sc + acc * 1e-12
        (e, em, _), (s, sm, _) = F.extract_features(sc)
        return sc, acc + em.sum().astype(jnp.float32)
    _, acc = jax.lax.fori_loop(0, K, body, (scan, jnp.float32(0)))
    return acc


print(f"extract_features: {timed(feat_loop, scan)*1e3:.2f} ms", flush=True)

(e, em, _), (s, sm, _) = jax.block_until_ready(F.extract_features(scan))
center = jnp.zeros(3, jnp.float32)
emap = O.merge_map(O.empty_map(8192), e, em, center, crop=100.0, leaf=0.4)
smap = O.merge_map(O.empty_map(16384), s, sm, center, crop=100.0, leaf=0.4)
emap = jax.block_until_ready(emap)
q0 = jnp.asarray([0, 0, 0, 1], jnp.float32)
t0v = jnp.zeros(3, jnp.float32)


@jax.jit
def odom_loop(e, em, s, sm):
    def body(_, carry):
        q, t = carry
        q, t = O.odom_update(emap, smap, e, em, s, sm, q, t, jnp.int32(2))
        return q, t
    q, t = jax.lax.fori_loop(0, K, body, (q0, t0v))
    return jnp.sum(q) + jnp.sum(t)


print(f"odom_update(opt=2): {timed(odom_loop, e, em, s, sm)*1e3:.2f} ms",
      flush=True)
