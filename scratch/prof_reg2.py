"""Where do the remaining ~2 ms of a frozen registration go?"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import room_cloud
from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.ops import registration as R

K = 48
TAU, RES = 600, 64
SIZE = (625, 625, 235)
N = 32766

pts = jnp.asarray(room_cloud(N))
mask = jnp.ones((N,), bool)
state = LocalMapState(
    value=jnp.full(SIZE, TAU, jnp.int16),
    weight=jnp.zeros(SIZE, jnp.int16),
    pos=jnp.zeros(3, jnp.int32),
    offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32))
fields = jax.block_until_ready(R.precompute_fields_packed(state, tau=TAU))
pert = np.eye(4, dtype=np.float32)
pert[:3, 3] = [80, -60, 40]
pert = jnp.asarray(pert)


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


def reg_loop(**kw):
    @jax.jit
    def run(fields, pos, offset):
        def body(_, carry):
            pose, it_acc = carry
            args = dict(size=SIZE, resolution=RES, tau=TAU,
                        max_iterations=50, it_weight_gradient=0.1,
                        epsilon=0.03)
            args.update(kw)
            out, iters, err = R.register_cloud_packed(
                fields, pos, offset, pts, mask, pose @ pert, **args)
            return out, it_acc + iters
        pose, it_acc = jax.lax.fori_loop(
            0, K, body, (jnp.eye(4, dtype=jnp.float32), jnp.int32(0)))
        return jnp.sum(pose) + it_acc.astype(jnp.float32)
    return run


for kw in (dict(gather_freeze=False, max_iterations=0),
           dict(gather_freeze=True,),):
    t = timed(reg_loop(**kw), fields, state.pos, state.offset)
    print(f"reg {kw}: {t*1e3:.2f} ms", flush=True)

# pure gathers: k chained gathers of 32K from the plane
plane = fields.plane.reshape(-1)
idx0 = jnp.asarray(np.random.default_rng(0).integers(
    0, plane.shape[0], N).astype(np.int32))


def gloop(n):
    @jax.jit
    def run(idx):
        def body(_, carry):
            ix, acc = carry
            for _ in range(n):
                v = plane[ix]
                ix = (ix + (v & 1)) % plane.shape[0]
            return ix, acc + v[0]
        ix, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.int32(0)))
        return acc
    return run


for n in (1, 3):
    print(f"{n} chained 32K gathers: {timed(gloop(n), idx0)*1e3:.2f} ms",
          flush=True)
