"""Time the packed-mini level kernel end-to-end at bench scale."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import room_cloud
from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.kernels.tsdf_pallas import tsdf_update_projective_pallas

K = 8
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
kw = dict(size=SIZE, tau=TAU, max_weight=32 * WEIGHT_RESOLUTION,
          resolution=RES, channels=128, columns=1024, vfov_deg=45.0,
          identity_rot=True)
origin = jnp.zeros(3, jnp.int32)
R = jnp.eye(3, dtype=jnp.float32)


def await_s(x):
    return float(np.asarray(x))


tiny = jnp.zeros((8, 128), jnp.float32)
triv = jax.jit(jnp.sum)
for _ in range(2):
    await_s(triv(tiny))
rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter() - t0)[1])(
    time.perf_counter()) for _ in range(5))
print(f"rtt {rtt*1e3:.1f} ms", flush=True)


@jax.jit
def tsdf_loop(state):
    def body(_, st):
        return tsdf_update_projective_pallas(st, pts, mask, origin, R, **kw)
    st = jax.lax.fori_loop(0, K, body, state)
    return jnp.sum(st.value[:2, :2, :2].astype(jnp.int32))


def timed(fn, *args, reps=3):
    await_s(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        await_s(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / K


print(f"fusion v2 full: {timed(tsdf_loop, state)*1e3:.2f} ms", flush=True)

# sanity: fused voxels > 0
st = tsdf_update_projective_pallas(state, pts, mask, origin, R, **kw)
print("fused voxels:", int(jnp.sum(st.weight != 0)))
