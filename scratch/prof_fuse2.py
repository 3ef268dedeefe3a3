import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from warpsense_tpu.map.local_map import LocalMapState
from bench import room_cloud
from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
from warpsense_tpu.kernels.tsdf_pallas import tsdf_update_projective_pallas as fuse
K = 8
TAU, RES = 600, 64
SIZE = (625, 625, 235)
pts = jnp.asarray(room_cloud(32766)); mask = jnp.ones((32766,), bool)
state = LocalMapState(
    value=jnp.full(SIZE, TAU, jnp.int16), weight=jnp.zeros(SIZE, jnp.int16),
    pos=jnp.zeros(3, jnp.int32), offset=jnp.asarray([s//2 for s in SIZE], jnp.int32))
kw = dict(size=SIZE, tau=TAU, max_weight=32*WEIGHT_RESOLUTION, resolution=RES,
          channels=128, columns=1024, vfov_deg=45.0)
def await_s(x): return float(np.asarray(x))
tiny = jnp.zeros((8,128), jnp.float32); triv = jax.jit(jnp.sum)
for _ in range(2): await_s(triv(tiny))
rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(5))
def timed(fn, *args, reps=3):
    await_s(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); await_s(fn(*args)); best = min(best, time.perf_counter()-t0)
    return max(best - rtt, 1e-9)/K
R = jnp.eye(3, dtype=jnp.float32); spos = jnp.zeros(3, jnp.int32)
for ident in (False, True):
    @jax.jit
    def lp(state):
        def body(_, st):
            return fuse(st, pts, mask, spos, R, identity_rot=ident, **kw)
        st = jax.lax.fori_loop(0, K, body, state)
        return jnp.sum(st.value[:2,:2,:2].astype(jnp.int32))
    print(f"fusion identity_rot={ident}: {timed(lp, state)*1e3:.2f} ms", flush=True)
