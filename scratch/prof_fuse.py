import sys; sys.path.insert(0, "/root/repo")
import time, functools, math, numpy as np, jax, jax.numpy as jnp
from warpsense_tpu.map.local_map import LocalMapState
from bench import room_cloud
from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
import warpsense_tpu.kernels.tsdf_pallas as KP
from warpsense_tpu.ops.tsdf_projective import build_beam_table, _global_coords

K = 8
TAU, RES = 600, 64
SIZE = (625, 625, 235)
N = 32766
pts = jnp.asarray(room_cloud(N)); mask = jnp.ones((N,), bool)
state = LocalMapState(
    value=jnp.full(SIZE, TAU, jnp.int16), weight=jnp.zeros(SIZE, jnp.int16),
    pos=jnp.zeros(3, jnp.int32), offset=jnp.asarray([s//2 for s in SIZE], jnp.int32))
kw = dict(size=SIZE, tau=TAU, max_weight=32*WEIGHT_RESOLUTION, resolution=RES,
          channels=128, columns=1024, vfov_deg=45.0)

def await_s(x): return float(np.asarray(x))
tiny = jnp.zeros((8,128), jnp.float32); triv = jax.jit(jnp.sum)
for _ in range(2): await_s(triv(tiny))
rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(5))
print(f"rtt {rtt*1e3:.1f} ms", flush=True)

def timed(fn, *args, reps=3):
    await_s(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); await_s(fn(*args)); best = min(best, time.perf_counter()-t0)
    return max(best - rtt, 1e-9)/K

R = jnp.eye(3, dtype=jnp.float32)
spos = jnp.zeros(3, jnp.int32)

# full fusion
@jax.jit
def full_loop(state):
    def body(_, st):
        return KP.tsdf_update_projective_pallas(st, pts, mask, spos, R, **kw)
    st = jax.lax.fori_loop(0, K, body, state)
    return jnp.sum(st.value[:2,:2,:2].astype(jnp.int32))
print(f"full pallas fusion: {timed(full_loop, state)*1e3:.2f} ms", flush=True)

# beam table + mini build only
X, Y, Z = SIZE
@jax.jit
def mini_loop(state):
    def body(i, acc):
        scanner_mm = spos * RES + RES//2
        rng_tab, endpoint = build_beam_table(pts, mask, scanner_mm, R,
            channels=128, columns=1024, vfov_deg=45.0)
        rel = endpoint - scanner_mm.astype(jnp.float32)
        rel = jnp.where(jnp.isfinite(rng_tab)[:, None], rel, jnp.inf)
        tab = rel.reshape(1024, 128, 3)
        t3 = jnp.concatenate([tab[:,:,0], tab[:,:,1], tab[:,:,2]], axis=-1)
        gx, gy, gz = _global_coords(state.pos, state.offset, SIZE)
        cx = (gx*RES + RES//2 - scanner_mm[0]).astype(jnp.float32)
        cy = (gy*RES + RES//2 - scanner_mm[1]).astype(jnp.float32)
        az_c = KP.atan2_poly(cy[None,:]*0 + cy[None,:], cx[:,None] + 0*cy[None,:])
        col_c = jnp.mod(jnp.round((az_c + math.pi)/(2*math.pi)*1024).astype(jnp.int32), 1024)
        mini = t3[col_c]
        return acc + mini[0,0,0] + (i==0)*0.0
    acc = jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return acc
print(f"beam table + mini row gather: {timed(mini_loop, state)*1e3:.2f} ms", flush=True)
