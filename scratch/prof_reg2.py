import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.ops.registration import (precompute_fields_packed,
    register_cloud_packed, precompute_fields, register_cloud_fields)
import sys
sys.path.insert(0, '.')
from bench import room_cloud

K = 8
TAU, RES = 600, 64
SIZE = (625, 625, 235)
N = 32766
pts = jnp.asarray(room_cloud(N)); mask = jnp.ones((N,), bool)
state = LocalMapState(
    value=jnp.full(SIZE, TAU, jnp.int16), weight=jnp.zeros(SIZE, jnp.int16),
    pos=jnp.zeros(3, jnp.int32), offset=jnp.asarray([s//2 for s in SIZE], jnp.int32))
# fuse one scan so fields are non-trivial
from warpsense_tpu.kernels.tsdf_pallas import tsdf_update_projective_pallas as fuse
from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
tsdf_kw = dict(size=SIZE, tau=TAU, max_weight=32*WEIGHT_RESOLUTION, resolution=RES,
               channels=128, columns=1024, vfov_deg=45.0)
state = fuse(state, pts, mask, jnp.zeros(3, jnp.int32), jnp.eye(3, dtype=jnp.float32), **tsdf_kw)
state = jax.block_until_ready(state)

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

# fields precompute packed (chained)
@jax.jit
def fp_loop(state):
    def body(_, acc):
        f = precompute_fields_packed(state, tau=TAU)
        return acc + f.plane.reshape(-1)[0]
    acc = jax.lax.fori_loop(0, K, body, jnp.int32(0))
    return acc
print(f"precompute_fields_packed: {timed(fp_loop, state)*1e3:.2f} ms", flush=True)

# old 3-plane precompute
@jax.jit
def fp3_loop(state):
    def body(_, acc):
        f = precompute_fields(state)
        return acc + f.vw.reshape(-1)[0]
    acc = jax.lax.fori_loop(0, K, body, jnp.int32(0))
    return acc
print(f"precompute_fields (3-plane): {timed(fp3_loop, state)*1e3:.2f} ms", flush=True)

pert = np.eye(4, dtype=np.float32); pert[:3,3] = [80,-60,40]; pert = jnp.asarray(pert)
reg_kw = dict(size=SIZE, resolution=RES, tau=TAU, max_iterations=200,
              it_weight_gradient=0.1, epsilon=0.03)

fields = jax.block_until_ready(precompute_fields_packed(state, tau=TAU))

# packed registration, chained (fresh perturbation each time)
@jax.jit
def reg_loop(fields, pos, offset):
    def body(_, carry):
        pose, it_acc = carry
        out, iters, err = register_cloud_packed(fields, pos, offset, pts, mask,
                                                pose @ pert, **reg_kw)
        return out, it_acc + iters
    (pose, it_acc) = jax.lax.fori_loop(0, K, body, (jnp.eye(4, dtype=jnp.float32), jnp.int32(0)))
    return jnp.sum(pose) + it_acc.astype(jnp.float32)

t = timed(reg_loop, fields, state.pos, state.offset)
# also read iteration count
@jax.jit
def one_reg(fields, pos, offset):
    out, iters, err = register_cloud_packed(fields, pos, offset, pts, mask, pert, **reg_kw)
    return iters, err
it, err = one_reg(fields, state.pos, state.offset)
print(f"register_cloud_packed: {t*1e3:.2f} ms/scan ({int(it)} iters, err {float(err):.2f})", flush=True)

# fixed-iteration variant to get per-iteration cost: max_iterations=20, eps tiny
reg_kw20 = dict(reg_kw, max_iterations=20, epsilon=0.0)
@jax.jit
def reg20_loop(fields, pos, offset):
    def body(_, carry):
        pose, it_acc = carry
        out, iters, err = register_cloud_packed(fields, pos, offset, pts, mask,
                                                pose @ pert, **reg_kw20)
        return out, it_acc + iters
    (pose, it_acc) = jax.lax.fori_loop(0, K, body, (jnp.eye(4, dtype=jnp.float32), jnp.int32(0)))
    return jnp.sum(pose) + it_acc.astype(jnp.float32)
t20 = timed(reg20_loop, fields, state.pos, state.offset)
it20, _ = jax.jit(lambda f,p,o: register_cloud_packed(f,p,o,pts,mask,pert,**reg_kw20)[1:])(fields, state.pos, state.offset)
print(f"packed reg capped-20: {t20*1e3:.2f} ms/scan ({int(it20)} iters) -> {t20*1e3/max(int(it20),1):.3f} ms/iter", flush=True)

# old path for comparison
reg_kw_old = dict(size=SIZE, resolution=RES, max_iterations=200,
                  it_weight_gradient=0.1, epsilon=0.03, mode="fast")
f3 = jax.block_until_ready(precompute_fields(state))
@jax.jit
def rego_loop(pos, offset):
    def body(_, pose):
        return register_cloud_fields(f3, pos, offset, pts, mask, pose @ pert, **reg_kw_old)
    pose = jax.lax.fori_loop(0, K, body, jnp.eye(4, dtype=jnp.float32))
    return jnp.sum(pose)
print(f"old register_cloud_fields: {timed(rego_loop, state.pos, state.offset)*1e3:.2f} ms/scan", flush=True)
