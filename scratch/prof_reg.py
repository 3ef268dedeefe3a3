"""Where does the 0.73 ms/LM-iteration go?  gather vs stats math vs
solve/loop overhead."""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import room_cloud
from warpsense_tpu.core.consts import MATRIX_RESOLUTION
from warpsense_tpu.map.local_map import LocalMapState, in_bounds, ring_index
from warpsense_tpu.ops import registration as R

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
fields = jax.block_until_ready(R.precompute_fields_packed(state, tau=TAU))


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


ITERS = 20


def fixed_iter_loop(stats):
    """ITERS iterations of stats + solve, no convergence (fori)."""
    D = jnp.concatenate([jnp.full((3,), R._SCP, jnp.float32),
                         jnp.full((3,), 1.0, jnp.float32)])

    @jax.jit
    def run(pose0):
        def outer(_, pose0):
            def body(i, carry):
                total, acc = carry
                H, g, e, c = stats(total)
                dH = jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(6)
                y = jnp.linalg.solve(H + 1e-3 * dH, -g)
                xi = D * y * 1e-6
                from warpsense_tpu.core.geometry import xi_to_transform
                total = xi_to_transform(
                    xi, total[:3, 3].astype(jnp.int32)) @ total
                return total, acc + e
            total, acc = jax.lax.fori_loop(
                0, ITERS, body, (pose0, jnp.float32(0)))
            return total + acc * 1e-20
        pose = jax.lax.fori_loop(0, K, outer, pose0)
        return jnp.sum(pose)
    return run


full_stats = R.make_packed_stats(fields, state.pos, state.offset, pts, mask,
                                 size=SIZE, resolution=RES, tau=TAU,
                                 interp=True)
p0 = jnp.eye(4, dtype=jnp.float32)
t = timed(fixed_iter_loop(full_stats), p0)
print(f"full stats loop: {t*1e3:.2f} ms ({t/ITERS*1e6:.0f} us/iter)",
      flush=True)


def const_stats(total):
    H = jnp.eye(6, dtype=jnp.float32) * (1.0 + total[0, 0] * 1e-9)
    g = jnp.ones((6,), jnp.float32) * 1e-3
    return H, g, jnp.float32(1.0), jnp.float32(1.0)


t = timed(fixed_iter_loop(const_stats), p0)
print(f"const stats (loop+solve only): {t*1e3:.2f} ms "
      f"({t/ITERS*1e6:.0f} us/iter)", flush=True)


def nogather_stats(total):
    int_mat = jnp.trunc(total * MATRIX_RESOLUTION).astype(jnp.int32)
    from warpsense_tpu.core.geometry import transform_point_fixed
    p = transform_point_fixed(pts, int_mat)
    buf = jnp.floor_divide(p, RES)
    valid = mask & in_bounds(buf, state.pos, jnp.asarray(SIZE), 1)
    code = buf[:, 0] * 7 + buf[:, 1]        # fake decode, no table gather
    gradf = jnp.stack([code, code, code], axis=-1).astype(jnp.float32) * 1e-6
    vf32 = code.astype(jnp.float32) * 1e-3
    ctr = total[:3, 3]
    pf = p.astype(jnp.float32) - ctr
    cross = jnp.cross(pf, gradf)
    vfm = valid.astype(jnp.float32)
    Js = jnp.concatenate([cross * R._SCP, gradf], axis=-1) * vfm[:, None]
    r = vf32 * vfm
    return Js.T @ Js, Js.T @ r, jnp.sum(jnp.abs(r)), jnp.sum(vfm)


t = timed(fixed_iter_loop(nogather_stats), p0)
print(f"stats w/o table gather: {t*1e3:.2f} ms ({t/ITERS*1e6:.0f} us/iter)",
      flush=True)
