"""Block-shape sweep for the round-5 banked level kernel.

The (5,128) choice was measured on the PRE-banked kernel (r4); the
in-kernel expansion changed the per-block cost model (bank gathers scale
with the columns a block subtends).  Re-sweep yb on the production path.

Run one yb per process: python scratch/r5_yb_sweep.py <yb>
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from warpsense_tpu.kernels import tsdf_pallas
YB = int(sys.argv[1])
tsdf_pallas._YB2 = YB          # before any trace

from bench import room_cloud, FULL
from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
from warpsense_tpu.map.local_map import LocalMapState

SIZE = FULL["size"]
TAU, RES = FULL["tau"], FULL["res"]
MAXW = 32 * WEIGHT_RESOLUTION
K = 8

pts = jnp.asarray(room_cloud(32766))
mask = jnp.ones((pts.shape[0],), bool)
origin = jnp.zeros(3, jnp.int32)
eye = jnp.eye(3, dtype=jnp.float32)


def fresh():
    return LocalMapState(
        value=jnp.full(SIZE, TAU, jnp.int16),
        weight=jnp.zeros(SIZE, jnp.int16),
        pos=jnp.zeros(3, jnp.int32),
        offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32))


def fuse(st):
    return tsdf_pallas.tsdf_update_projective_pallas(
        st, pts, mask, origin, eye, size=SIZE, tau=TAU, max_weight=MAXW,
        resolution=RES, channels=FULL["channels"], columns=FULL["columns"],
        vfov_deg=FULL["vfov_deg"], identity_rot=True)


@jax.jit
def loop(st):
    st = jax.lax.fori_loop(0, K, lambda _, s: fuse(s), st)
    return jnp.sum(st.value[:2, :2, :2].astype(jnp.int32))


def await_s(x):
    return float(np.asarray(x))


tiny = jnp.zeros((8, 128), jnp.float32)
triv = jax.jit(jnp.sum)
for _ in range(2):
    await_s(triv(tiny))
rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter() - t0)[1])(
    time.perf_counter()) for _ in range(5))

await_s(loop(fresh()))
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    await_s(loop(fresh()))
    best = min(best, time.perf_counter() - t0)
print(f"yb={YB}: {(best - rtt) / K * 1e3:.2f} ms/fusion (rtt {rtt*1e3:.1f})",
      flush=True)

# parity vs the XLA twin at this block shape (cheap single fusion)
from warpsense_tpu.ops.tsdf_projective import tsdf_update_projective
ref = tsdf_update_projective(
    fresh(), pts, mask, origin, eye, size=SIZE, tau=TAU, max_weight=MAXW,
    resolution=RES, channels=FULL["channels"], columns=FULL["columns"],
    vfov_deg=FULL["vfov_deg"])
got = fuse(fresh())
mv = int(jnp.sum(got.value != ref.value))
mw = int(jnp.sum(got.weight != ref.weight))
print(f"yb={YB}: parity mismatches value={mv} weight={mw}", flush=True)
