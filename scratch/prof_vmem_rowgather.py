"""Can the kernel row-gather the beam table from VMEM directly?
Cost probe: per block, take 128 rows of (1024, 384) f32 by dynamic index."""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8
X, Y = 624, 640
COLS, LANES = 1024, 384
YB = 128

t3 = jnp.asarray(np.random.default_rng(0).random(
    (COLS, LANES)).astype(np.float32))
colc = jnp.asarray(np.random.default_rng(1).integers(
    0, COLS, (X, Y)).astype(np.int32))


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


def kern(t3_ref, colc_ref, out_ref):
    c = colc_ref[...].reshape(-1)        # (8*128,) int32
    idx = jnp.broadcast_to(c[:, None], (1024, 384))
    rows = jnp.take_along_axis(t3_ref[...], idx, axis=0)  # sublane gather
    out_ref[...] = jnp.sum(rows, axis=-1).reshape(8, 128)


grid = (X // 8, Y // 128)


@jax.jit
def run(t3, colc):
    def body(_, acc):
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # whole t3
                pl.BlockSpec((8, 128), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((X, Y), jnp.float32),
        )(t3, colc + (acc.astype(jnp.int32) & 0))
        return acc + out[0, 0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


print(f"in-kernel VMEM row gather (390K rows of 384 lanes): "
      f"{timed(run, t3, colc)*1e3:.2f} ms", flush=True)
