"""Traffic-floor variants: block shapes + int16 mini packing."""
import sys
import time
import functools
import math

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8
X, Y, Z = 625, 625, 235
_ZB = 256


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


v0 = jnp.zeros((X, Y, Z), jnp.int16)
w0 = jnp.zeros((X, Y, Z), jnp.int16)
mini_f32 = jnp.zeros((X, Y, 385), jnp.float32)
mini_i16 = jnp.zeros((X, Y, 512), jnp.int16)
mini_i16b = jnp.zeros((X, Y, 384), jnp.int16)


def copy_variant(mini, yb, xb=1, name=""):
    MLANES = mini.shape[-1]

    def kern(m_ref, v_ref, w_ref, ov_ref, ow_ref):
        # force the mini block read without i16 scalar extracts
        k = (jnp.sum(m_ref[...].astype(jnp.float32)) * 0.0).astype(jnp.int16)
        ov_ref[...] = v_ref[...] + k
        ow_ref[...] = w_ref[...]

    grid = (pl.cdiv(X, xb), pl.cdiv(Y, yb))

    @jax.jit
    def run(mini, v, w):
        def body(_, carry):
            v, w, acc = carry
            ov, ow = pl.pallas_call(
                kern, grid=grid,
                in_specs=[
                    pl.BlockSpec((xb, yb, MLANES), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((xb, yb, _ZB), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
                    jax.ShapeDtypeStruct((X, Y, Z), jnp.int16),
                ],
            )(mini, v, w)
            return ov, ow, acc + ov[0, 0, 0].astype(jnp.int32)
        v, w, acc = jax.lax.fori_loop(0, K, body, (v, w, jnp.int32(0)))
        return acc

    print(f"copy {name} yb={yb} xb={xb}: "
          f"{timed(run, mini, v0, w0)*1e3:.2f} ms", flush=True)


copy_variant(mini_f32, 64, name="mini f32x385")
copy_variant(mini_f32, 128, name="mini f32x385")
copy_variant(mini_i16, 64, name="mini i16x512")
copy_variant(mini_i16b, 64, name="mini i16x384")
copy_variant(mini_i16b, 128, name="mini i16x384")
copy_variant(mini_i16b, 128, xb=5, name="mini i16x384")

# no mini at all: absolute v/w floor
zero1 = jnp.zeros((X, Y, 1), jnp.float32)
copy_variant(zero1, 64, name="no mini")
copy_variant(zero1, 128, name="no mini")
