import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.ops.registration import precompute_fields_packed
from warpsense_tpu.kernels.fields_pallas import (
    precompute_fields_packed_pallas, precompute_fields_packed2_pallas)
K = 8
TAU = 600
SIZE = (625, 625, 235)
state = LocalMapState(
    value=jnp.full(SIZE, TAU, jnp.int16), weight=jnp.ones(SIZE, jnp.int16),
    pos=jnp.zeros(3, jnp.int32), offset=jnp.asarray([s//2 for s in SIZE], jnp.int32))
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

def mk(fn, with_fields):
    @jax.jit
    def lp(state):
        def body(_, carry):
            val, acc = carry
            val = val ^ (acc & 1).astype(jnp.int16)       # true dependence
            st = LocalMapState(val, state.weight, state.pos, state.offset)
            if with_fields:
                f = fn(st)
                leaf = jax.tree_util.tree_leaves(f)[0]
                acc = acc + leaf.reshape(-1)[0]
            else:
                acc = acc + val[0, 0, 0].astype(jnp.int32)
            return val, acc
        _, acc = jax.lax.fori_loop(0, K, body, (state.value, jnp.int32(0)))
        return acc
    return lp

base = timed(mk(None, False), state)
t1 = timed(mk(lambda st: precompute_fields_packed_pallas(st, tau=TAU), True), state)
t2 = timed(mk(precompute_fields_packed2_pallas, True), state)
t3 = timed(mk(lambda st: precompute_fields_packed(st, tau=TAU), True), state)
print(f"xor baseline: {base*1e3:.2f} ms", flush=True)
print(f"fields packed pallas: {(t1-base)*1e3:.2f} ms", flush=True)
print(f"fields packed2 pallas: {(t2-base)*1e3:.2f} ms", flush=True)
print(f"fields packed XLA: {(t3-base)*1e3:.2f} ms", flush=True)
