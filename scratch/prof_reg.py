import time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())

K = 12
V = 625*625*235   # ~91.8M
N = 32768

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
table = jnp.zeros((V,), jnp.int32)
table3 = jnp.zeros((V, 3), jnp.int32)
small = jnp.zeros((1<<20,), jnp.int32)
idx_small = jnp.asarray(rng.integers(0, 1<<20, N).astype(np.int32))

def await_s(x): return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))

tiny = jnp.zeros((8,128), jnp.float32)
triv = jax.jit(jnp.sum)
for _ in range(2): await_s(triv(tiny))
rtt = min((lambda t0: (await_s(triv(tiny)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(5))
print(f"rtt {rtt*1e3:.1f} ms")

def timed(fn, *args, reps=3):
    await_s(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); await_s(fn(*args)); best = min(best, time.perf_counter()-t0)
    return max(best - rtt, 1e-9)/K

# 1. plain gather, chained
@jax.jit
def g1(idx):
    def body(_, ix):
        v = table[ix]
        return (ix + v) % V
    ix = jax.lax.fori_loop(0, K, body, idx)
    return jnp.sum(ix)
print(f"gather 32K from 91M (1 plane):  {timed(g1, idx)*1e3:.2f} ms/iter")

# 2. row gather (V,3)
@jax.jit
def g3(idx):
    def body(_, ix):
        v = table3[ix]          # (N,3)
        return (ix + v[:,0]) % V
    ix = jax.lax.fori_loop(0, K, body, idx)
    return jnp.sum(ix)
print(f"row gather 32K from (91M,3):    {timed(g3, idx)*1e3:.2f} ms/iter")

# 3. three separate plane gathers
@jax.jit
def g3sep(idx):
    def body(_, ix):
        a = table[ix]; b = table[(ix+1)%V]; c = table[(ix+2)%V]
        return (ix + a + b + c) % V
    ix = jax.lax.fori_loop(0, K, body, idx)
    return jnp.sum(ix)
print(f"3x gather 32K from 91M:         {timed(g3sep, idx)*1e3:.2f} ms/iter")

# 4. small table gather
@jax.jit
def gs(idx):
    def body(_, ix):
        v = small[ix]
        return (ix + v) % (1<<20)
    ix = jax.lax.fori_loop(0, K, body, idx)
    return jnp.sum(ix)
print(f"gather 32K from 1M:             {timed(gs, idx_small)*1e3:.2f} ms/iter")

# 5. while_loop overhead: trivial body
@jax.jit
def wl(x):
    def cond(c): return c[0] < 200
    def body(c): return (c[0]+1, c[1]*1.000001)
    _, v = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    return v
t0=time.perf_counter(); await_s(wl(jnp.float32(1.0))); c=time.perf_counter()-t0
best=1e9
for _ in range(3):
    t0=time.perf_counter(); await_s(wl(jnp.float32(1.0))); best=min(best,time.perf_counter()-t0)
print(f"200-iter trivial while_loop:    {(best-rtt)*1e3:.2f} ms total")
