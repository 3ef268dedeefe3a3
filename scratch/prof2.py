import time, numpy as np, jax, jax.numpy as jnp
K = 8
V = 625*625*235
rng = np.random.default_rng(0)

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

# A: gather cost vs index count N from int16 table of 91M (184MB)
tab16 = jnp.zeros((V,), jnp.int16)
for N in (32768, 1<<20, 1<<23, 14*(1<<20)):
    idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    @jax.jit
    def g(ix):
        def body(_, ix):
            v = tab16[ix].astype(jnp.int32)
            return (ix + v) % V
        ix = jax.lax.fori_loop(0, K, body, ix)
        return jnp.sum(ix)
    print(f"gather {N/1e6:.2f}M idx from 184MB int16: {timed(g, idx)*1e3:.2f} ms/iter", flush=True)

# B: gather 32K from mid-size tables (cost vs table size)
for T in (1<<22, 1<<24, 1<<25):
    tab = jnp.zeros((T,), jnp.int32)
    idx = jnp.asarray(rng.integers(0, T, 32768).astype(np.int32))
    @jax.jit
    def g2(ix):
        def body(_, ix):
            return (ix + tab[ix]) % T
        ix = jax.lax.fori_loop(0, K, body, ix)
        return jnp.sum(ix)
    print(f"gather 32K from {T*4/1e6:.0f}MB int32: {timed(g2, idx)*1e3:.3f} ms/iter", flush=True)

# C: scatter marks: 884K indices into 1.45M bool
M = 1450000
sidx = jnp.asarray(rng.integers(0, M, 884736).astype(np.int32))
@jax.jit
def sc(ix):
    def body(_, c):
        ix2, acc = c
        marks = jnp.zeros((M,), jnp.int8).at[ix2].set(1)
        return ((ix2 + 1) % M, acc + marks[0].astype(jnp.int32))
    _, acc = jax.lax.fori_loop(0, K, body, (ix, jnp.int32(0)))
    return acc
print(f"scatter 884K marks into 1.45M: {timed(sc, sidx)*1e3:.2f} ms/iter", flush=True)

# D: cumsum over 1.45M int32
m = jnp.ones((M,), jnp.int32)
@jax.jit
def cs(m):
    def body(_, c):
        m2, acc = c
        s = jnp.cumsum(m2)
        return (m2, acc + s[-1])
    _, acc = jax.lax.fori_loop(0, K, body, (m, jnp.int32(0)))
    return acc
print(f"cumsum 1.45M: {timed(cs, m)*1e3:.2f} ms/iter", flush=True)

# E: take_along_axis lane gather at (32768,128)
tabl = jnp.zeros((32768, 128), jnp.int32)
lidx = jnp.asarray(rng.integers(0, 128, (32768, 128)).astype(np.int32))
@jax.jit
def tal(ix):
    def body(_, c):
        ix2, acc = c
        v = jnp.take_along_axis(tabl, ix2, axis=-1)
        return ((ix2 + v + 1) % 128, acc + jnp.sum(v[0]))
    _, acc = jax.lax.fori_loop(0, K, body, (ix, jnp.int32(0)))
    return acc
print(f"take_along_axis (32K,128): {timed(tal, lidx)*1e3:.2f} ms/iter", flush=True)
