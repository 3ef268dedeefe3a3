import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
exec(open("scratch/dbg_scan1.py").read().split("# objective at candidate poses")[0])
# ---- numpy objective analysis
true_pose = rel.copy(); true_pose[:3,3] *= 1000
A = np.asarray(fields.plane_a).reshape(-1)
B = np.asarray(fields.plane_b).reshape(-1)
P = np.asarray(pts); M = np.asarray(mask)
pos = np.asarray(app.state.pos); off = np.asarray(app.state.offset)
size = np.asarray(app.local_map.size)
res = m.resolution
def unlo(x): return (x.astype(np.int32) << 16) >> 16
def unhi(x): return x.astype(np.int32) >> 16
def obj(T, use_interp=True, gradreq=False):
    T = np.asarray(T, np.float64)
    im = np.trunc(T*32768).astype(np.int64)
    p4 = ((P @ im[:3,:3].T + im[:3,3]) / 32768).astype(np.int64)  # approx trunc
    buf = np.floor_divide(p4, res)
    d = np.abs(buf - pos); inb = np.all(d <= size//2 - 1, axis=-1)
    arr = (buf - pos + off) % size
    idx = arr[:,0]*(size[1]*size[2]) + arr[:,1]*size[2] + arr[:,2]
    a = A[idx]; b = B[idx]
    v = unlo(a); ok = v != -32768
    g = np.stack([unhi(a), unlo(b), unhi(b)], -1).astype(np.float64)/res
    if gradreq: ok = ok & (np.linalg.norm(g,axis=-1) > 0.1)
    cc = buf*res + res//2
    r = v.astype(np.float64)
    if use_interp: r = r + np.sum(g*(p4-cc), -1)
    vm = M & inb & ok
    return (round(float(np.mean(np.abs(r[vm]))),1), int(vm.sum()),
            round(float(np.median(np.abs(r[vm]))),1))
for name, T in (("identity", np.eye(4)), ("pre", pre), ("true", true_pose.astype(np.float64))):
    print(name, " v-only:", obj(T, False), " interp:", obj(T, True),
          " interp+gradreq:", obj(T, True, True), flush=True)
# where do valid points sit? distance distribution of v at true pose
T = true_pose
im = np.trunc(T*32768).astype(np.int64)
p4 = ((P @ im[:3,:3].T + im[:3,3]) / 32768).astype(np.int64)
buf = np.floor_divide(p4, res)
arr = (buf - pos + off) % size
idx = arr[:,0]*(size[1]*size[2]) + arr[:,1]*size[2] + arr[:,2]
v = unlo(A[idx]); ok = (v != -32768) & M
print("valid v histogram at true pose:", np.histogram(v[ok], bins=[-1000,-500,-200,-100,-50,0,50,100,200,500,1000])[0])
g = np.stack([unhi(A[idx]), unlo(B[idx]), unhi(B[idx])], -1)
print("grad norms (valid):", np.percentile(np.linalg.norm(g[ok],axis=-1), [10,50,90]).round(1), " (res=128 expected ~128)")
