import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from warpsense_tpu.core.config import Params
from warpsense_tpu.io.synthetic import (BoxWorld, circular_trajectory,
                                        imu_stream_for, render_scan)
from warpsense_tpu.pipeline.warpsense import WarpsenseApp
from warpsense_tpu.utils.imu import ImuSample
from warpsense_tpu.ops.registration import register_cloud_packed, precompute_fields_packed2
import tempfile, pathlib
N, DT = 3, 0.05
tmp = pathlib.Path(tempfile.mkdtemp())
params = Params.from_dict({
    "lidar": {"channels": 32, "hresolution": 256},
    "map": {"max_distance": 0.96, "update_distance": 0.3,
            "resolution": 128, "size": {"x": 12.0, "y": 12.0, "z": 6.0},
            "shift": 3.0, "max_weight": 10},
    "registration": {"max_iterations": 50, "epsilon": 0.03,
                     "it_weight_gradient": 0.1, "mode": "fast"},
})
world = BoxWorld.default()
gt = circular_trajectory(120, radius=1.2, z=0.3)[:N]
rng = np.random.default_rng(0)
app = WarpsenseApp(params, map_path=tmp/"s.h5", capacity=8192, max_range_mm=22000, exact_fields=True)
imu = imu_stream_for(gt, DT)

# scan 0
scan = render_scan(world, gt[0], channels=32, columns=256, max_range=22.0, noise_std=0.01, rng=rng)
app.cloud_callback(scan, 0.0)

# scan 1: intercept
for s in imu:
    if 0 < s.stamp <= DT: app.imu_callback(ImuSample(s.stamp, s.angular_velocity))
scan1 = render_scan(world, gt[1], channels=32, columns=256, max_range=22.0, noise_std=0.01, rng=rng)

from warpsense_tpu.ops.preprocess import preprocess
m = params.map
flat = np.ascontiguousarray(scan1.reshape(-1, 3))
pad = np.zeros((8192 - len(flat), 3), np.float32) if len(flat) < 8192 else None
cloud = jnp.asarray(np.concatenate([flat, pad]) if pad is not None else flat[:8192], jnp.float32)
valid = jnp.asarray(np.concatenate([np.any(flat != 0.0, axis=1), np.zeros(len(pad), bool)]) if pad is not None else np.any(flat[:8192]!=0,axis=1))
pts, mask = preprocess(cloud, valid, jnp.asarray(app.pose), resolution=m.resolution, capacity=8192)
print("n valid pts:", int(mask.sum()))

pre = app.imu_acc.acc_transform(0.05).astype(np.float32)
dR = pre[:3, :3]
pre[:3, 3] += (np.eye(3, dtype=np.float32) - dR) @ app.pose[:3, 3]
print("pretransform t:", pre[:3,3], "yaw deg:", np.degrees(np.arctan2(pre[1,0],pre[0,0])))

# true delta: gt[1] relative in map frame (map frame = gt[0] frame, mm)
T0 = gt[0].copy(); T1 = gt[1].copy()
rel = np.linalg.inv(T0) @ T1   # sensor1 pose in map frame (m)
print("true new pose in map (mm):", rel[:3,3]*1000)

fields = precompute_fields_packed2(app.state)
kw = dict(size=app.local_map.size, resolution=m.resolution, tau=m.tau,
          max_iterations=50, it_weight_gradient=0.1, epsilon=0.03)
out, iters, err = register_cloud_packed(fields, app.state.pos, app.state.offset,
    pts, mask, jnp.asarray(pre), **kw)
out = np.asarray(out)
print(f"registration: iters {int(iters)} err {float(err):.2f} t {out[:3,3]} yaw {np.degrees(np.arctan2(out[1,0],out[0,0])):.2f}")

# objective at candidate poses: use register with max_iterations=1? compute err via stats at given pose:
from warpsense_tpu.ops.registration import _unpack_lo, _unpack_hi
from warpsense_tpu.core.geometry import transform_point_fixed
from warpsense_tpu.core.consts import MATRIX_RESOLUTION
from warpsense_tpu.map.local_map import in_bounds, ring_index
def obj(T):
    T = jnp.asarray(T, jnp.float32)
    im = jnp.trunc(T*MATRIX_RESOLUTION).astype(jnp.int32)
    p4 = transform_point_fixed(pts, im)
    buf = jnp.floor_divide(p4, m.resolution)
    v_ok = mask & in_bounds(buf, app.state.pos, jnp.asarray(app.local_map.size), 1)
    idx = ring_index(buf, app.state.pos, app.state.offset, app.local_map.size)
    a = fields.plane_a.reshape(-1)[idx]; b = fields.plane_b.reshape(-1)[idx]
    v = _unpack_lo(a); ok = v != -32768
    g = jnp.stack([_unpack_hi(a), _unpack_lo(b), _unpack_hi(b)], -1).astype(jnp.float32)/m.resolution
    cc = buf*m.resolution + m.resolution//2
    r = v.astype(jnp.float32) + jnp.sum(g*(p4-cc).astype(jnp.float32), -1)
    vm = (v_ok & ok).astype(jnp.float32)
    return float(jnp.sum(jnp.abs(r*vm))/jnp.maximum(jnp.sum(vm),1)), float(jnp.sum(vm))
true_pose = rel.copy(); true_pose[:3,3] *= 1000
print("obj at identity:", obj(np.eye(4)))
print("obj at pretransform:", obj(pre))
print("obj at TRUE pose:", obj(true_pose.astype(np.float32)))
print("obj at returned:", obj(out))

def obj2(T, use_interp, require_grad):
    T = jnp.asarray(T, jnp.float32)
    im = jnp.trunc(T*MATRIX_RESOLUTION).astype(jnp.int32)
    p4 = transform_point_fixed(pts, im)
    buf = jnp.floor_divide(p4, m.resolution)
    v_ok = mask & in_bounds(buf, app.state.pos, jnp.asarray(app.local_map.size), 1)
    idx = ring_index(buf, app.state.pos, app.state.offset, app.local_map.size)
    a = fields.plane_a.reshape(-1)[idx]; b = fields.plane_b.reshape(-1)[idx]
    v = _unpack_lo(a); ok = v != -32768
    g = jnp.stack([_unpack_hi(a), _unpack_lo(b), _unpack_hi(b)], -1).astype(jnp.float32)/m.resolution
    gnorm = jnp.linalg.norm(g, axis=-1)
    if require_grad:
        ok = ok & (gnorm > 0.1)
    cc = buf*m.resolution + m.resolution//2
    r = v.astype(jnp.float32)
    if use_interp:
        r = r + jnp.sum(g*(p4-cc).astype(jnp.float32), -1)
    vm = (v_ok & ok).astype(jnp.float32)
    return (float(jnp.sum(jnp.abs(r*vm))/jnp.maximum(jnp.sum(vm),1)), int(jnp.sum(vm)),
            float(jnp.median(jnp.where(vm>0, jnp.abs(r), jnp.nan))))
for name, T in (("identity", np.eye(4)), ("pre", pre), ("true", true_pose.astype(np.float32))):
    print(name, "v-only:", obj2(T, False, False), "interp:", obj2(T, True, False),
          "interp+gradreq:", obj2(T, True, True))
