import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax, jax.numpy as jnp
import tests.test_registration as T
from warpsense_tpu.ops.registration import (precompute_fields_packed,
    _decode_packed, packed_shifts, _SCP)
from warpsense_tpu.core.geometry import xi_to_transform, transform_point_fixed
from warpsense_tpu.core.consts import MATRIX_RESOLUTION, WEIGHT_RESOLUTION
from warpsense_tpu.map.local_map import in_bounds, ring_index, LocalMap
from warpsense_tpu.map.global_map import GlobalMap
from warpsense_tpu.ops.tsdf import tsdf_update, plan_raymarch
import tempfile, pathlib

tmp = pathlib.Path(tempfile.mkdtemp())
TAU, RES, MS = T.TAU, T.RESOLUTION, T.MAP_SIZE
gm = GlobalMap(tmp/"room.h5", TAU, 0); lm = LocalMap(MS, gm)
rng = np.random.default_rng(99)
pts_scene = T.room_points(2500, rng)
max_range = int(np.linalg.norm(pts_scene - T.SENSOR_MM, axis=1).max())+100
ms_, mis_ = plan_raymarch(TAU, RES, max_range)
up = jnp.asarray([0,0,MATRIX_RESOLUTION], jnp.int32)
state = tsdf_update(lm.device_state(), jnp.asarray(pts_scene, jnp.int32),
    jnp.ones((len(pts_scene),),bool), jnp.asarray(T.SENSOR_MM//RES, jnp.int32),
    up, size=lm.size, tau=TAU, max_weight=32*WEIGHT_RESOLUTION,
    resolution=RES, max_steps=ms_, max_isteps=mis_)

rng = np.random.default_rng(13)
pts = T.reg_cloud(pts_scene, rng, 3000)
pert = T.pose_from([0.1,0.5,1.0], np.deg2rad(1.0), [60,-50,40])
fields = precompute_fields_packed(state, tau=TAU)
vs, gs = packed_shifts(TAU)
plane = fields.plane.reshape(-1)
size = lm.size; pos, offset = state.pos, state.offset
points = jnp.asarray(pts, jnp.int32); mask = jnp.ones((len(pts),),bool)
szv = jnp.asarray(size)
D = jnp.asarray(np.concatenate([np.full(3,_SCP), np.full(3,1.0)]).astype(np.float32))

def stats(total):
    int_mat = jnp.trunc(total*MATRIX_RESOLUTION).astype(jnp.int32)
    p4 = transform_point_fixed(points, int_mat)
    buf = jnp.floor_divide(p4, RES)
    valid = mask & in_bounds(buf, pos, szv, 1)
    idx = ring_index(buf, pos, offset, size)
    ok, v, grad = _decode_packed(plane[idx], vs, gs)
    valid = valid & ok
    gradf = grad.astype(jnp.float32)/RES
    vf = v.astype(jnp.float32)
    cc = buf*RES + RES//2
    vf = vf + jnp.sum(gradf*(p4-cc).astype(jnp.float32), axis=-1)
    ctr = total[:3,3]
    p = p4.astype(jnp.float32)-ctr
    cross = jnp.cross(p, gradf)
    vfm = valid.astype(jnp.float32)
    Js = jnp.concatenate([cross*_SCP, gradf], axis=-1)*vfm[:,None]
    r = vf*vfm
    return Js.T@Js, Js.T@r, float(jnp.sum(jnp.abs(r))), float(jnp.sum(vfm))

acc = jnp.asarray(pert, jnp.float32); accH=None; accg=None; acc_err=np.inf
alpha=1e-3; trial=acc
for i in range(40):
    H,g,e,c = stats(trial)
    err = e/max(c,1.0) if c>0 else np.inf
    improved = err <= acc_err
    if improved: acc, accH, accg, acc_err = trial, H, g, err
    alpha = min(max(alpha/3.0 if improved else alpha*4.0, 1e-5), 1e5)
    dH = jnp.diag(jnp.diag(accH)) + 1e-12*jnp.eye(6)
    y = jnp.linalg.solve(accH + alpha*dH, -accg)
    xi = D*y
    trial = xi_to_transform(xi, acc[:3,3].astype(jnp.int32)) @ acc
    print(f"it {i}: err {err:8.3f} acc {acc_err:8.3f} {'A' if improved else 'r'} alpha {alpha:9.2e} |xi_r| {float(jnp.linalg.norm(xi[:3])):.2e} |xi_t| {float(jnp.linalg.norm(xi[3:])):8.4f}")
