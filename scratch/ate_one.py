import sys, os, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from warpsense_tpu.core.config import Params
from warpsense_tpu.io.synthetic import (BoxWorld, circular_trajectory,
                                        imu_stream_for, render_scan)
from warpsense_tpu.pipeline.warpsense import WarpsenseApp
from warpsense_tpu.utils.imu import ImuSample
import tempfile, pathlib
N, DT = 60, 0.05
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
gt = circular_trajectory(2*N, radius=1.2, z=0.3)[:N]
rng = np.random.default_rng(0)
app = WarpsenseApp(params, map_path=tmp/"s.h5", capacity=8192, max_range_mm=22000, exact_fields=True)
imu = imu_stream_for(gt, DT)
est = []
t0 = time.time()
for i in range(N):
    stamp = i*DT
    for s in imu:
        if (i-1)*DT < s.stamp <= stamp:
            app.imu_callback(ImuSample(s.stamp, s.angular_velocity))
    scan = render_scan(world, gt[i], channels=32, columns=256,
                       max_range=22.0, noise_std=0.01, rng=rng)
    est.append(app.cloud_callback(scan, stamp).copy())
    if i % 10 == 0:
        print(f"scan {i} t={time.time()-t0:.1f}s iters={app.last_reg_iters}", flush=True)
app.terminate()
est = np.stack(est); est_m = est.copy(); est_m[:, :3, 3] /= 1000.0
w = np.einsum("ij,njk->nik", gt[0], est_m)
err = w[:, :3, 3] - gt[:, :3, 3]
n = np.linalg.norm(err, axis=1)
yaws = [np.degrees(np.arctan2((w[i][:3,:3]@gt[i][:3,:3].T)[1,0], (w[i][:3,:3]@gt[i][:3,:3].T)[0,0])) for i in range(N)]
print(f"postfuse LMexact: ATE {np.sqrt(np.mean(n**2)):.3f}; yaw@15,30,45,59 = "
      + " ".join(f"{yaws[i]:+.2f}" for i in (15,30,45,59)), flush=True)

print("err components (x,y,z) m @ scans 5,15,25,35,45,55:")
for i in (5,15,25,35,45,55):
    print(f"  {i}: {err[i][0]:+.3f} {err[i][1]:+.3f} {err[i][2]:+.3f}   gt_t {gt[i][:3,3].round(2)}", flush=True)
rad_gt = np.linalg.norm(gt[:, :2, 3] - 0, axis=1)
rad_est = np.linalg.norm(w[:, :2, 3], axis=1)
print("radius gt vs est @15,30,45:", [(round(rad_gt[i],3), round(rad_est[i],3)) for i in (15,30,45)])

print("first 10 scans err + iters:")
for i in range(10):
    print(f"  {i}: err {err[i][0]:+.3f} {err[i][1]:+.3f} {err[i][2]:+.3f}")
