import sys; sys.path.insert(0, "/root/repo")
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
def run(tag, reverse=False, no_imu=False, reg_over=None, static_pose=False):
    tmp = pathlib.Path(tempfile.mkdtemp())
    params = Params.from_dict({
        "lidar": {"channels": 32, "hresolution": 256},
        "map": {"max_distance": 0.96, "update_distance": 0.3,
                "resolution": 128, "size": {"x": 12.0, "y": 12.0, "z": 6.0},
                "shift": 3.0, "max_weight": 10},
        "registration": dict({"max_iterations": 50, "epsilon": 0.03,
                         "it_weight_gradient": 0.1, "mode": "fast"}, **(reg_over or {})),
    })
    world = BoxWorld.default()
    gt = circular_trajectory(2*N, radius=1.2, z=0.3)[:N]
    if reverse:
        gt = gt[::-1].copy()
    if static_pose:
        gt = np.repeat(gt[:1], N, axis=0)
    rng = np.random.default_rng(0)
    app = WarpsenseApp(params, map_path=tmp/"s.h5", capacity=8192, max_range_mm=22000, exact_fields=True)
    imu = imu_stream_for(gt, DT)
    est = []
    for i in range(N):
        stamp = i*DT
        if not no_imu:
            for s in imu:
                if (i-1)*DT < s.stamp <= stamp:
                    app.imu_callback(ImuSample(s.stamp, s.angular_velocity))
        scan = render_scan(world, gt[i], channels=32, columns=256,
                           max_range=22.0, noise_std=0.01, rng=rng)
        est.append(app.cloud_callback(scan, stamp).copy())
    app.terminate()
    est = np.stack(est); est_m = est.copy(); est_m[:, :3, 3] /= 1000.0
    w = np.einsum("ij,njk->nik", gt[0], est_m)
    err = w[:, :3, 3] - gt[:, :3, 3]
    n = np.linalg.norm(err, axis=1)
    yaws = []
    for i in range(N):
        Re = w[i][:3,:3] @ gt[i][:3,:3].T
        yaws.append(np.degrees(np.arctan2(Re[1,0], Re[0,0])))
    print(f"{tag}: ATE {np.sqrt(np.mean(n**2)):.3f}; yaw@15,30,45,59 = "
          + " ".join(f"{yaws[i]:+.2f}" for i in (15,30,45,59)), flush=True)

import os
which = os.environ.get("WHICH","fwd")
if which=="fwd": run("fwd")
if which=="rev": run("rev", reverse=True)
if which=="static": run("static (no motion)", static_pose=True)
