"""Checkpoint/resume: persisted map + poses survive a restart."""
import numpy as np

from warpsense_tpu.core.config import Params
from warpsense_tpu.io.synthetic import BoxWorld, render_scan, walk_trajectory
from warpsense_tpu.pipeline.warpsense import WarpsenseApp


def make_params():
    return Params.from_dict({
        "map": {"max_distance": 0.6, "resolution": 128, "max_weight": 10,
                "size": {"x": 20, "y": 20, "z": 6}, "shift": 8.0,
                "update_distance": 0.08},
        "registration": {"max_iterations": 60, "epsilon": 0.0,
                         "it_weight_gradient": 0.1, "mode": "fast"},
        "lidar": {"channels": 32, "hresolution": 512},
    })


def test_warpsense_resume_continues_trajectory(tmp_path):
    world = BoxWorld.default()
    poses = walk_trajectory(8, step_m=0.1)
    rng = np.random.default_rng(0)
    scans = [render_scan(world, p, channels=32, columns=512,
                         noise_std=0.002, rng=rng) for p in poses]
    path = tmp_path / "resume.h5"

    app = WarpsenseApp(make_params(), map_path=path, capacity=8192)
    for scan, stamp in zip(scans[:4], range(4)):
        last_pose = app.cloud_callback(scan, float(stamp))
    fused_before = int((np.asarray(app.state.weight) != 0).sum())
    app.terminate()

    # restart from the persisted file
    app2 = WarpsenseApp(make_params(), map_path=path, capacity=8192,
                        resume=True)
    assert app2.initialized
    # pose restored (poses are stored rounded to mm)
    np.testing.assert_allclose(app2.pose[:3, 3], last_pose[:3, 3], atol=2.0)
    # the reloaded window carries the fused map
    fused_after = int((np.asarray(app2.state.weight) != 0).sum())
    assert fused_after > 0.9 * fused_before

    # continue the trajectory; error must not grow beyond the drift the
    # first session already accumulated (resume adds no discontinuity)
    err_before = np.linalg.norm(last_pose[:3, 3] / 1000.0 - poses[3][:3, 3])
    errs = []
    for i, (scan, gt) in enumerate(zip(scans[4:], poses[4:])):
        pose = app2.cloud_callback(scan, float(4 + i))
        errs.append(np.linalg.norm(pose[:3, 3] / 1000.0 - gt[:3, 3]))
    app2.terminate()
    assert errs[-1] < err_before + 0.1, \
        f"pre-resume drift {err_before:.3f}, post-resume errors {errs}"
