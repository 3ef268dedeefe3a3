"""Eval harness smoke tests (small synthetic workloads)."""
import json

import numpy as np
import pytest

from warpsense_tpu.eval import pcd2tsdf, pcd_registration


def _small_cloud(res=256, half=3000, n_per_wall=300, seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    for ax in range(3):
        for s in (-1, 1):
            p = rng.uniform(-half, half, (n_per_wall, 3))
            p[:, ax] = s * half
            pts.append(p)
    mm = np.concatenate(pts).astype(np.int64)
    vox = mm // res
    _, keep = np.unique(vox, axis=0, return_index=True)
    return vox[np.sort(keep)] * res + res // 2


def test_pcd2tsdf_device_matches_host_twin():
    cloud = _small_cloud()
    stats = pcd2tsdf.run(cloud, tau=900, resolution=256, size=(31, 31, 31),
                         host_compare_points=128)
    assert stats["touched_voxels_device"] > 100
    assert stats["exact_agreement"] == 1.0, stats


def test_pcd_registration_recovers_perturbations():
    cloud = _small_cloud()
    results = pcd_registration.run(cloud, tau=900, resolution=256,
                                   size=(31, 31, 31), max_iterations=60,
                                   epsilon=0.0, mode="fast")
    assert set(results) == {"idle", "translation", "rotation",
                            "rotation_inv", "translation+rotation"}
    # idle must stay put; every perturbation must be mostly recovered
    assert results["idle"]["avg"] < 20.0, results["idle"]
    for name in ("translation", "rotation", "rotation_inv",
                 "translation+rotation"):
        assert results[name]["avg"] < 120.0, (name, results[name])


def test_slam_eval_cli_smoke(tmp_path, capsys):
    from warpsense_tpu.eval import slam_eval

    slam_eval.main(["--pipeline", "warpsense", "--frames", "4",
                    "--channels", "16", "--columns", "256",
                    "--map-out", str(tmp_path / "m.h5")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 4
    assert np.isfinite(out["ate_rmse_m"])
