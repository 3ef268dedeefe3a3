"""Benchmark: full warpsense per-scan step on one chip at reference scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the reference's UOS Parking Lot configuration (README.md:309-328):
40 x 40 x 15 m window @ 64 mm voxels (~91M voxels), tau 600 mm, ~32K
registration points (the reference caps at 128K but feeds ~30K dedup'd voxel
centers, app.cpp:122).  Baseline: RTX 2080 SUPER = 15 ms registration +
<1 ms TSDF update per scan => ~62.5 scans/s (README.md:309-328).
vs_baseline = our scans/s / 62.5 (>1 means faster than the reference GPU).

Per-scan cost counts ALL THREE stages every scan (TSDF fusion + field
precompute + registration) — conservative: the real pipeline gates fusion
on update_distance and reuses cached fields between updates.
"""
import json
import time

import numpy as np

BASELINE_SCANS_PER_S = 62.5


def room_cloud(n, half=18000, zhalf=6000, seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    per = n // 6
    for ax in range(3):
        for s in (-1, 1):
            p = np.stack([
                rng.uniform(-half, half, per),
                rng.uniform(-half, half, per),
                rng.uniform(-zhalf, zhalf, per),
            ], axis=1)
            p[:, ax] = s * (zhalf if ax == 2 else half)
            pts.append(p)
    return np.round(np.concatenate(pts)).astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
    from warpsense_tpu.map.local_map import LocalMapState
    from warpsense_tpu.ops.registration import (precompute_fields,
                                                register_cloud_fields)
    from warpsense_tpu.ops.tsdf_projective import tsdf_update_projective

    TAU, RES = 600, 64
    SIZE = (625, 625, 235)          # 40 x 40 x 15 m @ 64 mm
    N = 32766

    pts = jnp.asarray(room_cloud(N))
    mask = jnp.ones((N,), bool)
    state = LocalMapState(
        value=jnp.full(SIZE, TAU, jnp.int16),
        weight=jnp.zeros(SIZE, jnp.int16),
        pos=jnp.zeros(3, jnp.int32),
        offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32))
    R = jnp.eye(3, dtype=jnp.float32)
    tsdf_kw = dict(size=SIZE, tau=TAU, max_weight=32 * WEIGHT_RESOLUTION,
                   resolution=RES, channels=128, columns=1024, vfov_deg=45.0)
    reg_kw = dict(size=SIZE, resolution=RES, max_iterations=200,
                  it_weight_gradient=0.1, epsilon=0.03, mode="fast")
    pert = np.eye(4, dtype=np.float32)
    pert[:3, 3] = [80, -60, 40]
    origin = jnp.zeros(3, jnp.int32)

    def sync(x):
        jax.block_until_ready(x)
        return x

    # warmup / compile
    state = sync(tsdf_update_projective(state, pts, mask, origin, R,
                                        **tsdf_kw))
    fields = sync(precompute_fields(state))
    pose = sync(register_cloud_fields(fields, state.pos, state.offset, pts,
                                      mask, jnp.asarray(pert), **reg_kw))

    K = 10
    t0 = time.perf_counter()
    for _ in range(K):
        state = tsdf_update_projective(state, pts, mask, origin, R,
                                       **tsdf_kw)
    sync(state)
    tsdf_ms = (time.perf_counter() - t0) / K * 1000

    t0 = time.perf_counter()
    for _ in range(K):
        fields = precompute_fields(state)
    sync(fields)
    fields_ms = (time.perf_counter() - t0) / K * 1000

    t0 = time.perf_counter()
    for _ in range(K):
        pose = register_cloud_fields(fields, state.pos, state.offset, pts,
                                     mask, jnp.asarray(pert), **reg_kw)
    sync(pose)
    reg_ms = (time.perf_counter() - t0) / K * 1000

    per_scan_ms = tsdf_ms + fields_ms + reg_ms
    scans_per_s = 1000.0 / per_scan_ms
    print(json.dumps({
        "metric": "warpsense_step_scans_per_s",
        "value": round(scans_per_s, 2),
        "unit": "scans/s (tsdf %.1fms + fields %.1fms + reg %.1fms per scan,"
                " 91M voxel map, 32K pts)" % (tsdf_ms, fields_ms, reg_ms),
        "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
