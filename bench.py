"""Benchmark: full warpsense per-scan step on one chip at reference scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "scaling"}.

Workload = the reference's UOS Parking Lot configuration (README.md:309-328):
40 x 40 x 15 m window @ 64 mm voxels (~91M voxels), tau 600 mm, ~32K
registration points (the reference caps at 128K but feeds ~30K dedup'd voxel
centers, app.cpp:122).  Baseline: RTX 2080 SUPER = 15 ms registration +
<1 ms TSDF update per scan => ~62.5 scans/s (README.md:309-328).
vs_baseline = our scans/s / 62.5 (>1 means faster than the reference GPU).

The per-scan step counts ALL THREE stages every scan — TSDF fusion (Pallas
level-grid kernel), registration-field precompute (Pallas pack kernel), and
the full adaptive-LM registration — conservative: the real pipeline gates
fusion on update_distance and reuses cached fields between updates.  The
unit string reports the per-stage split (measured independently, each with a
true inter-iteration data dependence so XLA cannot hoist the body), the GN
iteration count of a representative registration, and the featsense front
end (features + odometry) per-scan time against its 13-42 ms CPU baseline
(README.md:285-297).

``scaling``: WEAK-scaling curve (fixed per-device voxel volume, 1 -> 8
virtual devices) of the SHARDED fast SLAM step (parallel/sharded.py) on a
virtual CPU mesh, one subprocess per point (JAX_PLATFORMS=cpu).  Each
mesh point is compared against a 1-device mesh at the SAME total volume —
identical compute on the same fixed cores — so the reported overhead/
efficiency isolate the pure collective cost.  The stand-in for
BASELINE.md's 2-host v5e target on a one-chip image.

``accuracy``: ATE RMSE of BOTH pipelines over a 120-frame rotation-rich
synthetic trajectory (yaw walk + pitch/roll oscillation), in a CPU
subprocess — the driver artifact that catches regressions in
gather-freeze / level-grid fusion / SE(3) composition round-over-round
(the reference's whole eval story is trajectory accuracy,
README.md:262-279).

Timing methodology: on the tunneled TPU platform every awaited op pays a
~25 ms host<->device round trip, so each stage is a K-iteration
``lax.fori_loop`` INSIDE one jitted function with a data dependence between
iterations, awaited once; the round-trip cost (measured on a trivial op) is
subtracted.

The loop builders are module-level and size-parameterized so
tests/test_bench.py can compile-check every one of them at a tiny window
on CPU in CI — API drift can never again silently kill the bench (the
round-2 bench died on an unexecuted refactor, VERDICT round 2).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_SCANS_PER_S = 62.5
FEATSENSE_BASELINE_MS = 13.0     # i7-4790K, UOS Lab @20 Hz

# reference scale: UOS Parking Lot, 40 x 40 x 15 m @ 64 mm
FULL = dict(size=(625, 625, 235), tau=600, res=64, n=32766, k=12,
            channels=128, columns=1024, vfov_deg=45.0, max_iterations=50)
# tiny CI smoke scale (33^3-class window; see tests/test_bench.py)
TINY = dict(size=(33, 33, 33), tau=600, res=64, n=384, k=2,
            channels=16, columns=64, vfov_deg=45.0, max_iterations=4)


def room_cloud(n, half=18000, zhalf=6000, seed=0):
    from warpsense_tpu.io.synthetic import box_room_cloud
    return box_room_cloud(n, half, zhalf, seed=seed)


def organized_room_scan(channels=128, columns=1024, half=18.0, zhalf=6.0,
                        vfov_deg=45.0, seed=3):
    """(H, W, 3) float32 meters: OS1-style organized scan of a box room."""
    rng = np.random.default_rng(seed)
    el = np.radians(np.linspace(vfov_deg / 2, -vfov_deg / 2, channels))
    az = np.linspace(-np.pi, np.pi, columns, endpoint=False)
    d = np.stack([np.cos(el)[:, None] * np.cos(az)[None, :],
                  np.cos(el)[:, None] * np.sin(az)[None, :],
                  np.sin(el)[:, None] * np.ones((1, columns))], axis=-1)
    # ray-box: smallest positive t with |t*d_axis| = half (or zhalf)
    with np.errstate(divide="ignore"):
        tx = half / np.maximum(np.abs(d[..., 0]), 1e-9)
        ty = half / np.maximum(np.abs(d[..., 1]), 1e-9)
        tz = zhalf / np.maximum(np.abs(d[..., 2]), 1e-9)
    t = np.minimum(np.minimum(tx, ty), tz)
    pts = d * t[..., None] + rng.normal(0, 0.01, d.shape)
    return pts.astype(np.float32)


def build_slam_loops(cfg, *, fusion="auto"):
    """Jitted K-chained stage loops + inputs for the warpsense step.

    Returns a dict with 'step', 'tsdf', 'fields', 'xor', 'reg_loop_fn',
    'reg_once', and the prepared 'state'/'pts'/'mask' inputs.  Every loop
    carries a true inter-iteration data dependence so XLA cannot hoist the
    body out of the fori_loop.
    """
    import jax
    import jax.numpy as jnp

    from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
    from warpsense_tpu.map.local_map import LocalMapState
    from warpsense_tpu.ops.registration import (
        precompute_fields_packed_auto, register_cloud_packed)

    if fusion == "auto":
        fusion = "pallas" if jax.default_backend() == "tpu" else "projective"
    if fusion == "pallas":
        from warpsense_tpu.kernels.tsdf_pallas import \
            tsdf_update_projective_pallas as fuse_op
        extra = dict(identity_rot=True)
    else:
        from warpsense_tpu.ops.tsdf_projective import \
            tsdf_update_projective as fuse_op
        extra = {}

    SIZE, TAU, RES, N, K = (cfg["size"], cfg["tau"], cfg["res"], cfg["n"],
                            cfg["k"])
    half = min(SIZE[0], SIZE[1]) * RES * 45 // 100
    zhalf = SIZE[2] * RES * 40 // 100
    pts = jnp.asarray(room_cloud(N, half=half, zhalf=zhalf))
    mask = jnp.ones((N,), bool)
    state = LocalMapState(
        value=jnp.full(SIZE, TAU, jnp.int16),
        weight=jnp.zeros(SIZE, jnp.int16),
        pos=jnp.zeros(3, jnp.int32),
        offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32))
    R = jnp.eye(3, dtype=jnp.float32)
    tsdf_kw = dict(size=SIZE, tau=TAU, max_weight=32 * WEIGHT_RESOLUTION,
                   resolution=RES, channels=cfg["channels"],
                   columns=cfg["columns"], vfov_deg=cfg["vfov_deg"], **extra)
    # gather_freeze = the production configuration: the per-iteration
    # cost is ~entirely the latency-bound 32K fields gather, and the
    # sub-voxel LM tail reuses the cached gather (accuracy pinned by
    # tests/test_registration.py::test_registration_packed_gather_freeze).
    # (coarse_iterations measured neutral on-chip: gather latency does
    # not scale down with the point count.)
    reg_kw = dict(size=SIZE, resolution=RES, tau=TAU,
                  max_iterations=cfg["max_iterations"],
                  it_weight_gradient=0.1, epsilon=0.03, gather_freeze=True)
    pert = np.eye(4, dtype=np.float32)
    pert[:3, 3] = np.asarray([80, -60, 40]) * RES // 64
    pert = jnp.asarray(pert)
    origin = jnp.zeros(3, jnp.int32)

    def fuse(st, spos):
        return fuse_op(st, pts, mask, spos, R, **tsdf_kw)

    # --- full chained SLAM step: fuse -> fields -> register, pose fed back
    @jax.jit
    def step_loop(state, pose0):
        def body(_, carry):
            st, pose = carry
            spos = (pose[:3, 3] / RES).astype(jnp.int32)
            st = fuse(st, spos)
            fields = precompute_fields_packed_auto(st, tau=TAU)
            pose, iters, err = register_cloud_packed(
                fields, st.pos, st.offset, pts, mask, pose @ pert, **reg_kw)
            return st, pose
        st, pose = jax.lax.fori_loop(0, K, body, (state, pose0))
        return (jnp.sum(st.value[:2, :2, :2].astype(jnp.int32))
                + jnp.sum(pose))

    # --- per-stage loops, each with a true inter-iteration dependence
    @jax.jit
    def tsdf_loop(state):
        def body(_, st):
            return fuse(st, origin)
        st = jax.lax.fori_loop(0, K, body, state)
        return jnp.sum(st.value[:2, :2, :2].astype(jnp.int32))

    @jax.jit
    def fields_loop(state):
        def body(_, carry):
            val, acc = carry
            val = val ^ (acc & 1).astype(jnp.int16)
            st = LocalMapState(val, state.weight, state.pos, state.offset)
            f = precompute_fields_packed_auto(st, tau=TAU)
            return val, acc + f.plane[0, 0, 0]
        _, acc = jax.lax.fori_loop(0, K, body, (state.value, jnp.int32(0)))
        return acc

    @jax.jit
    def xor_loop(state):
        def body(_, carry):
            val, acc = carry
            val = val ^ (acc & 1).astype(jnp.int16)
            return val, acc + val[0, 0, 0].astype(jnp.int32)
        _, acc = jax.lax.fori_loop(0, K, body, (state.value, jnp.int32(0)))
        return acc

    @jax.jit
    def reg_loop(fields, pos, offset):
        def body(_, carry):
            pose, it_acc = carry
            out, iters, err = register_cloud_packed(
                fields, pos, offset, pts, mask, pose @ pert, **reg_kw)
            return out, it_acc + iters
        pose, it_acc = jax.lax.fori_loop(
            0, K, body, (jnp.eye(4, dtype=jnp.float32), jnp.int32(0)))
        return jnp.sum(pose) + it_acc.astype(jnp.float32)

    def precompute(st):
        return precompute_fields_packed_auto(st, tau=TAU)

    def reg_once(fields, st):
        return register_cloud_packed(fields, st.pos, st.offset, pts, mask,
                                     pert, **reg_kw)

    return dict(step=step_loop, tsdf=tsdf_loop, fields=fields_loop,
                xor=xor_loop, reg=reg_loop, precompute=precompute,
                reg_once=reg_once, state=state, pts=pts, mask=mask, k=K)


def build_featsense_loops(cfg):
    """Jitted K-chained featsense front-end loops (features + odometry)."""
    import jax
    import jax.numpy as jnp

    from warpsense_tpu.frontends.featsense.features import extract_features
    from warpsense_tpu.frontends.featsense.odometry import (
        empty_map, merge_map, odom_update)

    K = cfg["k"]
    scan = jnp.asarray(organized_room_scan(
        channels=cfg["channels"], columns=max(cfg["columns"], 64),
        vfov_deg=cfg["vfov_deg"]))

    @jax.jit
    def feat_loop(scan):
        def body(_, carry):
            sc, acc = carry
            sc = sc + acc * 1e-12
            (e, em, _), (s, sm, _) = extract_features(sc)
            return sc, acc + jnp.sum(e[0]) * 0.0 + em.sum().astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, K, body, (scan, jnp.float32(0)))
        return acc

    (e, em, _), (s, sm, _) = extract_features(scan)
    center = jnp.zeros(3, jnp.float32)
    emap = merge_map(empty_map(8192), e, em, center, crop=100.0, leaf=0.4)
    smap = merge_map(empty_map(16384), s, sm, center, crop=100.0, leaf=0.4)
    # occupied-prefix bucketing, exactly as the production host shell does
    # before every solve (OdomEstimation.update)
    from warpsense_tpu.frontends.featsense.odometry import OdomEstimation
    emap = OdomEstimation._occupied_prefix(
        emap, int(np.asarray(jnp.sum(emap.mask))))
    smap = OdomEstimation._occupied_prefix(
        smap, int(np.asarray(jnp.sum(smap.mask))))
    q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)

    @jax.jit
    def odom_loop(e, em, s, sm):
        def body(_, carry):
            q, t = carry
            q, t = odom_update(emap, smap, e, em, s, sm, q, t, jnp.int32(2))
            return q, t
        q, t = jax.lax.fori_loop(0, K, body, (q0, t0))
        return jnp.sum(q) + jnp.sum(t)

    return dict(feat=feat_loop, odom=odom_loop, scan=scan,
                features=(e, em, s, sm), k=K)


# -------------------------------------------------------------- kernel parity

def kernel_parity(loops, cfg=FULL):
    """Bit-parity of the Pallas kernels vs their XLA twins AT THE BENCH
    WINDOW on the attached TPU, recorded in the driver artifact
    (VERDICT r3 #9): interpret-mode tests pin the kernels' semantics on
    CPU, but the real Mosaic lowering is what the hardware runs — this
    catches lowering drift where it matters.  Checks the level fusion
    kernel (vs the XLA projective sweep) and the packed-fields kernel
    (vs the XLA roll formulation)."""
    import jax
    import jax.numpy as jnp

    from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
    from warpsense_tpu.map.local_map import LocalMapState
    from warpsense_tpu.ops.registration import (precompute_fields_packed,
                                                precompute_fields_packed_auto)
    from warpsense_tpu.ops.tsdf_projective import tsdf_update_projective

    if jax.default_backend() != "tpu":
        return {"skipped": "no TPU attached (CPU twins are trivially equal)"}
    from warpsense_tpu.kernels.tsdf_pallas import \
        tsdf_update_projective_pallas

    SIZE, TAU = cfg["size"], cfg["tau"]
    kw = dict(size=SIZE, tau=TAU, max_weight=32 * WEIGHT_RESOLUTION,
              resolution=cfg["res"], channels=cfg["channels"],
              columns=cfg["columns"], vfov_deg=cfg["vfov_deg"])

    def fresh():
        return LocalMapState(
            value=jnp.full(SIZE, TAU, jnp.int16),
            weight=jnp.zeros(SIZE, jnp.int16),
            pos=jnp.zeros(3, jnp.int32),
            offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32))

    eye = jnp.eye(3, dtype=jnp.float32)
    origin = jnp.zeros(3, jnp.int32)
    pa = tsdf_update_projective_pallas(fresh(), loops["pts"], loops["mask"],
                                       origin, eye, identity_rot=True, **kw)
    xl = tsdf_update_projective(fresh(), loops["pts"], loops["mask"],
                                origin, eye, **kw)
    fusion_mism = int(jnp.sum((pa.value != xl.value)
                              | (pa.weight != xl.weight)))
    fa = precompute_fields_packed_auto(pa, tau=TAU)     # Pallas on TPU
    fb = precompute_fields_packed(pa, tau=TAU)          # XLA twin
    fields_mism = int(jnp.sum(fa.plane != fb.plane))
    return {"voxels": int(np.prod(SIZE)),
            "fusion_bit_mismatches": fusion_mism,
            "fields_bit_mismatches": fields_mism}


# ------------------------------------------------------------------ accuracy

# Rotation-rich ATE sequence (VERDICT r3 #2): continuous yaw + pitch +
# roll segments over >= 100 frames so regressions in gather-freeze /
# level-grid fusion / SE(3) composition show up in the driver artifact.
# The reference's whole eval story is trajectory accuracy
# (/root/reference/README.md:262-279, evo/HILTI).
ATE_CFG = dict(frames=120, channels=32, columns=512, res=128,
               window=(100, 99, 39), step_m=0.08, shift=1.0)
ATE_TINY = dict(frames=6, channels=16, columns=128, res=128,
                window=(40, 33, 27), step_m=0.08, shift=8.0)


def measure_ate(cfg=ATE_CFG):
    """ATE RMSE (m) of both pipelines over a rotation-rich synthetic
    sequence on the CURRENT backend.  Module-level and size-parameterized
    so tests/test_bench.py can run it at ATE_TINY scale in CI.

    Warpsense is fed a synthesized gyro stream (the reference warpsense is
    IMU-fed, app.cpp:54-63; without the rotation prior, pitch transients
    cost seed-dependent 0.2-0.4 m per-frame spikes — measured round 4);
    featsense runs LiDAR-only like the reference.  map.max_weight matches
    the throughput workload (32) so accuracy and speed describe the SAME
    configuration."""
    import pathlib
    import tempfile

    from warpsense_tpu.core.config import Params
    from warpsense_tpu.io.synthetic import (BoxWorld, imu_stream_for,
                                            render_scan, rich_trajectory)
    from warpsense_tpu.io.trajectory import ate_rmse
    from warpsense_tpu.pipeline.featsense import FeatsenseApp
    from warpsense_tpu.pipeline.warpsense import WarpsenseApp
    from warpsense_tpu.utils.imu import ImuSample

    ch, cols = cfg["channels"], cfg["columns"]
    params = Params.from_dict({
        "map": {"max_distance": 0.6, "resolution": cfg["res"],
                "max_weight": 32, "shift": cfg["shift"],
                "update_distance": 0.05},
        "registration": {"max_iterations": 60, "epsilon": 0.0,
                         "it_weight_gradient": 0.1, "mode": "fast"},
        "floam": {"min_distance": 0.5, "max_distance": 40.0,
                  "edge_threshold": 0.5, "surf_threshold": 0.05,
                  "edge_resolution": 0.15, "optimization_steps": 3,
                  "enrich": 4, "vgicp_fitness_score": 6.0},
        "lidar": {"channels": ch, "hresolution": cols},
    })
    truth = rich_trajectory(cfg["frames"], step_m=cfg["step_m"])
    world = BoxWorld.default()
    rng = np.random.default_rng(0)
    scans = [render_scan(world, p, channels=ch, columns=cols,
                         noise_std=0.002, rng=rng) for p in truth]
    # ground truth in the apps' world frame (= the first sensor frame)
    rel = np.einsum("ij,njk->nik", np.linalg.inv(truth[0]), truth)
    tmp = pathlib.Path(tempfile.mkdtemp())
    scan_dt = 0.1
    imu = imu_stream_for(truth, scan_dt)

    # "projective-level" = the PRODUCTION fusion semantic on any backend:
    # level map-aligned binning inside the tilt envelope with the
    # attitude-aware fallback beyond it (what the Pallas path runs on
    # TPU) — so level-grid/dispatch regressions show in this artifact
    # (plain "auto" on the CPU worker resolves to the always-attitude
    # sweep, which cannot see them; measured ATE is equal: 0.014)
    app = WarpsenseApp(params, map_path=tmp / "ate_w.h5", capacity=8192,
                       window_size=cfg["window"], force_odd=False,
                       fusion="projective-level", sync_shift=True)
    est_w = []
    for i, scan in enumerate(scans):
        stamp = i * scan_dt
        for s in imu:
            if (i - 1) * scan_dt < s.stamp <= stamp:
                app.imu_callback(ImuSample(s.stamp, s.angular_velocity))
        p = app.cloud_callback(scan, stamp).astype(np.float64).copy()
        p[:3, 3] /= 1000.0
        est_w.append(p)
    app.terminate()

    fapp = FeatsenseApp(params, map_path=tmp / "ate_f.h5",
                        edge_capacity=1024, surf_capacity=2048,
                        cloud_capacity=8192, fusion="auto",
                        odom_kwargs=dict(edge_map_capacity=4096,
                                         surf_map_capacity=8192))
    est_f = [fapp.process_scan(scan, float(i)).astype(np.float64)
             for i, scan in enumerate(scans)]
    fapp.terminate()

    return {
        "frames": cfg["frames"],
        "trajectory": "yaw walk + pitch/roll oscillation segments",
        "backend": "cpu subprocess (production fusion SEMANTIC, "
                   "projective-level; the Pallas kernel's numerics are "
                   "pinned bit-exact by the kernel_parity block)",
        "ate_rmse_warpsense_m": round(ate_rmse(np.stack(est_w), rel,
                                               align=True), 4),
        "ate_rmse_featsense_m": round(ate_rmse(np.stack(est_f), rel,
                                               align=True), 4),
    }


def _ate_worker() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(json.dumps(measure_ate()))


# ----------------------------------------------- adversarial accuracy (r5)

# two-room + corridor world at 128-channel scans: occlusion, doorway
# transitions, a feature-poor straight, and a loop return — the regime the
# single convex box room cannot probe (VERDICT r4 #3; the reference's
# whole eval story is building-scale rosbag trajectories and it documents
# warpsense instability under fast motion, README.md:262-279, 301).
# Window x-span 32.8 m at 128 mm voxels covers the corridor's far wall
# (the only along-corridor constraint).  Runs on the CURRENT backend —
# on TPU this measures the PRODUCTION Pallas fusion kernel path.
ADV_CFG = dict(channels=128, columns=512, res=128, window=(256, 101, 41),
               step_m=0.2, shift=1.0, max_frames=None)
ADV_TINY = dict(channels=16, columns=128, res=128, window=(40, 33, 27),
                step_m=0.5, shift=8.0, max_frames=5)

CORRIDOR_SEGMENTS = (5, 6, 11, 12)     # see io.synthetic.TWO_ROOM_WAYPOINTS


def _adversarial_inputs(cfg):
    from warpsense_tpu.core.config import Params
    from warpsense_tpu.io.synthetic import (TWO_ROOM_WAYPOINTS,
                                            imu_stream_for, render_scan,
                                            two_room_world,
                                            waypoint_trajectory)

    ch, cols = cfg["channels"], cfg["columns"]
    # update_distance 0.25 = the reference's fusion gate
    # (params/params.yaml:34) — measured load-bearing here: fusing every
    # scan closes a fuse-at-estimated-pose feedback loop on freshly
    # mapped corridor walls (first seen at grazing incidence, so their
    # evidence is young exactly when they are the only lateral
    # constraint) that runs the pose away exponentially
    params = Params.from_dict({
        "map": {"max_distance": 0.6, "resolution": cfg["res"],
                "max_weight": 32, "shift": cfg["shift"],
                "update_distance": 0.25},
        "registration": {"max_iterations": 60, "epsilon": 0.0,
                         "it_weight_gradient": 0.1, "mode": "fast",
                         "sane_step_m": 0.6},
        "floam": {"min_distance": 0.5, "max_distance": 40.0,
                  "edge_threshold": 0.5, "surf_threshold": 0.05,
                  "edge_resolution": 0.15, "optimization_steps": 3,
                  "enrich": 4, "vgicp_fitness_score": 6.0},
        "lidar": {"channels": ch, "hresolution": cols},
    })
    # sane_step_m 0.6 = 3x this scene's per-scan motion (0.2 m at 10 Hz):
    # the gate is a platform-speed parameter, and the doorway transient's
    # spurious steps are ~0.5 m/frame — the default 2.0 (fast vehicles)
    # lets them through
    truth, seg = waypoint_trajectory(TWO_ROOM_WAYPOINTS,
                                     step_m=cfg["step_m"])
    if cfg["max_frames"]:
        truth, seg = truth[:cfg["max_frames"]], seg[:cfg["max_frames"]]
    world = two_room_world()
    rng = np.random.default_rng(0)
    scans = [render_scan(world, p, channels=ch, columns=cols,
                         noise_std=0.002, rng=rng) for p in truth]
    rel = np.einsum("ij,njk->nik", np.linalg.inv(truth[0]), truth)
    imu = imu_stream_for(truth, 0.1)
    return params, truth, seg, scans, rel, imu


def _segment_metrics(err, seg):
    # tiny CI runs never reach the corridor segments -> NaN sentinel
    m = np.isin(seg, CORRIDOR_SEGMENTS)
    corridor = (round(float(np.sqrt(np.mean(err[m] ** 2))), 4) if m.any()
                else float("nan"))
    return {"ate_rmse_m": round(float(np.sqrt(np.mean(err ** 2))), 4),
            "corridor_rmse_m": corridor,
            "loop_return_err_m": round(float(err[-1]), 4)}


def measure_adversarial_warpsense(cfg=ADV_CFG, inputs=None):
    """Warpsense over the two-room corridor loop on the CURRENT backend
    (the production Pallas fusion path on TPU), IMU-fed like the
    reference (app.cpp:54-63).  ``inputs``: a prebuilt
    ``_adversarial_inputs`` tuple (the analytic scene render costs ~1 min
    — share it between the two pipeline halves)."""
    import pathlib
    import tempfile

    import jax

    from warpsense_tpu.io.trajectory import ate_errors
    from warpsense_tpu.pipeline.warpsense import WarpsenseApp
    from warpsense_tpu.utils.imu import ImuSample

    params, truth, seg, scans, rel, imu = (inputs
                                           or _adversarial_inputs(cfg))
    tmp = pathlib.Path(tempfile.mkdtemp())
    # bucket IMU samples by scan interval once (the naive per-frame list
    # scan is O(frames x samples) of pure Python)
    buckets = [[] for _ in scans]
    for s in imu:
        i = int(np.ceil(s.stamp / 0.1 - 1e-9))
        if 0 <= i < len(buckets):
            buckets[i].append(s)
    app = WarpsenseApp(params, map_path=tmp / "adv_w.h5", capacity=32768,
                       window_size=cfg["window"], force_odd=False,
                       fusion="auto", sync_shift=True)
    est = []
    for i, scan in enumerate(scans):
        for s in buckets[i]:
            app.imu_callback(ImuSample(s.stamp, s.angular_velocity))
        p = app.cloud_callback(scan, i * 0.1).astype(np.float64).copy()
        p[:3, 3] /= 1000.0
        est.append(p)
    app.terminate()
    err = ate_errors(np.stack(est), rel, align=True)
    out = {"frames": len(truth), "backend": jax.default_backend(),
           "scene": "two-room + 14 m corridor loop (occlusion, doorways, "
                    "feature-poor straight, loop return)",
           "note": "the degenerate scene by design: direct point-to-TSDF "
                   "registration degrades at the corridor-exit doorway "
                   "transition (bounded by the sane-step gate + health-"
                   "gated velocity prior, then re-locks) — the regime the "
                   "reference documents as unstable (README.md:301); "
                   "featsense's feature+VGICP front end is the robust "
                   "pipeline here, matching the reference's own story"}
    out.update({f"warpsense_{k}": v
                for k, v in _segment_metrics(err, seg).items()})
    return out


def measure_adversarial_featsense(cfg=ADV_CFG, inputs=None):
    """Featsense (LiDAR-only, like the reference) over the same loop."""
    import pathlib
    import tempfile

    import jax

    from warpsense_tpu.io.trajectory import ate_errors
    from warpsense_tpu.pipeline.featsense import FeatsenseApp

    params, truth, seg, scans, rel, _ = (inputs
                                         or _adversarial_inputs(cfg))
    tmp = pathlib.Path(tempfile.mkdtemp())
    fapp = FeatsenseApp(params, map_path=tmp / "adv_f.h5",
                        edge_capacity=2048, surf_capacity=4096,
                        cloud_capacity=32768, fusion="auto",
                        odom_kwargs=dict(edge_map_capacity=8192,
                                         surf_map_capacity=16384))
    est = [fapp.process_scan(scan, float(i)).astype(np.float64)
           for i, scan in enumerate(scans)]
    fapp.terminate()
    err = ate_errors(np.stack(est), rel, align=True)
    out = {"backend": jax.default_backend()}
    out.update({f"featsense_{k}": v
                for k, v in _segment_metrics(err, seg).items()})
    return out


def measure_adversarial_accuracy(cfg=ADV_CFG):
    """Both pipelines sequentially on the current backend (used by the CI
    smoke test; bench main instead overlaps the featsense half in a CPU
    subprocess with the TPU-bound warpsense half)."""
    inputs = _adversarial_inputs(cfg)
    out = measure_adversarial_warpsense(cfg, inputs=inputs)
    out.update(measure_adversarial_featsense(cfg, inputs=inputs))
    return out


# fast-motion failure envelope (the regime the reference documents as
# unstable for warpsense, README.md:301): short straight walks in the box
# room at increasing per-frame motion; the envelope is the largest step
# that still tracks (< 0.15 m ATE over the walk)
ENV_STEPS_M = (0.15, 0.5, 0.75, 1.0)
ENV_CFG = dict(channels=64, columns=512, res=128, window=(160, 101, 41),
               frames=36, shift=1.5)
ENV_TINY = dict(channels=16, columns=128, res=128, window=(40, 33, 27),
                frames=4, shift=8.0)


def measure_fast_envelope(cfg=ENV_CFG, steps=ENV_STEPS_M):
    """ATE of LiDAR-only warpsense (no IMU — fast motion is where the
    gyro prior would mask the registration's own basin) vs per-frame
    step; returns the curve + the largest tracked step."""
    import pathlib
    import tempfile

    from warpsense_tpu.core.config import Params
    from warpsense_tpu.io.synthetic import (BoxWorld, render_scan,
                                            walk_trajectory)
    from warpsense_tpu.io.trajectory import ate_rmse
    from warpsense_tpu.pipeline.warpsense import WarpsenseApp

    ch, cols = cfg["channels"], cfg["columns"]
    params = Params.from_dict({
        "map": {"max_distance": 0.6, "resolution": cfg["res"],
                "max_weight": 32, "shift": cfg["shift"],
                "update_distance": 0.05},
        "registration": {"max_iterations": 60, "epsilon": 0.0,
                         "it_weight_gradient": 0.1, "mode": "fast"},
        "lidar": {"channels": ch, "hresolution": cols},
    })
    world = BoxWorld.default()
    out = {"steps_m": list(steps), "ate_rmse_m": [], "frames": cfg["frames"]}
    tmp = pathlib.Path(tempfile.mkdtemp())
    for step in steps:
        truth = walk_trajectory(cfg["frames"], step_m=step, yaw_rate=0.04)
        rng = np.random.default_rng(1)
        scans = [render_scan(world, p, channels=ch, columns=cols,
                             noise_std=0.002, rng=rng) for p in truth]
        rel = np.einsum("ij,njk->nik", np.linalg.inv(truth[0]), truth)
        app = WarpsenseApp(params, map_path=tmp / f"env_{step}.h5",
                           capacity=16384, window_size=cfg["window"],
                           force_odd=False, fusion="auto", sync_shift=True)
        est = []
        for i, scan in enumerate(scans):
            p = app.cloud_callback(scan, i * 0.1).astype(np.float64).copy()
            p[:3, 3] /= 1000.0
            est.append(p)
        app.terminate()
        out["ate_rmse_m"].append(
            round(ate_rmse(np.stack(est), rel, align=True), 4))
    tracked = [s for s, a in zip(steps, out["ate_rmse_m"]) if a < 0.15]
    out["max_tracked_step_m"] = max(tracked) if tracked else 0.0
    out["note"] = ("LiDAR-only warpsense on straight box-room walks; the "
                   "reference documents instability in this regime "
                   "(README.md:301); tracked = ATE < 0.15 m")
    return out


# ------------------------------------------------- app-level throughput (r5)

# the loop benches time jitted fori_loops; these run the APPLICATION
# callbacks (preprocess, gating, HDF5 pose writes, queue discipline) so a
# host-side orchestration regression is visible in the artifact (VERDICT
# r4 #8; reference role: RuntimeEvaluator's whole-callback "total" span,
# app.cpp:67-113).  NOTE on this image the tunneled platform adds ~25 ms
# per forced device sync — reported alongside, a local host does not pay
# it.
# capacity matches FULL["n"] so the app's fuse/fields/register jits hit
# the headline loops' compile cache (same shapes) when both run in one
# bench process — the full-window compiles otherwise repeat (~5 min)
APP_CFG = dict(size=(625, 625, 235), res=64, scans=12, warmup=2,
               channels=128, columns=1024, capacity=32766)
APP_TINY = dict(size=(33, 33, 33), res=64, scans=2, warmup=1,
                channels=16, columns=64, capacity=384)


def _app_params(cfg):
    from warpsense_tpu.core.config import Params
    return Params.from_dict({
        "map": {"max_distance": 0.6, "resolution": cfg["res"],
                "max_weight": 32, "shift": 1000.0, "update_distance": 0.0},
        "registration": {"max_iterations": 50, "epsilon": 0.03,
                         "it_weight_gradient": 0.1, "mode": "fast"},
        "floam": {"min_distance": 0.5, "max_distance": 40.0,
                  "edge_threshold": 0.5, "surf_threshold": 0.05,
                  "edge_resolution": 0.15, "optimization_steps": 3,
                  "enrich": 4, "vgicp_fitness_score": 6.0},
        "lidar": {"channels": cfg["channels"],
                  "hresolution": cfg["columns"]},
    })


def _app_scans(cfg):
    from warpsense_tpu.io.synthetic import (BoxWorld, render_scan,
                                            walk_trajectory)
    world = BoxWorld.default()
    rng = np.random.default_rng(4)
    poses = walk_trajectory(cfg["scans"] + cfg["warmup"], step_m=0.1)
    return [render_scan(world, p, channels=cfg["channels"],
                        columns=cfg["columns"], noise_std=0.002, rng=rng)
            for p in poses]


def measure_app_throughput(cfg=APP_CFG, rtt: float = 0.0):
    """Whole-application scans/s for both pipelines at the production
    window (fusion EVERY scan — update_distance 0, matching the loop
    bench's conservative accounting; no shift).  Returns the warpsense
    trajectory too so the sharded-1-dev block can pin parity."""
    import pathlib
    import tempfile

    from warpsense_tpu.pipeline.featsense import FeatsenseApp
    from warpsense_tpu.pipeline.warpsense import WarpsenseApp

    params = _app_params(cfg)
    scans = _app_scans(cfg)
    tmp = pathlib.Path(tempfile.mkdtemp())
    out = {"scans": cfg["scans"], "window": list(cfg["size"]),
           "tunnel_rtt_ms": round(rtt * 1e3, 1),
           "note": "application callbacks end-to-end (preprocess, gated "
                   "fuse, register, pose IO); fusion every scan.  On "
                   "THIS image every device dispatch crosses the axon "
                   "tunnel (~25 ms each), so app rates here are tunnel-"
                   "dispatch-bound; the headline loop rate is the device "
                   "rate a locally-attached chip sustains"}

    app = WarpsenseApp(params, map_path=tmp / "app_w.h5",
                       capacity=cfg["capacity"], window_size=cfg["size"],
                       force_odd=False, fusion="auto")
    poses = []
    for i, scan in enumerate(scans[:cfg["warmup"]]):
        poses.append(app.cloud_callback(scan, float(i)))
    t0 = time.perf_counter()
    for i, scan in enumerate(scans[cfg["warmup"]:]):
        poses.append(app.cloud_callback(scan, float(cfg["warmup"] + i)))
    wall = time.perf_counter() - t0
    app.terminate()
    out["warpsense_app_scans_per_s"] = round(cfg["scans"] / wall, 2)
    out["_warpsense_poses"] = poses          # stripped before printing

    fapp = FeatsenseApp(params, map_path=tmp / "app_f.h5",
                        edge_capacity=2048, surf_capacity=4096,
                        cloud_capacity=cfg["capacity"], fusion="auto",
                        odom_kwargs=dict(edge_map_capacity=8192,
                                         surf_map_capacity=16384))
    for i, scan in enumerate(scans[:cfg["warmup"]]):
        fapp.process_scan(scan, float(i))
    t0 = time.perf_counter()
    for i, scan in enumerate(scans[cfg["warmup"]:]):
        fapp.process_scan(scan, float(cfg["warmup"] + i))
    wall = time.perf_counter() - t0
    fapp.terminate()
    out["featsense_app_scans_per_s"] = round(cfg["scans"] / wall, 2)
    return out


def measure_sharded_1dev(cfg=APP_CFG, ref_poses=None):
    """The sharded APPLICATION on a 1-device mesh on the REAL backend
    (VERDICT r4 #4): exercises shard_map + Mosaic + collective lowering
    end-to-end where every prior mesh test was virtual-CPU, quantifies
    the shard_map overhead at n = 1, and pins trajectory parity against
    the plain app when ``ref_poses`` is given."""
    import pathlib
    import tempfile

    import jax

    from warpsense_tpu.parallel.sharded import make_mesh
    from warpsense_tpu.pipeline.warpsense_sharded import ShardedWarpsenseApp

    params = _app_params(cfg)
    scans = _app_scans(cfg)
    tmp = pathlib.Path(tempfile.mkdtemp())
    app = ShardedWarpsenseApp(params, mesh=make_mesh(1),
                              map_path=tmp / "app_s.h5",
                              capacity=cfg["capacity"],
                              window_size=cfg["size"])
    poses = []
    for i, scan in enumerate(scans[:cfg["warmup"]]):
        poses.append(app.cloud_callback(scan, float(i)))
    t0 = time.perf_counter()
    for i, scan in enumerate(scans[cfg["warmup"]:]):
        poses.append(app.cloud_callback(scan, float(cfg["warmup"] + i)))
    wall = time.perf_counter() - t0
    app.terminate()
    out = {"backend": jax.default_backend(),
           "scans_per_s": round(cfg["scans"] / wall, 2),
           "note": "full ShardedWarpsenseApp on a 1-device mesh "
                   "(shard_map + per-shard Pallas fusion + psum/ppermute "
                   "lowering on the real backend)"}
    if ref_poses is not None:
        diff = max(float(np.max(np.abs(p - q)))
                   for p, q in zip(poses, ref_poses))
        out["max_pose_diff_vs_plain_app_mm"] = round(diff, 3)
    return out


# ------------------------------------------------------------------ scaling

# window large enough that the O(voxels) sweep — the part that shards —
# dominates the per-step fixed costs (beam table, replicated LM solve)
SCALING_CFG = dict(size=(384, 193, 193), tau=600, res=64, n=8190, k=3,
                   channels=64, columns=256, vfov_deg=45.0, max_iterations=12)

# weak scaling: FIXED per-device voxel volume (x slab per device), mesh
# 1 -> 8 virtual devices (VERDICT r3 #3)
WEAK_X_PER_DEV = 48


def sharded_step_time(n_devices: int, cfg=SCALING_CFG, reps: int = 3,
                      reg_iters: int | None = None):
    """Seconds per sharded fast SLAM step on an n-device mesh (current
    backend).  Used by the scaling subprocess and tests/test_bench.py.
    ``reg_iters=0`` ablates registration entirely (fusion + fields only —
    the zero-/low-collective stages), which the attribution block uses to
    separate partition cost from registration's replicated point work."""
    import jax
    import jax.numpy as jnp

    from warpsense_tpu.core.config import Params
    from warpsense_tpu.map.local_map import LocalMapState
    from warpsense_tpu.parallel.sharded import (make_mesh, shard_state,
                                                slam_step_sharded)

    SIZE, TAU, RES, K = cfg["size"], cfg["tau"], cfg["res"], cfg["k"]
    mesh = make_mesh(n_devices)
    params = Params.from_dict({
        "map": {"max_distance": TAU / 1000.0, "resolution": RES,
                "max_weight": 32},
        "registration": {"max_iterations": cfg["max_iterations"]
                         if reg_iters is None else reg_iters,
                         "epsilon": 0.03, "it_weight_gradient": 0.1},
        "lidar": {"channels": cfg["channels"],
                  "hresolution": cfg["columns"]},
    })
    half = min(SIZE[0], SIZE[1]) * RES * 45 // 100
    pts = jnp.asarray(room_cloud(cfg["n"], half=half,
                                 zhalf=SIZE[2] * RES * 40 // 100))
    mask = jnp.ones((pts.shape[0],), bool)

    def fresh():
        # rebuilt per rep: the sharded fusion donates its state buffers
        return shard_state(LocalMapState(
            value=jnp.full(SIZE, TAU, jnp.int16),
            weight=jnp.zeros(SIZE, jnp.int16),
            pos=jnp.zeros(3, jnp.int32),
            offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32)), mesh)

    def run(st):
        for _ in range(K):
            st, pose = slam_step_sharded(
                st, pts, mask, jnp.eye(4, dtype=jnp.float32), mesh=mesh,
                params=params, size=SIZE,
                scanner_pos=jnp.zeros(3, jnp.int32), mode="fast")
        return st, pose

    st, pose = run(fresh())        # compile + warm
    jax.block_until_ready((st.value, pose))
    best = float("inf")
    for _ in range(reps):
        state = jax.block_until_ready(fresh())
        t0 = time.perf_counter()
        st, pose = run(state)
        jax.block_until_ready((st.value, pose))
        best = min(best, time.perf_counter() - t0)
    return best / K


def _scaling_worker(n_devices: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(n_devices, 2))
    print(json.dumps({"n": n_devices, "sec": sharded_step_time(n_devices)}))


def _weak_worker(spec: str) -> None:
    """spec = "<mesh_devices>,<x_units>[,noreg]": run the sharded fast step
    on a mesh of ``mesh_devices`` over a window of x extent WEAK_X_PER_DEV *
    x_units (so "8,8" is the 8-device weak point and "1,8" its same-volume
    single-device ideal).  "noreg" ablates registration (fusion + fields
    only) for the attribution block."""
    parts = spec.split(",")
    n_devices, x_units = int(parts[0]), int(parts[1])
    noreg = len(parts) > 2 and parts[2] == "noreg"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(n_devices, 2))
    cfg = dict(SCALING_CFG)
    cfg["size"] = (WEAK_X_PER_DEV * x_units, SCALING_CFG["size"][1],
                   SCALING_CFG["size"][2])
    print(json.dumps({"n": n_devices, "x_units": x_units,
                      "sec": sharded_step_time(
                          n_devices, cfg, reg_iters=0 if noreg else None)}))


def _run_worker(flag: str, arg: str | None = None, timeout: int = 1200):
    cmd = [sys.executable, os.path.abspath(__file__), flag]
    if arg is not None:
        cmd.append(arg)
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
    except (subprocess.TimeoutExpired, OSError) as exc:
        # a hung/failed subprocess degrades to an error entry instead of
        # killing the whole bench artifact
        return {"error": repr(exc)[:300]}
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    if r.returncode != 0 or not line.startswith("{"):
        return {"error": (r.stderr or "no output")[-400:]}
    return json.loads(line)


def measure_scaling(max_devices: int | None = None):
    """WEAK-scaling curve of the sharded fast SLAM step on the virtual CPU
    mesh (VERDICT r3 #3): per-device voxel volume fixed (one x slab per
    device), mesh size 1 -> 8, each point in a fresh subprocess.

    The perfectly-sharded ideal for the n-device point is a 1-DEVICE mesh
    at the SAME total volume (identical compute on the same fixed cores,
    zero collectives); the measured excess over it is exactly what the
    mesh costs — halo ppermute + psum + replicated solve + the per-shard
    replication of point work — the best available proxy for the >= 70%
    2-host v5e BASELINE target on a one-chip image."""
    cores = len(os.sched_getaffinity(0))
    sizes = [1, 2, 4, 8] if max_devices is None else \
        [n for n in (1, 2, 4, 8) if n <= max_devices]
    out = {"mode": "weak", "devices": sizes, "step_s": [],
           "ideal_step_s": [],
           "per_device_voxels": WEAK_X_PER_DEV * SCALING_CFG["size"][1]
           * SCALING_CFG["size"][2]}
    for n in sizes:
        d = _run_worker("--weak-worker", f"{n},{n}")
        if "error" in d:
            return d
        out["step_s"].append(round(d["sec"], 4))
        if n == 1:
            ideal = d
        else:
            ideal = _run_worker("--weak-worker", f"1,{n}")
            if "error" in ideal:
                return ideal
        out["ideal_step_s"].append(round(ideal["sec"], 4))
    out["mesh_overhead"] = [
        round(max(0.0, tm / ti - 1.0), 3)
        for tm, ti in zip(out["step_s"], out["ideal_step_s"])]
    out["efficiency"] = round(out["ideal_step_s"][-1] / out["step_s"][-1], 3)
    if 2 in sizes:
        # the literal BASELINE analog: 2 hosts <=> 2 mesh members, and on
        # this 2-core image the n=2 point is the largest mesh that does
        # NOT oversubscribe the host (1 partition per core)
        i2 = sizes.index(2)
        out["efficiency_2dev"] = round(
            out["ideal_step_s"][i2] / out["step_s"][i2], 3)

    # ---- attribution of the largest point's overhead (round-5 task):
    # rerun it with registration ABLATED (fusion + fields only).  Fusion
    # is zero-collective by construction and fields moves only 2 boundary
    # planes, so the no-reg overhead bounds pure partition/scheduling
    # cost; the remainder is registration — whose per-shard point math is
    # REPLICATED by design (communication-free): on a real mesh every
    # chip runs its replica concurrently at 1-chip wall-clock, while on a
    # c-core host n replicas serialize n/c-fold.  That emulation excess
    # is subtracted for `efficiency_corrected`; the true collective
    # payload (one fused 44-float psum per LM iteration + two int16
    # boundary planes per fields call) is computed analytically.
    nbig = sizes[-1]
    if nbig > 1:
        big = _run_worker("--weak-worker", f"{nbig},{nbig},noreg")
        big_ideal = _run_worker("--weak-worker", f"1,{nbig},noreg")
        if "error" not in big and "error" not in big_ideal:
            t8, ti8 = out["step_s"][-1], out["ideal_step_s"][-1]
            ov_map = max(0.0, big["sec"] - big_ideal["sec"])
            reg_excess = max(0.0, (t8 - big["sec"])
                             - (ti8 - big_ideal["sec"]))
            y, z = SCALING_CFG["size"][1], SCALING_CFG["size"][2]
            halo_bytes = 2 * 2 * y * z * 2            # 2 dirs x (v,w) int16
            psum_bytes = 44 * 4 * SCALING_CFG["max_iterations"]
            out["attribution"] = {
                "noreg_step_s": round(big["sec"], 4),
                "noreg_ideal_s": round(big_ideal["sec"], 4),
                "partition_overhead_s": round(ov_map, 4),
                "replicated_reg_excess_s": round(reg_excess, 4),
                "collective_bytes_per_step": halo_bytes + psum_bytes,
                "local_bytes_per_device_per_step": 16 * out[
                    "per_device_voxels"],
            }
            out["efficiency_corrected"] = round(
                ti8 / max(t8 - reg_excess, 1e-9), 3)
    out["note"] = (f"weak scaling on a {cores}-core virtual CPU mesh, "
                   "fixed per-device volume; ideal = a 1-device mesh at "
                   "the same total volume.  efficiency_2dev is the "
                   "2-host BASELINE analog (largest non-oversubscribed "
                   "mesh on this host); efficiency_corrected removes the "
                   "emulation-only serialization of registration's "
                   "per-shard replicated point math (measured via the "
                   "no-reg ablation; on a real mesh replicas run "
                   "concurrently and the collective payload is "
                   "~KB/step vs ~29 MB/device of local traffic); one "
                   "TPU chip is attached")
    return out


def main():
    import jax
    import jax.numpy as jnp

    loops = build_slam_loops(FULL)
    K = loops["k"]

    def await_scalar(x):
        return float(np.asarray(x))        # forces real device completion

    # host<->device round-trip cost of one awaited trivial op
    tiny = jnp.zeros((8, 128), jnp.float32)
    trivial = jax.jit(jnp.sum)
    for _ in range(2):
        await_scalar(trivial(tiny))
    rtt = min(min(
        (lambda t0: (await_scalar(trivial(tiny)),
                     time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)), 0.25)

    def timed(fn, *args, reps=3):
        """min wall time of fn awaited, minus round trip, per iteration."""
        await_scalar(fn(*args))            # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            await_scalar(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return max(best - rtt, 1e-9) / K

    # warm state: one fusion so fields/registration see a non-empty map
    warm = jax.block_until_ready(_single_fusion(loops, loops["state"]))

    step_ms = timed(loops["step"], warm, jnp.eye(4, dtype=jnp.float32)) * 1e3
    tsdf_ms = timed(loops["tsdf"], warm) * 1e3
    xor_ms = timed(loops["xor"], warm) * 1e3
    fields_ms = max(timed(loops["fields"], warm) * 1e3 - xor_ms, 0.0)
    fields = jax.block_until_ready(loops["precompute"](warm))
    reg_ms = timed(loops["reg"], fields, warm.pos, warm.offset) * 1e3
    _, reg_iters, _ = loops["reg_once"](fields, warm)
    reg_iters = int(reg_iters)

    # sub-blocks degrade to NaN/error entries instead of killing the
    # whole artifact (the headline step measurement above already ran)
    try:
        feat = build_featsense_loops(FULL)
        e, em, s, sm = feat["features"]
        feat_ms = timed(feat["feat"], feat["scan"]) * 1e3
        odom_ms = timed(feat["odom"], e, em, s, sm) * 1e3
    except Exception as exc:                          # pragma: no cover
        print(f"featsense block failed: {exc!r}", file=sys.stderr)
        feat_ms = odom_ms = float("nan")
    featsense_ms = feat_ms + odom_ms

    try:
        parity = kernel_parity(loops)
    except Exception as exc:                          # pragma: no cover
        parity = {"error": repr(exc)[:300]}
    scaling = measure_scaling()

    scans_per_s = 1000.0 / step_ms
    unit = ("scans/s (fuse+fields+register %.1fms/scan: tsdf %.1f +"
            " fields %.1f + reg %.1f [%d LM iters] = %.1fms; 91M voxels,"
            " 32K pts; featsense front end %.1fms/scan = feat %.1f +"
            " odom %.1f vs 13ms i7 baseline; rtt %.0fms subtracted)"
            % (step_ms, tsdf_ms, fields_ms, reg_ms, reg_iters,
               tsdf_ms + fields_ms + reg_ms, featsense_ms, feat_ms,
               odom_ms, rtt * 1e3))
    # PRELIMINARY artifact line: everything fast is already measured; if
    # the remaining ~25 min of accuracy/app blocks are cut short by a
    # harness timeout, the last complete line still carries the headline
    print(json.dumps({
        "metric": "warpsense_step_scans_per_s", "value": round(scans_per_s, 2),
        "unit": unit, "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 3),
        "scaling": scaling, "kernel_parity": parity,
        "partial": "accuracy/app blocks still running; superseded by the "
                   "final line when present",
    }), flush=True)
    # the CPU box-scene ATE subprocess overlaps the TPU-bound tail
    # (launched after the scaling workers so their CPU timings stay clean)
    import tempfile as _tf
    ate_err = _tf.NamedTemporaryFile("w+", suffix=".ate.err", delete=False)
    # stderr goes to a FILE: an undrained PIPE fills at ~64 KB of backend
    # chatter and blocks the child, silently serializing the overlap
    ate_proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--ate-worker"],
        stdout=subprocess.PIPE, stderr=ate_err, text=True)
    # both adversarial halves run on the TPU: the app loops are tunnel-
    # latency-bound (~0.5-1 s/scan) but the CPU alternative measured
    # 3-4 s/scan for featsense at these shapes
    try:
        adv_inputs = _adversarial_inputs(ADV_CFG)
        adversarial = measure_adversarial_warpsense(inputs=adv_inputs)
    except Exception as exc:                          # pragma: no cover
        adv_inputs, adversarial = None, {"error": repr(exc)[:300]}
    try:
        adversarial.update(measure_adversarial_featsense(inputs=adv_inputs))
    except Exception as exc:                          # pragma: no cover
        adversarial["featsense_error"] = repr(exc)[:300]
    try:
        envelope = measure_fast_envelope()
    except Exception as exc:                          # pragma: no cover
        envelope = {"error": repr(exc)[:300]}
    try:
        app_tp = measure_app_throughput(rtt=rtt)
        ref_poses = app_tp.pop("_warpsense_poses")
    except Exception as exc:                          # pragma: no cover
        app_tp, ref_poses = {"error": repr(exc)[:300]}, None
    try:
        sharded_1dev = measure_sharded_1dev(ref_poses=ref_poses)
    except Exception as exc:                          # pragma: no cover
        sharded_1dev = {"error": repr(exc)[:300]}
    try:
        a_out, _ = ate_proc.communicate(timeout=2400)
        line = a_out.strip().splitlines()[-1] if a_out.strip() else ""
        if line.startswith("{"):
            accuracy = json.loads(line)
        else:
            ate_err.seek(0)
            accuracy = {"error": (ate_err.read() or "no output")[-400:]}
    except Exception as exc:                          # pragma: no cover
        ate_proc.kill()
        accuracy = {"error": repr(exc)[:300]}
    finally:
        ate_err.close()

    print(json.dumps({
        "metric": "warpsense_step_scans_per_s",
        "value": round(scans_per_s, 2),
        "unit": unit,
        "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 3),
        "scaling": scaling,
        "accuracy": accuracy,
        "accuracy_adversarial": adversarial,
        "fast_motion_envelope": envelope,
        "app_throughput": app_tp,
        "sharded_1dev_tpu": sharded_1dev,
        "kernel_parity": parity,
    }))


def _single_fusion(loops, state, cfg=None):
    """One un-looped fusion using the same op the loops use (warm-up)."""
    import jax
    import jax.numpy as jnp
    from warpsense_tpu.core.consts import WEIGHT_RESOLUTION

    cfg = cfg or FULL
    if jax.default_backend() == "tpu":
        from warpsense_tpu.kernels.tsdf_pallas import \
            tsdf_update_projective_pallas as fuse_op
        extra = dict(identity_rot=True)
    else:
        from warpsense_tpu.ops.tsdf_projective import \
            tsdf_update_projective as fuse_op
        extra = {}
    return fuse_op(state, loops["pts"], loops["mask"],
                   jnp.zeros(3, jnp.int32), jnp.eye(3, dtype=jnp.float32),
                   size=cfg["size"], tau=cfg["tau"],
                   max_weight=32 * WEIGHT_RESOLUTION, resolution=cfg["res"],
                   channels=cfg["channels"], columns=cfg["columns"],
                   vfov_deg=cfg["vfov_deg"], **extra)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--scaling-worker":
        _scaling_worker(int(sys.argv[2]))
    elif len(sys.argv) == 3 and sys.argv[1] == "--weak-worker":
        _weak_worker(sys.argv[2])
    elif len(sys.argv) == 2 and sys.argv[1] == "--ate-worker":
        _ate_worker()
    else:
        main()
