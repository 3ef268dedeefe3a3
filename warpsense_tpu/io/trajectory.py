"""Trajectory export + ATE evaluation.

The reference evaluates accuracy externally with evo/HILTI tooling on TUM-
format trajectories (/root/reference/README.md:262-279); this module makes
the framework self-sufficient: TUM read/write plus the standard ATE RMSE
with optional Umeyama SE(3) alignment (what ``evo_ape -a`` computes).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _quat_from_mat(R: np.ndarray) -> np.ndarray:
    """(x, y, z, w) quaternion, numpy double precision."""
    import jax.numpy as jnp

    from ..core.geometry import mat_to_quat
    return np.asarray(mat_to_quat(jnp.asarray(R, jnp.float32)), np.float64)


def _mat_from_quat(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def write_tum(path: str | Path, poses: np.ndarray,
              stamps: np.ndarray | None = None, *, scale: float = 1.0
              ) -> None:
    """poses: (N, 4, 4); translations multiplied by ``scale`` (e.g. 1e-3
    to convert the pipeline's mm poses to meters)."""
    poses = np.asarray(poses, np.float64)
    if stamps is None:
        stamps = np.arange(len(poses), dtype=np.float64)
    with open(path, "w") as f:
        for s, p in zip(stamps, poses):
            t = p[:3, 3] * scale
            q = _quat_from_mat(p[:3, :3])
            f.write(f"{s:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")


def read_tum(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """-> (stamps (N,), poses (N, 4, 4))."""
    rows = np.loadtxt(path).reshape(-1, 8)
    poses = np.tile(np.eye(4), (len(rows), 1, 1))
    poses[:, :3, 3] = rows[:, 1:4]
    for i, q in enumerate(rows[:, 4:8]):
        poses[i, :3, :3] = _mat_from_quat(q)
    return rows[:, 0], poses


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """SE(3) (optionally Sim(3)) alignment src -> dst of (N, 3) point sets.
    Returns (R, t, s)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = float((D * S.diagonal()).sum() / (xs ** 2).sum() * len(src)) \
        if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_errors(estimate: np.ndarray, reference: np.ndarray, *,
               align: bool = True) -> np.ndarray:
    """Per-frame absolute translation errors (N,) in meters over (N, 4, 4)
    pose arrays; with ``align`` the estimate is Umeyama-SE(3)-aligned
    first (evo -a).  The per-frame view backs segment-level drift metrics
    (e.g. the corridor segments of the adversarial accuracy scene)."""
    est = np.asarray(estimate, np.float64)[:, :3, 3]
    ref = np.asarray(reference, np.float64)[:, :3, 3]
    if len(est) != len(ref):
        raise ValueError("trajectory length mismatch")
    if align and len(est) >= 3:
        R, t, s = umeyama_alignment(est, ref)
        est = est @ (s * R).T + t
    return np.sqrt(np.sum((est - ref) ** 2, axis=1))


def ate_rmse(estimate: np.ndarray, reference: np.ndarray, *,
             align: bool = True) -> float:
    """Absolute trajectory error RMSE over (N, 4, 4) pose arrays (meters).
    With ``align`` the estimate is Umeyama-SE(3)-aligned first (evo -a)."""
    return float(np.sqrt(np.mean(
        ate_errors(estimate, reference, align=align) ** 2)))
