"""Pallas fusion kernel vs the exact XLA projective twin.

Mirrors the reference's kernel-vs-CPU-twin testing discipline
(test/cuda.cpp: every CUDA kernel validated against its host twin): the
Pallas kernel (kernels/tsdf_pallas.py) must reproduce the XLA sweep
(ops/tsdf_projective.py) bit-for-bit for a level scanner, and must stay a
conservative subset (same values where fused, no spurious fusions) under
tilt, where its beam-window invariant may skip off-column voxels.

Runs in interpret mode on the CPU backend (tests/conftest.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from warpsense_tpu.core.consts import WEIGHT_RESOLUTION
from warpsense_tpu.kernels.tsdf_pallas import (atan2_poly,
                                               tsdf_update_projective_pallas)
from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.ops.tsdf_projective import tsdf_update_projective

SIZE = (48, 48, 32)
TAU, RES = 600, 64
KW = dict(size=SIZE, tau=TAU, max_weight=32 * WEIGHT_RESOLUTION,
          resolution=RES, channels=32, columns=256, vfov_deg=45.0)


def _fresh(size=SIZE):
    return LocalMapState(
        value=jnp.full(size, TAU, jnp.int16),
        weight=jnp.zeros(size, jnp.int16),
        pos=jnp.zeros(3, jnp.int32),
        offset=jnp.asarray([s // 2 for s in size], jnp.int32))


def _room(n=1500, half=1200, zhalf=800, seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    for ax in range(3):
        for s in (-1, 1):
            p = np.stack([rng.uniform(-half, half, n // 6),
                          rng.uniform(-half, half, n // 6),
                          rng.uniform(-zhalf, zhalf, n // 6)], axis=1)
            p[:, ax] = s * (zhalf if ax == 2 else half)
            pts.append(p)
    return jnp.asarray(np.round(np.concatenate(pts)), jnp.int32)


def test_atan2_poly_matches_numpy():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(0, 1e4, (64, 128)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1e4, (64, 128)), jnp.float32)
    got = np.asarray(atan2_poly(y, x))
    want = np.arctan2(np.asarray(y), np.asarray(x))
    assert np.max(np.abs(got - want)) < 1e-5


def test_pallas_bit_parity_level_scanner():
    pts = _room()
    mask = jnp.ones((pts.shape[0],), bool)
    R = jnp.eye(3, dtype=jnp.float32)
    origin = jnp.zeros(3, jnp.int32)
    a = tsdf_update_projective(_fresh(), pts, mask, origin, R, **KW)
    b = tsdf_update_projective_pallas(_fresh(), pts, mask, origin, R, **KW)
    assert np.array_equal(np.asarray(a.value), np.asarray(b.value))
    assert np.array_equal(np.asarray(a.weight), np.asarray(b.weight))
    assert int(np.sum(np.asarray(b.weight) != 0)) > 500  # actually fused

    # second fusion from a shifted scanner exercises the averaging merge
    o2 = jnp.asarray([1, 1, 0], jnp.int32)
    a2 = tsdf_update_projective(a, pts, mask, o2, R, **KW)
    b2 = tsdf_update_projective_pallas(b, pts, mask, o2, R, **KW)
    assert np.array_equal(np.asarray(a2.value), np.asarray(b2.value))
    assert np.array_equal(np.asarray(a2.weight), np.asarray(b2.weight))


def test_pallas_tilted_scanner_conservative_subset():
    """Under tilt the kernel's beam-window invariant may skip voxels whose
    azimuth leaves their column's central beam — but every voxel it DOES
    fuse must carry data consistent with the twin, and coverage must stay
    high at moderate tilt."""
    pts = _room(seed=3)
    mask = jnp.ones((pts.shape[0],), bool)
    ang = np.radians(4.0)
    R = jnp.asarray([[np.cos(ang), 0, np.sin(ang)],
                     [0, 1, 0],
                     [-np.sin(ang), 0, np.cos(ang)]], jnp.float32)
    origin = jnp.zeros(3, jnp.int32)
    a = tsdf_update_projective(_fresh(), pts, mask, origin, R, **KW)
    b = tsdf_update_projective_pallas(_fresh(), pts, mask, origin, R, **KW)
    wa = np.asarray(a.weight) != 0
    wb = np.asarray(b.weight) != 0
    # no spurious fusions (modulo ring-boundary rounding between the twin's
    # arctan2/arcsin and the kernel's shared polynomial: allow a sliver)
    spurious = np.sum(wb & ~wa) / max(np.sum(wb), 1)
    assert spurious < 0.02
    # the W=0 window loses off-column voxels under tilt — which is why the
    # pipeline always bins the Pallas path on a LEVEL grid (see
    # pipeline/warpsense.py _update_tsdf); here just pin the invariant
    coverage = np.sum(wa & wb) / max(np.sum(wa), 1)
    assert coverage > 0.45
    both = wa & wb
    same = np.asarray(a.value)[both] == np.asarray(b.value)[both]
    assert same.mean() > 0.99


def test_pallas_empty_scan_is_identity():
    pts = _room()
    mask = jnp.zeros((pts.shape[0],), bool)
    st = tsdf_update_projective_pallas(
        _fresh(), pts, mask, jnp.zeros(3, jnp.int32),
        jnp.eye(3, dtype=jnp.float32), **KW)
    assert np.all(np.asarray(st.weight) == 0)
    assert np.all(np.asarray(st.value) == TAU)


def test_pallas_level_kernel_bit_parity():
    """identity_rot=True (per-column azimuth, no beam-window test) is
    bit-exact against both the general kernel and the XLA twin at R=I."""
    pts = _room(seed=5)
    mask = jnp.ones((pts.shape[0],), bool)
    R = jnp.eye(3, dtype=jnp.float32)
    origin = jnp.zeros(3, jnp.int32)
    a = tsdf_update_projective(_fresh(), pts, mask, origin, R, **KW)
    b = tsdf_update_projective_pallas(_fresh(), pts, mask, origin, R,
                                      identity_rot=True, **KW)
    assert np.array_equal(np.asarray(a.value), np.asarray(b.value))
    assert np.array_equal(np.asarray(a.weight), np.asarray(b.weight))
    o2 = jnp.asarray([2, -1, 1], jnp.int32)
    a2 = tsdf_update_projective(a, pts, mask, o2, R, **KW)
    b2 = tsdf_update_projective_pallas(b, pts, mask, o2, R,
                                       identity_rot=True, **KW)
    assert np.array_equal(np.asarray(a2.value), np.asarray(b2.value))
    assert np.array_equal(np.asarray(a2.weight), np.asarray(b2.weight))
