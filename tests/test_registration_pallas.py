"""Parity: Pallas field-precompute kernels vs their XLA twins."""
import numpy as np
import jax.numpy as jnp

from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.ops.registration import (precompute_fields_packed,
                                            precompute_fields_packed2)
from warpsense_tpu.kernels.fields_pallas import (
    precompute_fields_packed_pallas, precompute_fields_packed2_pallas)

TAU = 600


def random_state(rng, size=(37, 29, 23)):
    v = rng.integers(-TAU, TAU + 1, size, dtype=np.int64).astype(np.int16)
    w = (rng.random(size) < 0.7).astype(np.int16) * \
        rng.integers(1, 64, size).astype(np.int16)
    return LocalMapState(value=jnp.asarray(v), weight=jnp.asarray(w),
                         pos=jnp.asarray([3, -2, 5], jnp.int32),
                         offset=jnp.asarray([7, 11, 2], jnp.int32))


def test_packed_fields_pallas_parity():
    state = random_state(np.random.default_rng(0))
    ref = precompute_fields_packed(state, tau=TAU)
    ker = precompute_fields_packed_pallas(state, tau=TAU)
    np.testing.assert_array_equal(np.asarray(ref.plane),
                                  np.asarray(ker.plane))


def test_packed2_fields_pallas_parity():
    state = random_state(np.random.default_rng(1))
    ref = precompute_fields_packed2(state)
    ker = precompute_fields_packed2_pallas(state)
    np.testing.assert_array_equal(np.asarray(ref.plane_a),
                                  np.asarray(ker.plane_a))
    np.testing.assert_array_equal(np.asarray(ref.plane_b),
                                  np.asarray(ker.plane_b))
