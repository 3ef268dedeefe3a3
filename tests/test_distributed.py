"""Multi-host entry helpers, exercised in their single-process degenerate
form on the 8-device virtual CPU mesh (a real 2-host run only changes
process counts; the mesh/global-array construction code is identical)."""
import jax
import jax.numpy as jnp
import numpy as np

from warpsense_tpu.map.local_map import LocalMapState
from warpsense_tpu.parallel.distributed import (gather_state, global_mesh,
                                                host_slab_bounds,
                                                init_distributed,
                                                shard_state_global)
from warpsense_tpu.parallel.sharded import tsdf_update_projective_sharded
from warpsense_tpu.core.consts import WEIGHT_RESOLUTION

SIZE = (80, 41, 41)


def _state():
    return LocalMapState(
        value=np.full(SIZE, 600, np.int16),
        weight=np.zeros(SIZE, np.int16),
        pos=np.zeros(3, np.int32),
        offset=np.asarray([s // 2 for s in SIZE], np.int32))


def test_init_distributed_noop_single_process():
    init_distributed()          # no coordinator, 1 process -> no-op
    assert jax.process_count() == 1


def test_global_mesh_and_sharding_roundtrip():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    st = shard_state_global(_state(), mesh)
    assert st.value.sharding.spec == ("x", None, None)
    back = gather_state(st)
    np.testing.assert_array_equal(back.value, _state().value)

    x0, x1 = host_slab_bounds(mesh, SIZE)
    assert (x0, x1) == (0, SIZE[0])     # single process owns everything


def test_global_state_runs_sharded_fusion():
    mesh = global_mesh()
    st = shard_state_global(_state(), mesh)
    pts = jnp.asarray(np.tile([900, 900, 100], (60, 1)).astype(np.int32))
    mask = jnp.ones((60,), bool)
    out = tsdf_update_projective_sharded(
        st, pts, mask, jnp.zeros(3, jnp.int32), jnp.eye(3, dtype=jnp.float32),
        mesh=mesh, size=SIZE, tau=600, max_weight=32 * WEIGHT_RESOLUTION,
        resolution=64, channels=16, columns=64, vfov_deg=45.0)
    assert int(jnp.sum(out.weight != 0)) > 0
