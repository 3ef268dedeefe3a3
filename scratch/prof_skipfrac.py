"""What fraction of (1, YB, ZB) blocks have zero fused voxels in the bench
scene?  Decides whether per-block skip is worth building."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import room_cloud
from warpsense_tpu.map.local_map import LocalMapState, in_bounds
from warpsense_tpu.ops.tsdf_projective import (_global_coords,
                                               _projective_sweep_xla,
                                               build_beam_table)

TAU, RES = 600, 64
SIZE = (625, 625, 235)
X, Y, Z = SIZE
N = 32766

pts = jnp.asarray(room_cloud(N))
mask = jnp.ones((N,), bool)
state = LocalMapState(
    value=jnp.full(SIZE, TAU, jnp.int16),
    weight=jnp.zeros(SIZE, jnp.int16),
    pos=jnp.zeros(3, jnp.int32),
    offset=jnp.asarray([s // 2 for s in SIZE], jnp.int32))
scanner_mm = jnp.zeros(3, jnp.int32) * RES + RES // 2

cell = jnp.floor_divide(pts, RES)
m = mask & in_bounds(cell, state.pos, jnp.asarray(SIZE), -(TAU // RES // 2))
rng_tab, endpoint = build_beam_table(pts, m, scanner_mm,
                                     jnp.eye(3, dtype=jnp.float32),
                                     channels=128, columns=1024,
                                     vfov_deg=45.0)


SHAPES = ((64, 128), (64, 256), (32, 128), (128, 256))


@jax.jit
def touched():
    new_v, new_w = _projective_sweep_xla(
        state, rng_tab, endpoint, scanner_mm, jnp.eye(3, dtype=jnp.float32),
        size=SIZE, tau=TAU, resolution=RES, channels=128, columns=1024,
        vfov_deg=45.0)
    t = (new_w != 0)
    # pad to block multiples
    t = jnp.pad(t, ((0, 0), (0, 640 - Y), (0, 256 - Z)))
    fracs = []
    for yb, zb in SHAPES:
        blocks = t.reshape(X, 640 // yb, yb, 256 // zb, zb)
        fracs.append(blocks.any(axis=(2, 4)).mean())
    return t.sum(), jnp.stack(fracs)


tot, fr = touched()
print("touched voxels:", int(tot))
for (yb, zb), f in zip(SHAPES, np.asarray(fr)):
    print(f"yb={yb} zb={zb}: touched block frac {f:.3f}")
print("endpoint abs max (mm):",
      float(jnp.max(jnp.where(jnp.isfinite(rng_tab)[:, None],
                              jnp.abs(endpoint), 0.0))))
