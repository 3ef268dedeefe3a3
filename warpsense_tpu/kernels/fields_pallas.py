"""Pallas TPU kernel: registration-field precompute (pack planes).

The XLA roll-based precompute (ops/registration.py precompute_fields_packed*)
materializes every rolled neighbor plane in HBM — measured ~26 ms at the
91M-voxel bench window where the arithmetic is worth ~1.7 GB of traffic
(~2 ms at v5e HBM bandwidth).  This kernel streams the window once:
grid over x slices, the x-neighbor slices arrive via (i +- 1) mod X block
index maps (the ring wrap the XLA twin gets from jnp.roll), and the in-slice
y/z neighbor shifts are register rolls (pltpu.roll) — no intermediate planes
ever touch HBM.

Semantics are exactly ops/registration.py's packed precompute (fast-path
fields: weight-validity gradient masking WITHOUT the parity path's
sign-change rejection — see precompute_fields_packed); parity is asserted
against the XLA twin in tests/test_registration_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..map.local_map import LocalMapState
from ..ops.registration import (PackedFields, PackedFields2, _pack16,
                                packed_shifts)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _div2_trunc(d: jax.Array) -> jax.Array:
    # C-style (nv - pv) / 2: truncate toward zero (>> 1 floors)
    q = jnp.abs(d) >> 1
    return jnp.where(d < 0, -q, q)


def _grads(vm, v0, vp, wm, w0, wp):
    """Per-axis central differences for one x slice; (Y, Z) int32 blocks.

    Gradient valid where BOTH neighbors are weighted (no sign-change
    rejection — fast-path semantics, ops/registration.py)."""
    def roll(a, s, ax):
        # pltpu.roll rejects negative shifts; jnp.roll(a, -1) == roll(n-1)
        return pltpu.roll(a, (a.shape[ax] + s) % a.shape[ax], ax)

    grads = []
    okx = (wp != 0) & (wm != 0)
    grads.append(jnp.where(okx, _div2_trunc(vp - vm), 0))
    for ax in (0, 1):
        nv, pv = roll(v0, -1, ax), roll(v0, 1, ax)
        nw, pw = roll(w0, -1, ax), roll(w0, 1, ax)
        ok = (nw != 0) & (pw != 0)
        grads.append(jnp.where(ok, _div2_trunc(nv - pv), 0))
    return grads


def _rshift_round(x: jax.Array, s: int) -> jax.Array:
    return (x + (1 << s >> 1)) >> s if s else x


def _kernel_packed(vm_ref, v0_ref, vp_ref, wm_ref, w0_ref, wp_ref, out_ref,
                   *, vs: int, gs: int):
    v0 = v0_ref[0].astype(jnp.int32)
    w0 = w0_ref[0].astype(jnp.int32)
    g = _grads(vm_ref[0].astype(jnp.int32), v0, vp_ref[0].astype(jnp.int32),
               wm_ref[0].astype(jnp.int32), w0, wp_ref[0].astype(jnp.int32))
    codes = [jnp.clip(_rshift_round(gi, gs) + 128, 1, 255) for gi in g]
    vcode = jnp.where(w0 != 0,
                      jnp.clip(_rshift_round(v0, vs) + 128, 1, 255), 0)
    out_ref[0] = ((vcode << 24) | (codes[0] << 16) | (codes[1] << 8)
                  | codes[2])


def _kernel_packed2(vm_ref, v0_ref, vp_ref, wm_ref, w0_ref, wp_ref,
                    a_ref, b_ref):
    v0 = v0_ref[0].astype(jnp.int32)
    w0 = w0_ref[0].astype(jnp.int32)
    g = _grads(vm_ref[0].astype(jnp.int32), v0, vp_ref[0].astype(jnp.int32),
               wm_ref[0].astype(jnp.int32), w0, wp_ref[0].astype(jnp.int32))
    vsent = jnp.where(w0 != 0, v0, -32768)
    a_ref[0] = _pack16(vsent, g[0])
    b_ref[0] = _pack16(g[1], g[2])


def _specs(X: int, Y: int, Z: int):
    def shifted(d):
        return pl.BlockSpec((1, Y, Z),
                            lambda i, d=d: ((i + d) % X, 0, 0),
                            memory_space=pltpu.VMEM)
    ins = [shifted(-1), shifted(0), shifted(1)] * 2
    out = pl.BlockSpec((1, Y, Z), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return ins, out


@functools.partial(jax.jit, static_argnames=("tau",))
def precompute_fields_packed_pallas(state: LocalMapState, *,
                                    tau: int) -> PackedFields:
    """Pallas twin of ops.registration.precompute_fields_packed."""
    vs, gs = packed_shifts(tau)
    X, Y, Z = state.value.shape
    ins, out = _specs(X, Y, Z)
    plane = pl.pallas_call(
        functools.partial(_kernel_packed, vs=vs, gs=gs),
        grid=(X,),
        in_specs=ins,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.int32),
        interpret=_interpret(),
    )(state.value, state.value, state.value,
      state.weight, state.weight, state.weight)
    return PackedFields(plane=plane)


@jax.jit
def precompute_fields_packed2_pallas(state: LocalMapState) -> PackedFields2:
    """Pallas twin of ops.registration.precompute_fields_packed2."""
    X, Y, Z = state.value.shape
    ins, out = _specs(X, Y, Z)
    a, b = pl.pallas_call(
        _kernel_packed2,
        grid=(X,),
        in_specs=ins,
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((X, Y, Z), jnp.int32),
                   jax.ShapeDtypeStruct((X, Y, Z), jnp.int32)],
        interpret=_interpret(),
    )(state.value, state.value, state.value,
      state.weight, state.weight, state.weight)
    return PackedFields2(plane_a=a, plane_b=b)
