"""Pallas TPU kernel: registration-field precompute (pack planes).

The XLA roll-based precompute (ops/registration.py precompute_fields_packed*)
materializes every rolled neighbor plane in HBM — measured ~26 ms at the
91M-voxel bench window where the arithmetic is worth ~1.1 GB of traffic
(~1.5 ms at v5e HBM bandwidth).  This kernel streams the window ONCE:
a sequential grid over x slices keeps the previous two (value, weight)
slices in VMEM scratch (each slice crosses HBM exactly once — a
3-shifted-blockspec formulation re-reads every slice three times), the
ring wrap arrives via the (j mod X) index maps, and the in-slice y/z
neighbor shifts are register rolls (pltpu.roll) — no intermediate planes
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


def _pack_from_slices(vm, v0, vp, wm, w0, wp, *, exact, vs=0, gs=0):
    g = _grads(vm, v0, vp, wm, w0, wp)
    if exact:
        vsent = jnp.where(w0 != 0, v0, -32768)
        return _pack16(vsent, g[0]), _pack16(g[1], g[2])
    codes = [jnp.clip(_rshift_round(gi, gs) + 128, 1, 255) for gi in g]
    vcode = jnp.where(w0 != 0,
                      jnp.clip(_rshift_round(v0, vs) + 128, 1, 255), 0)
    return (((vcode << 24) | (codes[0] << 16) | (codes[1] << 8)
             | codes[2]),)


def _rolling_kernel(v_ref, w_ref, *out_and_scratch, exact: bool, vs: int,
                    gs: int):
    """Grid (X+2,), sequential: step j streams IN slice (j mod X) and
    holds the previous two slices in VMEM scratch, so each (value,
    weight) slice crosses HBM exactly ONCE (the naive 3-shifted-blockspec
    form re-reads every slice three times — 6x the input traffic).
    Output for center slice (j-1 mod X) is written from step 2 on; the
    two garbage blocks steps 0/1 emit are re-written by steps X/X+1
    (every center is covered exactly once with valid data, wrap
    included)."""
    j = pl.program_id(0)
    nout = 2 if exact else 1
    outs = out_and_scratch[:nout]
    va, vb, wa, wb = out_and_scratch[nout:]

    @pl.when(j >= 2)
    def _():
        packed = _pack_from_slices(
            va[...].astype(jnp.int32), vb[...].astype(jnp.int32),
            v_ref[0].astype(jnp.int32),
            wa[...].astype(jnp.int32), wb[...].astype(jnp.int32),
            w_ref[0].astype(jnp.int32), exact=exact, vs=vs, gs=gs)
        for o, p in zip(outs, packed):
            o[0] = p

    # rotate the slice cache: (A, B) <- (B, loaded)
    va[...] = vb[...]
    wa[...] = wb[...]
    vb[...] = v_ref[0]
    wb[...] = w_ref[0]


def _rolling_call(value, weight, *, exact, vs=0, gs=0):
    X, Y, Z = value.shape
    in_spec = pl.BlockSpec((1, Y, Z), lambda j: (j % X, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, Y, Z), lambda j: ((j - 1) % X, 0, 0),
                       memory_space=pltpu.VMEM)
    nout = 2 if exact else 1
    return pl.pallas_call(
        functools.partial(_rolling_kernel, exact=exact, vs=vs, gs=gs),
        grid=(X + 2,),
        in_specs=[in_spec, in_spec],
        out_specs=[out] * nout,
        out_shape=[jax.ShapeDtypeStruct((X, Y, Z), jnp.int32)] * nout,
        scratch_shapes=[pltpu.VMEM((Y, Z), jnp.int16)] * 4,
        interpret=_interpret(),
    )(value, weight)


@functools.partial(jax.jit, static_argnames=("tau",))
def precompute_fields_packed_pallas(state: LocalMapState, *,
                                    tau: int) -> PackedFields:
    """Pallas twin of ops.registration.precompute_fields_packed."""
    vs, gs = packed_shifts(tau)
    (plane,) = _rolling_call(state.value, state.weight, exact=False,
                             vs=vs, gs=gs)
    return PackedFields(plane=plane)


@jax.jit
def precompute_fields_packed2_pallas(state: LocalMapState) -> PackedFields2:
    """Pallas twin of ops.registration.precompute_fields_packed2."""
    a, b = _rolling_call(state.value, state.weight, exact=True)
    return PackedFields2(plane_a=a, plane_b=b)
