"""Pallas TPU kernel for the Costas PLL scan.

The XLA `lax.scan` version streams its per-step inputs through the loop; this
kernel instead keeps the whole machinery on-core: the grid walks time windows
(Pallas auto-double-buffers each (W, B) window HBM->VMEM), the loop state
lives in VMEM scratch that persists across grid steps, and each `fori_loop`
iteration advances ALL block lanes — laid out as (B//128, 128) vregs — through
the exact same step math as `ops.pll._step` (imported, not duplicated).

Layout contract: lanes-last. Inputs (B, L) are transposed to (L, S, 128) with
S = B // 128, so each time step reads one contiguous (S, 128) tile.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from project_desert_tortoise_tpu.ops import pll as pll_ops

LANES = 128


def _kernel(params, window, re_ref, im_ref, st_in_ref, out_ref, lock_ref,
            st_out_ref, st_scratch):
    w = pl.program_id(0)

    @pl.when(w == 0)
    def _():
        st_scratch[:] = st_in_ref[:]

    s0 = st_scratch[:]

    def body(i, s):
        st = pll_ops.PLLState(
            phase=s[0], freq=s[1], locksig=s[2], avg_phase=s[3],
            sweep=s[4], locked=s[5] > 0.5)
        new, (out, lock) = pll_ops._step(params, st, re_ref[i], im_ref[i])
        out_ref[i] = out
        lock_ref[i] = lock
        return (new.phase, new.freq, new.locksig, new.avg_phase, new.sweep,
                new.locked.astype(out.dtype))

    final = jax.lax.fori_loop(0, window, body,
                              tuple(s0[k] for k in range(6)))
    st_scratch[:] = jnp.stack(list(final))

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = st_scratch[:]


@functools.partial(jax.jit,
                   static_argnames=("params", "window", "interpret"))
def pll_scan_pallas(params: pll_ops.PLLParams, state: pll_ops.PLLState, z,
                    window: int = 2048, interpret: bool = False):
    """Drop-in for pll_scan on (B, L) inputs with B % 128 == 0 and
    L % window == 0.  Returns (state, out, locksig)."""
    zre, zim = z
    B, L = zre.shape
    assert B % LANES == 0, B
    assert L % window == 0, (L, window)
    S = B // LANES
    dt = zre.dtype

    def to_tiles(a):  # (B, L) -> (L, S, 128)
        return jnp.moveaxis(a.reshape(S, LANES, L), -1, 0)

    re_t = to_tiles(zre)
    im_t = to_tiles(zim)
    st_in = jnp.stack([
        state.phase, state.freq, state.locksig, state.avg_phase, state.sweep,
        state.locked.astype(dt)]).reshape(6, S, LANES)

    grid = (L // window,)
    out, lock, st_out = pl.pallas_call(
        functools.partial(_kernel, params, window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((6, S, LANES), lambda w: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((6, S, LANES), lambda w: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((6, S, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((6, S, LANES), dt)],
        interpret=interpret,
    )(re_t, im_t, st_in)

    def from_tiles(a):  # (L, S, 128) -> (B, L)
        return jnp.moveaxis(a, 0, -1).reshape(B, L)

    so = st_out.reshape(6, B)
    new_state = pll_ops.PLLState(
        phase=so[0], freq=so[1], locksig=so[2], avg_phase=so[3], sweep=so[4],
        locked=so[5] > 0.5)
    return new_state, from_tiles(out), from_tiles(lock)
