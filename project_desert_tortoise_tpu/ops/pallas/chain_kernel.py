"""Fused PLL + polyphase-FIR + AGC Pallas kernel.

One pass over the input produces the post-AGC interp-rate soft stream with
zero HBM round-trips between stages: the PLL advances, its output shifts into
an in-register FIR history (the zero-stuffing interpolator in polyphase form,
taps unrolled as constants), and the AGC consumes the `interp` outputs of the
sample in order.  Lanes are independent demod blocks laid out (S, 128).

Polyphase derivation (matches ops/fir.py): output phase p of input sample i is
    y[i*interp + p] = sum_m h[(N-1-p) - m*interp] * x[i - m],  m = 0..N/interp-1
which is the reference's zero-stuff circular FIR in steady state
(``LowPassFilter.c:58-67``).

State carried across grid windows in VMEM scratch: PLL (6 planes), FIR
history (N/interp planes), AGC gain (1 plane).
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


def _polyphase(taps, interp: int):
    """g[p][m] = h[(N-1-p) - m*interp] as python floats."""
    n = len(taps)
    hist = n // interp
    return [[float(taps[(n - 1 - p) - m * interp]) for m in range(hist)]
            for p in range(interp)]


def _kernel(params, agc_params, poly, interp, window, squelch_after_pll,
            re_ref, im_ref, st_in_ref, out_ref, lock_ref, st_out_ref,
            st_scratch):
    (attack, decay, reference, max_gain, min_gain, squelch_thr) = agc_params
    hist_len = len(poly[0])
    w = pl.program_id(0)

    @pl.when(w == 0)
    def _():
        st_scratch[:] = st_in_ref[:]

    def body(i, _):
        s = st_scratch[:]
        dt = s.dtype
        st = pll_ops.PLLState(
            phase=s[0], freq=s[1], locksig=s[2], avg_phase=s[3],
            sweep=s[4], locked=s[5] > 0.5)
        new, (soft, lock) = pll_ops._step(params, st, re_ref[i], im_ref[i])
        lock_ref[i] = lock
        if squelch_after_pll:
            # |lock|: block relock may settle at the inverted BPSK point
            # (see parallel/blocked.py squelch note)
            soft = jnp.where(jnp.abs(lock) < jnp.asarray(squelch_thr, dt),
                             jnp.zeros_like(soft), soft)

        # shift FIR history (plane 6 = newest)
        hist = [soft] + [s[6 + m] for m in range(hist_len - 1)]

        gain = s[6 + hist_len]
        for p in range(interp):
            y = jnp.zeros_like(soft)
            for m in range(hist_len):
                y = y + jnp.asarray(poly[p][m], dt) * hist[m]
            # AGC step (AGC.c:98-130)
            y = y * gain
            error = jnp.abs(y) - jnp.asarray(reference, dt)
            rate = jnp.where(jnp.abs(error) > gain,
                             jnp.asarray(attack, dt), jnp.asarray(decay, dt))
            gain = gain - error * rate
            gain = jnp.where(gain < 0.0, jnp.asarray(min_gain, dt), gain)
            gain = jnp.where(gain > jnp.asarray(max_gain, dt),
                             jnp.asarray(max_gain, dt), gain)
            out_ref[i * interp + p] = y

        st_scratch[:] = jnp.stack(
            [new.phase, new.freq, new.locksig, new.avg_phase, new.sweep,
             new.locked.astype(dt)] + hist + [gain])
        return 0

    jax.lax.fori_loop(0, window, body, 0)

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = st_scratch[:]


@functools.partial(
    jax.jit,
    static_argnames=("chain_params", "window", "interpret"))
def pll_fir_agc_pallas(chain_params, pll_state, agc_gain, z,
                       window: int = 2048, interpret: bool = False):
    """Fused front half of the chain on (B, L) inputs.

    Returns (pll_state, agc_gain, y (B, L*interp), locksig (B, L)).
    Requires B % 128 == 0 and L % window == 0.
    """
    zre, zim = z
    B, L = zre.shape
    assert B % LANES == 0 and L % window == 0, (B, L, window)
    S = B // LANES
    dt = zre.dtype
    interp = chain_params.interp
    poly = _polyphase(chain_params.taps, interp)
    poly = tuple(tuple(row) for row in poly)
    hist_len = len(poly[0])
    n_state = 6 + hist_len + 1

    agc_params = (chain_params.agc_attack, chain_params.agc_decay,
                  1.0, 5000.0, 10e-5, chain_params.squelch_threshold or 0.0)
    squelch_after_pll = chain_params.squelch_position == "after_pll"

    def to_tiles(a):
        return jnp.moveaxis(a.reshape(S, LANES, L), -1, 0)

    st_in = jnp.concatenate([
        jnp.stack([pll_state.phase, pll_state.freq, pll_state.locksig,
                   pll_state.avg_phase, pll_state.sweep,
                   pll_state.locked.astype(dt)]),
        jnp.zeros((hist_len, B), dt),
        agc_gain[None, :].astype(dt),
    ]).reshape(n_state, S, LANES)

    grid = (L // window,)
    y, lock, st_out = pl.pallas_call(
        functools.partial(_kernel, chain_params.pll, agc_params, poly,
                          interp, window, squelch_after_pll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((n_state, S, LANES), lambda w: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((window * interp, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0)),
            pl.BlockSpec((n_state, S, LANES), lambda w: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L * interp, S, LANES), dt),
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((n_state, S, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((n_state, S, LANES), dt)],
        interpret=interpret,
    )(to_tiles(zre), to_tiles(zim), st_in)

    def from_tiles(a, n):
        return jnp.moveaxis(a, 0, -1).reshape(B, n)

    so = st_out.reshape(n_state, B)
    new_pll = pll_ops.PLLState(
        phase=so[0], freq=so[1], locksig=so[2], avg_phase=so[3], sweep=so[4],
        locked=so[5] > 0.5)
    new_gain = so[6 + hist_len]
    return new_pll, new_gain, from_tiles(y, L * interp), from_tiles(lock, L)
