"""Fully fused demod kernel, v4: v1's register-resident single loop +
v3's hoisted PLL transcendentals.  The best measured configuration.

Round-2 kernel lineage (all numbers: one v5e chip, B=1024 = 8 sublane
lane-groups, 118 784-sample blocks, dispatch-to-fetch):

* v1 (``fused_kernel.py``): one fori_loop carrying every stage in vector
  registers — 978 Msps.  Its per-step chain still pays sin + cos + two
  ``arctan2_approx`` + ``q_rsqrt`` inside the PLL.
* v3 (``fused_kernel3.py``): split serial passes through VMEM scratch —
  *slower* (875 Msps): the per-sample VMEM row round-trips between passes
  cost more than the longer register chain they removed.  Lesson: on TPU
  the loop-carried chain lives in vregs; never stage per-sample values
  through scratch.
* v4 (this file): keep v1's structure — single loop, shift-register rings,
  FIR history in registers — and remove ops from the chain instead:

  1. the input-only quantities ``arctan2_approx(zim, zre)``, ``|z|``, and
     ``|z| * q_rsqrt(|z|^2)`` are computed *outside* the kernel (vectorized
     XLA pass over the whole block) and streamed in as planes;
  2. the mixer is rewritten through the rotation identity:
     ``out = zim*cos(phi) - zre*sin(phi) == |z| * sin(wrap(ang - phi))``
     and the rotated-frame angle ``atan2(out, pll_re)`` *is* the wrapped
     phase error — so the in-loop PLL reduces to one short-polynomial
     sincos (Taylor-9/8 on the folded quadrant) plus the loop filter.

Reference semantics: ``POESTIPdemod/main.c:373-492`` chain,
``common/CarrierTrackingPLL.c`` PLL (error path numerically identical —
same ``arctan2_approx`` angle feeds the loop filter).  Like v2/v3, the
soft-symbol amplitude is ulp-close rather than bit-equal to v1; the binding
contract is frame-level golden parity (tests/test_pallas_fused4.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from project_desert_tortoise_tpu.ops.fastmath import (arctan2_approx, q_rsqrt,
                                                      sign)
from project_desert_tortoise_tpu.ops.pallas.chain_kernel import _polyphase
from project_desert_tortoise_tpu.ops.pallas.fused_kernel3 import _sincos_folded

LANES = 128
RING = 16


def _ring_read(ring_planes, age):
    """age: (S,128) int32, 0 = newest; unrolled compare-select over the
    shift-register ring."""
    acc = jnp.zeros_like(ring_planes[0])
    for k in range(RING):
        acc = jnp.where(age == k, ring_planes[k], acc)
    return acc


def _kernel(cp, agc_params, poly, interp, window, squelch_pos,
            ang_ref, mag_ref, nrm_ref, tn_ref, st_in_ref,
            bit_ref, btime_ref, emit_ref, st_out_ref, st_scratch):
    (attack, decay, reference, max_gain, min_gain, squelch_thr) = agc_params
    pp = cp.pll
    hist_len = len(poly[0])
    # state plane layout (identical to fused_kernel.py)
    P0 = 0
    H0 = 6
    G0 = H0 + hist_len
    R0 = G0 + 1
    T0 = R0 + RING
    GD = T0 + RING
    MA = GD + 3

    w = pl.program_id(0)

    @pl.when(w == 0)
    def _():
        st_scratch[:] = st_in_ref[:]

    n_state = MA + 5
    s0 = st_scratch[:]

    def body(i, carry):
        s = carry
        dt = s[0].dtype
        c = lambda v: jnp.asarray(v, dt)
        two_pi = c(2.0 * np.pi)
        pi = c(np.pi)

        # ---- PLL with hoisted transcendentals (see module docstring) ----
        phase, freq = s[P0], s[P0 + 1]
        locksig, avg_phase = s[P0 + 2], s[P0 + 3]
        sweep, locked = s[P0 + 4], s[P0 + 5] > c(0.5)

        e = ang_ref[i] - phase
        e = jnp.where(e > pi, e - two_pi, jnp.where(e < -pi, e + two_pi, e))
        avg_phase = (avg_phase * (1.0 - c(pp.avg_phase_alpha))
                     + c(pp.avg_phase_alpha) * jnp.abs(e))
        s_e, c_e = _sincos_folded(e, dt)
        soft = mag_ref[i] * s_e
        lockproj = nrm_ref[i] * c_e
        locksig = (locksig * (1.0 - c(pp.lock_alpha))
                   + c(pp.lock_alpha) * lockproj)

        alpha = jnp.where(locked, c(pp.alpha_track), c(pp.alpha_acq))
        beta = jnp.where(locked, c(pp.beta_track), c(pp.beta_acq))
        freq = freq + beta * e
        phase = phase + freq + alpha * e
        phase = jnp.where(phase > two_pi, phase - two_pi,
                          jnp.where(phase < -two_pi, phase + two_pi, phase))
        freq = jnp.clip(freq, c(-pp.max_freq), c(pp.max_freq))

        sweeping = (jnp.abs(c(np.pi / 2.0) - avg_phase)
                    < c(pp.sweep_threshold)) & ~locked
        freq_swept = freq + sweep
        at_edge = ((freq_swept >= c(pp.max_freq))
                   | (freq_swept <= c(-pp.max_freq)))
        sweep_new = jnp.where(
            at_edge, -sweep,
            jnp.where(freq_swept >= 0, jnp.abs(sweep), -jnp.abs(sweep)))
        freq = jnp.where(sweeping, freq_swept, freq)
        sweep = jnp.where(sweeping, sweep_new, sweep)
        locked = locked | (locksig > c(pp.lock_threshold))
        lock = locksig

        if squelch_pos == "after_pll":
            soft = jnp.where(lock < c(squelch_thr), jnp.zeros_like(soft),
                             soft)

        # ---- FIR + AGC + ring + Gardner + Manchester: as fused_kernel.py --
        hist = [soft] + [s[H0 + m] for m in range(hist_len - 1)]
        gain = s[G0]
        ring_v = [s[R0 + k] for k in range(RING)]
        ring_t = [s[T0 + k] for k in range(RING)]
        tval_in = tn_ref[i]

        j_base = (w * window + i) * interp
        produced = []
        for p in range(interp):
            y = jnp.zeros_like(soft)
            for m in range(hist_len):
                y = y + c(poly[p][m]) * hist[m]
            y = y * gain
            error = jnp.abs(y) - c(reference)
            rate = jnp.where(jnp.abs(error) > gain, c(attack), c(decay))
            gain = gain - error * rate
            gain = jnp.where(gain < 0.0, c(min_gain), gain)
            gain = jnp.where(gain > c(max_gain), c(max_gain), gain)
            if squelch_pos == "after_agc":
                y = jnp.where(lock < c(squelch_thr), jnp.zeros_like(y), y)
            produced.append(y)
        ring_v = produced[::-1] + ring_v[:RING - interp]
        ring_t = [tval_in] * interp + ring_t[:RING - interp]

        ns, half_raw, prev_bit = s[GD], s[GD + 1], s[GD + 2]
        j_hi = j_base + interp - 1
        target = jnp.round(ns)
        emit_sym = target <= j_hi
        tgt_i = jnp.maximum(target.astype(jnp.int32), 0)
        age = jnp.clip(j_hi - tgt_i, 0, RING - 1)
        cur = _ring_read(ring_v, age)
        sym_t = _ring_read(ring_t, age)
        hidx = jnp.round(half_raw).astype(jnp.int32)
        hage = j_hi - hidx
        h_in_ring = (hidx >= 0) & (hage >= 0) & (hage < RING)
        hval = jnp.where(h_in_ring,
                         _ring_read(ring_v, jnp.clip(hage, 0, RING - 1)),
                         jnp.zeros_like(cur))

        err = jnp.clip(c(cp.gardner_gain) * (cur - prev_bit) * hval,
                       c(-cp.gardner_err_limit), c(cp.gardner_err_limit))
        ns_adj = ns - err
        half_new = ns_adj + c(cp.step_size) / 2.0
        ns_new = ns_adj + c(cp.step_size)
        ns = jnp.where(emit_sym, ns_new, ns)
        half_raw = jnp.where(emit_sym, half_new, half_raw)
        prev_bit = jnp.where(emit_sym, cur, prev_bit)

        clockmod, evenodd = s[MA], s[MA + 1]
        mcur, mprev, mprevprev = s[MA + 2], s[MA + 3], s[MA + 4]
        prevprev = mprev
        prev = mcur
        thr = c(cp.resync_threshold)
        mismatch = evenodd != clockmod
        strong = (jnp.abs(prevprev) > thr) & (jnp.abs(prev) > thr)
        resync = mismatch & (sign(prevprev) == sign(prev)) & strong
        clockmod_n = jnp.where(resync, evenodd, clockmod)
        boundary = evenodd == clockmod_n
        use_prev = jnp.abs(prev) > jnp.abs(cur)
        bit = jnp.where(use_prev, (prev > 0).astype(dt),
                        1.0 - (cur > 0).astype(dt))
        emit_bit = emit_sym & boundary

        bit_ref[i] = bit
        btime_ref[i] = sym_t
        emit_ref[i] = emit_bit.astype(dt)

        clockmod = jnp.where(emit_sym, clockmod_n, clockmod)
        evenodd = jnp.where(emit_sym,
                            jnp.remainder(evenodd + 1.0, 2.0), evenodd)
        mcur = jnp.where(emit_sym, cur, mcur)
        mprev = jnp.where(emit_sym, prev, mprev)
        mprevprev = jnp.where(emit_sym, prevprev, mprevprev)

        return tuple(
            [phase, freq, locksig, avg_phase, sweep, locked.astype(dt)]
            + hist + [gain] + ring_v + ring_t
            + [ns, half_raw, prev_bit]
            + [clockmod, evenodd, mcur, mprev, mprevprev])

    final = jax.lax.fori_loop(
        0, window, body, tuple(s0[k] for k in range(n_state)))
    st_scratch[:] = jnp.stack(list(final))

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = st_scratch[:]


@functools.partial(jax.jit,
                   static_argnames=("chain_params", "window", "interpret"))
def fused_demod_pallas4(chain_params, pll_state, agc_gain, z, t_next,
                        window: int = 256, interpret: bool = False):
    """Full chain on (B, L) blocks; B % 128 == 0, L % window == 0.

    Interface-compatible with fused_kernel.fused_demod_pallas: returns
    (bits (B, L), bit_times (B, L), emit_mask (B, L) bool, avg_phase (B,)).
    """
    zre, zim = z
    B, L = zre.shape
    assert B % LANES == 0 and L % window == 0, (B, L, window)
    S = B // LANES
    dt = zre.dtype
    interp = chain_params.interp
    poly = tuple(tuple(r) for r in _polyphase(chain_params.taps, interp))
    hist_len = len(poly[0])
    n_state = 6 + hist_len + 1 + 2 * RING + 3 + 5

    agc_params = (chain_params.agc_attack, chain_params.agc_decay,
                  1.0, 5000.0, 10e-5, chain_params.squelch_threshold or 0.0)

    # hoisted input-only quantities (one fused XLA elementwise pass)
    ang = arctan2_approx(zim, zre)
    mag2 = zre * zre + zim * zim
    mag = jnp.sqrt(mag2)
    nrm = mag * q_rsqrt(mag2)   # carries the reference's q_rsqrt error

    def to_tiles(a):
        return jnp.moveaxis(a.reshape(S, LANES, L), -1, 0)

    st_in = jnp.concatenate([
        jnp.stack([pll_state.phase, pll_state.freq, pll_state.locksig,
                   pll_state.avg_phase, pll_state.sweep,
                   pll_state.locked.astype(dt)]),
        jnp.zeros((hist_len + 1 + 2 * RING + 3 + 5, B), dt)
        .at[hist_len].set(agc_gain.astype(dt)),
    ]).reshape(n_state, S, LANES)

    grid = (L // window,)
    spec_w = pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0))
    spec_s = pl.BlockSpec((n_state, S, LANES), lambda w: (0, 0, 0))
    bits, btimes, emit, st_out = pl.pallas_call(
        functools.partial(_kernel, chain_params, agc_params, poly, interp,
                          window, chain_params.squelch_position),
        grid=grid,
        in_specs=[spec_w, spec_w, spec_w, spec_w, spec_s],
        out_specs=[spec_w, spec_w, spec_w, spec_s],
        out_shape=[
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((n_state, S, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((n_state, S, LANES), dt)],
        interpret=interpret,
    )(to_tiles(ang), to_tiles(mag), to_tiles(nrm), to_tiles(t_next), st_in)

    def from_tiles(a):
        return jnp.moveaxis(a, 0, -1).reshape(B, L)

    so = st_out.reshape(n_state, B)
    avg_phase = so[3]
    return (from_tiles(bits), from_tiles(btimes),
            from_tiles(emit) > 0.5, avg_phase)
