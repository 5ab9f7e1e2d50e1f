"""Fully fused demod kernel, v3: split serial passes + hoisted transcendentals.

Same chain contract as fused_kernel.py / fused_kernel2.py (PLL -> polyphase
FIR interp -> AGC -> Gardner -> Manchester, reference semantics from
``POESTIPdemod/main.c:373-492``), restructured around what actually bounds
the fused kernels on TPU: the *latency of the loop-carried dependency chain*,
not FLOPs.  v1/v2 serialize every stage inside one per-sample ``fori_loop``
iteration, so each input sample pays

    PLL(sin+cos+2x atan2+rsqrt) -> 26-tap FIR x interp -> AGC -> ring ->
    Gardner one-hots -> Manchester

end to end.  v3 cuts that chain three ways:

1. **Hoist input-only transcendentals.**  The PLL's phase detector uses
   ``arctan2_approx(zim, zre)`` (``common/CarrierTrackingPLL.c:190``) and the
   lock detector normalizes by ``q_rsqrt(|z|^2)`` — both depend on the
   *input* only, so they are computed vectorized over the whole block
   *outside* the kernel (fully parallel VPU work) and streamed in as
   per-sample planes (angle, magnitude, q_rsqrt-normalized length).

2. **Identity-rewrite the mixer.**  The reference computes
   ``out = zim*cos(phi) - zre*sin(phi)`` and
   ``atan2(out, pll_re)``; but ``(pll_re, out)`` is just ``z`` rotated by
   ``-phi``, so ``out = |z| * sin(wrap(ang - phi))`` and the rotated angle
   *is* the already-computed phase error.  The serial loop then needs one
   short-polynomial sincos (Taylor-9 on the folded quadrant, ~2e-7 abs err)
   instead of sin+cos+atan2 per step — and no divides.

3. **Split the window into three passes.**  Per 512-sample window: a minimal
   serial PLL pass (writes soft symbols to VMEM scratch), a *vectorized*
   polyphase FIR pass over the whole window (static-slice MACs, full (8,128)
   VPU utilization — the FIR leaves the serial chain entirely), and a serial
   AGC+Gardner+Manchester pass (ring shift-registers in vregs like v2).
   Each pass's carried chain is a fraction of the monolithic one.

Numerics: the loop-filter error path is *identical* to the reference
(same ``arctan2_approx``); the soft-symbol amplitude differs by the sincos
polynomial + true-vs-approx angle delta (~0.005 rad worst case from the
reference's own atan2 approximation).  As with v2, frame-level golden parity
is the contract (tests/test_pallas_fused3.py, tests/test_golden_poes.py).

Sublane batching: ``B = S * 128`` packs S independent lane-groups into the
vreg *sublane* dimension — every (1, S, 128) plane op advances S groups at
once (S=8 fills the (8, 128) vreg exactly), so the serial chain's latency is
amortized 8-fold.  State persists across the window grid dimension.
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

LANES = 128
RING = 16

# Taylor sincos on the folded quadrant [-pi/2, pi/2]; abs err <= 2.5e-7.
_S3, _S5, _S7, _S9 = -1.0 / 6, 1.0 / 120, -1.0 / 5040, 1.0 / 362880
_C2, _C4, _C6, _C8 = -0.5, 1.0 / 24, -1.0 / 720, 1.0 / 40320


def _sincos_folded(e, dt):
    """sin/cos of e in [-pi, pi] via quadrant folding + Taylor-9/8."""
    c = lambda v: jnp.asarray(v, dt)
    half_pi = c(np.pi / 2.0)
    flip = jnp.abs(e) > half_pi
    x = jnp.where(flip, jnp.where(e > 0, c(np.pi) - e, c(-np.pi) - e), e)
    x2 = x * x
    s = x * (c(1.0) + x2 * (c(_S3) + x2 * (c(_S5) + x2 * (c(_S7)
                                                          + x2 * c(_S9)))))
    co = c(1.0) + x2 * (c(_C2) + x2 * (c(_C4) + x2 * (c(_C6) + x2 * c(_C8))))
    return s, jnp.where(flip, -co, co)


def _onehot_read(packed, idx):
    """packed: (K, S, 128); idx: (1, S, 128) int32 in [0, K).  Exact — a
    single element survives the mask per (sublane, lane) position."""
    k, ss = packed.shape[0], packed.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, ss, LANES), 0)
    return jnp.sum(jnp.where(iota == idx, packed, 0), axis=0, keepdims=True)


def _kernel(cp, agc_params, poly, interp, window, squelch_pos, tring, unroll,
            ang_ref, mag_ref, nrm_ref, tn_ref, taps_ref, st_in_ref,
            bit_ref, btime_ref, emit_ref, st_out_ref,
            st_scratch, soft_scr, y_scr):
    # every plane is (1, S, LANES): S lane-groups batched into vreg sublanes
    (attack, decay, reference, max_gain, min_gain, squelch_thr) = agc_params
    pp = cp.pll
    hist_len = len(poly[0])
    H = hist_len - 1
    # state row layout: 6 pll, 1 gain, 3 gardner, 5 manchester, H fir tail,
    # RING agc-output ring, tring input-time ring
    P0, G0, GD, MA, H0 = 0, 6, 7, 10, 15
    R0 = H0 + H
    T0 = R0 + RING
    n_state = T0 + tring

    w = pl.program_id(0)

    @pl.when(w == 0)
    def _():
        st_scratch[:] = st_in_ref[:]

    s0 = st_scratch[:]
    dt = s0.dtype
    c = lambda v: jnp.asarray(v, dt)
    two_pi = c(2.0 * np.pi)
    pi = c(np.pi)

    # ---- pass A: serial PLL; everything input-only already hoisted --------
    if squelch_pos == "after_agc":
        raise NotImplementedError(
            "squelch_position='after_agc' not supported in fused3; "
            "use fused/fused2")
    soft_scr[pl.ds(0, H)] = s0[H0:R0]          # FIR history tail

    def unrolled(body, n, carry):
        def outer(k, cy):
            for u in range(unroll):
                cy = body(k * unroll + u, cy)
            return cy
        # Mosaic only lowers fori_loop with unroll=1 or full unroll, so the
        # partial unroll is done by hand
        return jax.lax.fori_loop(0, n // unroll, outer, carry, unroll=1)

    def pll_body(i, carry):
        (phase, freq, locksig, avg_phase, sweep, lockedf) = carry
        locked = lockedf > c(0.5)
        ang = ang_ref[pl.ds(i, 1)]
        e = ang - phase
        e = jnp.where(e > pi, e - two_pi, jnp.where(e < -pi, e + two_pi, e))
        # the rotated-frame phase == the wrapped error (identity rewrite)
        avg_phase = (avg_phase * (1.0 - c(pp.avg_phase_alpha))
                     + c(pp.avg_phase_alpha) * jnp.abs(e))
        s_e, c_e = _sincos_folded(e, dt)
        soft = mag_ref[pl.ds(i, 1)] * s_e
        lockproj = nrm_ref[pl.ds(i, 1)] * c_e
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

        if squelch_pos == "after_pll":
            soft = jnp.where(locksig < c(squelch_thr),
                             jnp.zeros_like(soft), soft)
        soft_scr[pl.ds(H + i, 1)] = soft
        return (phase, freq, locksig, avg_phase, sweep, locked.astype(dt))

    carry0 = (s0[0:1], s0[1:2], s0[2:3], s0[3:4], s0[4:5], s0[5:6])
    final_pll = unrolled(pll_body, window, carry0)
    new_tail = soft_scr[pl.ds(window, H)]      # last H softs for next window

    # ---- pass B: vectorized polyphase FIR over the whole window ----------
    # fori over taps bounds liveness to one accumulator + one slice: the
    # fully unrolled 78-slice accumulation chain kept every window-sized
    # temporary live and blew the 16M VMEM stack limit (axis 0 of the
    # (H+window, S, 128) scratch is untiled, so dynamic-offset row slices
    # are free)
    for p in range(interp):
        def fir_body(m, acc, _p=p):
            tap = taps_ref[pl.ds(_p * hist_len + m, 1)]
            # hist[m] = soft[i - m]  ->  rows [H - m, H - m + window)
            return acc + tap * soft_scr[pl.ds(H - m, window)]
        y_scr[p] = jax.lax.fori_loop(
            0, hist_len, fir_body,
            jnp.zeros((window,) + soft_scr.shape[1:], dt), unroll=1)

    # ---- pass C: serial AGC + Gardner + Manchester ------------------------
    def tim_body(i, carry):
        (gain, gd3, ma5, ring_v, ring_t) = carry
        tval_in = tn_ref[pl.ds(i, 1)]
        produced = []
        g = gain
        for p in range(interp):
            y = y_scr[p, pl.ds(i, 1)] * g
            error = jnp.abs(y) - c(reference)
            rate = jnp.where(jnp.abs(error) > g, c(attack), c(decay))
            g = g - error * rate
            g = jnp.where(g < 0.0, c(min_gain), g)
            g = jnp.where(g > c(max_gain), c(max_gain), g)
            produced.append(y)
        gain = g

        ring_v = jnp.concatenate(produced[::-1] + [ring_v[:RING - interp]], 0)
        ring_t = jnp.concatenate([tval_in, ring_t[:tring - 1]], 0)

        ns, half_raw, prev_bit = gd3[0:1], gd3[1:2], gd3[2:3]
        j_base = (w * window + i) * interp
        j_hi = j_base + interp - 1
        target = jnp.round(ns)
        emit_sym = target <= j_hi
        tgt_i = jnp.maximum(target.astype(jnp.int32), 0)
        age = jnp.clip(j_hi - tgt_i, 0, RING - 1)
        cur = _onehot_read(ring_v, age)
        sym_t = _onehot_read(ring_t, age // interp)
        hidx = jnp.round(half_raw).astype(jnp.int32)
        hage = j_hi - hidx
        h_in_ring = (hidx >= 0) & (hage >= 0) & (hage < RING)
        hval = jnp.where(
            h_in_ring,
            _onehot_read(ring_v, jnp.clip(hage, 0, RING - 1)),
            jnp.zeros_like(cur))

        err = jnp.clip(c(cp.gardner_gain) * (cur - prev_bit) * hval,
                       c(-cp.gardner_err_limit), c(cp.gardner_err_limit))
        ns_adj = ns - err
        half_new = ns_adj + c(cp.step_size) / 2.0
        ns_new = ns_adj + c(cp.step_size)
        ns = jnp.where(emit_sym, ns_new, ns)
        half_raw = jnp.where(emit_sym, half_new, half_raw)
        prev_bit = jnp.where(emit_sym, cur, prev_bit)

        clockmod, evenodd = ma5[0:1], ma5[1:2]
        mcur, mprev, mprevprev = ma5[2:3], ma5[3:4], ma5[4:5]
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

        bit_ref[pl.ds(i, 1)] = bit
        btime_ref[pl.ds(i, 1)] = sym_t
        emit_ref[pl.ds(i, 1)] = emit_bit.astype(dt)

        clockmod = jnp.where(emit_sym, clockmod_n, clockmod)
        evenodd = jnp.where(emit_sym,
                            jnp.remainder(evenodd + 1.0, 2.0), evenodd)
        mcur = jnp.where(emit_sym, cur, mcur)
        mprev = jnp.where(emit_sym, prev, mprev)
        mprevprev = jnp.where(emit_sym, prevprev, mprevprev)

        gd3 = jnp.concatenate([ns, half_raw, prev_bit], axis=0)
        ma5 = jnp.concatenate([clockmod, evenodd, mcur, mprev, mprevprev], 0)
        return (gain, gd3, ma5, ring_v, ring_t)

    carryC = (s0[G0:GD], s0[GD:MA], s0[MA:H0], s0[R0:T0], s0[T0:n_state])
    final_tim = unrolled(tim_body, window, carryC)

    st_scratch[:] = jnp.concatenate(
        list(final_pll) + [final_tim[0], final_tim[1], final_tim[2],
                           new_tail, final_tim[3], final_tim[4]], axis=0)

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = st_scratch[:]


@functools.partial(jax.jit,
                   static_argnames=("chain_params", "window", "unroll",
                                    "interpret"))
def fused_demod_pallas3(chain_params, pll_state, agc_gain, z, t_next,
                        window: int = 512, unroll: int = 4,
                        interpret: bool = False):
    """Full chain on (B, L) blocks; B % 128 == 0, L % window == 0.

    Interface-compatible with fused_kernel.fused_demod_pallas: returns
    (bits (B, L), bit_times (B, L), emit_mask (B, L) bool, avg_phase (B,)).
    """
    zre, zim = z
    B, L = zre.shape
    assert B % LANES == 0 and L % window == 0, (B, L, window)
    assert window % unroll == 0, (window, unroll)
    S = B // LANES           # lane-groups batched into vreg sublanes
    dt = zre.dtype
    interp = chain_params.interp
    poly = tuple(tuple(r) for r in _polyphase(chain_params.taps, interp))
    hist_len = len(poly[0])
    H = hist_len - 1
    tring = -(-RING // interp) + 2
    n_state = 15 + H + RING + tring

    agc_params = (chain_params.agc_attack, chain_params.agc_decay,
                  1.0, 5000.0, 10e-5, chain_params.squelch_threshold or 0.0)

    # hoisted input-only quantities (vectorized; XLA fuses these into one
    # elementwise pass over the block)
    ang = arctan2_approx(zim, zre)
    mag2 = zre * zre + zim * zim
    mag = jnp.sqrt(mag2)
    # lock projection in the reference is (z * q_rsqrt(|z|^2)) . nco, i.e.
    # |z| * q_rsqrt(|z|^2) * cos(ang - phi); the |z|*q_rsqrt factor is
    # input-only (carries the reference's own q_rsqrt error), hoisted here.
    nrm = mag * q_rsqrt(mag2)

    def to_cols(a):
        # (B, L) -> (L, S, LANES): window rows leading, lanes last, the
        # S lane-groups riding the vreg sublane dimension
        return jnp.moveaxis(a.reshape(S, LANES, L), -1, 0)

    st_in = jnp.zeros((n_state, B), dt)
    st_in = st_in.at[0].set(pll_state.phase)
    st_in = st_in.at[1].set(pll_state.freq)
    st_in = st_in.at[2].set(pll_state.locksig)
    st_in = st_in.at[3].set(pll_state.avg_phase)
    st_in = st_in.at[4].set(pll_state.sweep)
    st_in = st_in.at[5].set(pll_state.locked.astype(dt))
    st_in = st_in.at[6].set(agc_gain.astype(dt))
    st_in = st_in.reshape(n_state, S, LANES)

    taps_in = jnp.broadcast_to(
        jnp.asarray([t for ph in poly for t in ph], dt)[:, None, None],
        (interp * hist_len, S, LANES))

    grid = (L // window,)
    spec_w = pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0))
    spec_s = pl.BlockSpec((n_state, S, LANES), lambda w: (0, 0, 0))
    spec_t = pl.BlockSpec((interp * hist_len, S, LANES), lambda w: (0, 0, 0))
    bits, btimes, emit, st_out = pl.pallas_call(
        functools.partial(_kernel, chain_params, agc_params, poly, interp,
                          window, chain_params.squelch_position, tring,
                          unroll),
        grid=grid,
        in_specs=[spec_w, spec_w, spec_w, spec_w, spec_t, spec_s],
        out_specs=[spec_w, spec_w, spec_w, spec_s],
        out_shape=[
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((n_state, S, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_state, S, LANES), dt),
            pltpu.VMEM((H + window, S, LANES), dt),
            pltpu.VMEM((interp, window, S, LANES), dt),
        ],
        interpret=interpret,
    )(to_cols(ang), to_cols(mag), to_cols(nrm), to_cols(t_next),
      taps_in, st_in)

    def from_tiles(a):
        return jnp.moveaxis(a, 0, -1).reshape(B, L)

    avg_phase = st_out[3].reshape(B)
    return (from_tiles(bits), from_tiles(btimes),
            from_tiles(emit) > 0.5, avg_phase)
