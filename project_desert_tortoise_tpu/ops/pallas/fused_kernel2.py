"""Fully fused demod kernel, v2: sublane-packed state.

Same chain as ``fused_kernel.py`` (PLL -> polyphase FIR interp -> AGC ->
Gardner -> Manchester in one VMEM pass, reference semantics from
``POESTIPdemod/main.c:373-492``), rebuilt around the round-2 ablation
findings on v5e:

* v1 carried 73 independent ``(1, 128)`` state planes through the
  ``fori_loop`` — enough vector registers to spill; the measured floor was
  ~286 ns/step with every stage stubbed out, and batching lanes into
  sublanes (``S>1``) made it 2.7x WORSE per step.
* v2 packs the vector-shaped state into sublane-major arrays instead:
  FIR history ``(hist_len, 128)`` (4 vregs instead of 26), interp ring
  ``(RING, 128)`` (2 instead of 16), input-time ring ``(8, 128)``
  (1 instead of 16).  Scalar loop state stays as ``(1, 128)`` planes.
  Total live vregs drop ~73 -> ~23.
* ring reads become one-hot sublane reductions (exact — a single element
  survives the mask) instead of RING-deep compare-select chains.
* the FIR dot is a sublane reduction ``sum(taps * hist, axis=0)``.  Its
  summation ORDER differs from the sequential reference accumulation, so
  v2 is ulp-equivalent (not bit-equal) to the scan path; frame-level
  golden parity is the contract (tests/test_pallas_fused2.py).

Lane-group support: ``B = G * 128`` runs as a ``(G, L // window)`` grid,
sequential lane-groups of 128; state persists across the window dimension.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from project_desert_tortoise_tpu.ops import pll as pll_ops
from project_desert_tortoise_tpu.ops.fastmath import sign
from project_desert_tortoise_tpu.ops.pallas.chain_kernel import _polyphase

LANES = 128
RING = 16


def _onehot_read(packed, idx):
    """packed: (K, 128); idx: (1, 128) int32 in [0, K). Exact (one-hot)."""
    k = packed.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, LANES), 0)
    return jnp.sum(jnp.where(iota == idx, packed, 0), axis=0, keepdims=True)


def _kernel(cp, agc_params, poly, interp, window, squelch_pos, tring,
            re_ref, im_ref, tn_ref, taps_ref, st_in_ref,
            bit_ref, btime_ref, emit_ref, st_out_ref, st_scratch):
    (attack, decay, reference, max_gain, min_gain, squelch_thr) = agc_params
    hist_len = len(poly[0])
    # scratch row layout: 15 scalar planes, then hist, ring_v, ring_t
    P0, G0, GD, MA = 0, 6, 7, 10          # pll 6, gain 1, gardner 3, manch 5
    H0 = 15
    R0 = H0 + hist_len
    T0 = R0 + RING
    n_state = T0 + tring

    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        st_scratch[:] = st_in_ref[:]

    s0 = st_scratch[:]
    dt = s0.dtype
    c = lambda v: jnp.asarray(v, dt)
    taps_all = taps_ref[:]          # (interp * hist_len, LANES), lane-replicated

    def body(i, carry):
        (pll6, gain, gd3, ma5, hist, ring_v, ring_t) = carry
        st = pll_ops.PLLState(
            phase=pll6[0:1], freq=pll6[1:2], locksig=pll6[2:3],
            avg_phase=pll6[3:4], sweep=pll6[4:5], locked=pll6[5:6] > 0.5)
        zre = re_ref[pl.ds(i, 1)]
        zim = im_ref[pl.ds(i, 1)]
        new, (soft, lock) = pll_ops._step(cp.pll, st, zre, zim)
        if squelch_pos == "after_pll":
            soft = jnp.where(lock < c(squelch_thr), jnp.zeros_like(soft), soft)

        hist = jnp.concatenate([soft, hist[:hist_len - 1]], axis=0)
        tval_in = tn_ref[pl.ds(i, 1)]

        produced = []
        g = gain
        for p in range(interp):
            y = jnp.sum(taps_all[p * hist_len:(p + 1) * hist_len] * hist,
                        axis=0, keepdims=True)
            y = y * g
            error = jnp.abs(y) - c(reference)
            rate = jnp.where(jnp.abs(error) > g, c(attack), c(decay))
            g = g - error * rate
            g = jnp.where(g < 0.0, c(min_gain), g)
            g = jnp.where(g > c(max_gain), c(max_gain), g)
            if squelch_pos == "after_agc":
                y = jnp.where(lock < c(squelch_thr), jnp.zeros_like(y), y)
            produced.append(y)
        gain = g

        # shift rings: newest-first interp outputs; input time ring by one
        ring_v = jnp.concatenate(produced[::-1] + [ring_v[:RING - interp]], 0)
        ring_t = jnp.concatenate([tval_in, ring_t[:tring - 1]], 0)

        # --- Gardner: emit at most one symbol this input sample ---
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

        # --- Manchester on the emitted symbol ---
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

        pll6 = jnp.concatenate([new.phase, new.freq, new.locksig,
                                new.avg_phase, new.sweep,
                                new.locked.astype(dt)], axis=0)
        gd3 = jnp.concatenate([ns, half_raw, prev_bit], axis=0)
        ma5 = jnp.concatenate([clockmod, evenodd, mcur, mprev, mprevprev], 0)
        return (pll6, gain, gd3, ma5, hist, ring_v, ring_t)

    carry0 = (s0[P0:G0], s0[G0:GD], s0[GD:MA], s0[MA:H0],
              s0[H0:R0], s0[R0:T0], s0[T0:n_state])
    # Mosaic's fori_loop lowering only supports unroll=1 or full unroll;
    # partial unroll is done by hand (8 samples per loop iteration).
    UN = 8
    assert window % UN == 0, window

    def body8(k, carry):
        for u in range(UN):
            carry = body(k * UN + u, carry)
        return carry

    final = jax.lax.fori_loop(0, window // UN, body8, carry0, unroll=1)
    st_scratch[:] = jnp.concatenate(list(final), axis=0)

    @pl.when(w == pl.num_programs(1) - 1)
    def _():
        st_out_ref[:] = st_scratch[:]


@functools.partial(jax.jit,
                   static_argnames=("chain_params", "window", "interpret"))
def fused_demod_pallas2(chain_params, pll_state, agc_gain, z, t_next,
                        window: int = 512, interpret: bool = False):
    """Full chain on (B, L) blocks; B % 128 == 0, L % window == 0.

    Interface-compatible with fused_kernel.fused_demod_pallas: returns
    (bits (B, L), bit_times (B, L), emit_mask (B, L) bool, avg_phase (B,)).
    """
    zre, zim = z
    B, L = zre.shape
    assert B % LANES == 0 and L % window == 0, (B, L, window)
    G = B // LANES
    dt = zre.dtype
    interp = chain_params.interp
    poly = tuple(tuple(r) for r in _polyphase(chain_params.taps, interp))
    hist_len = len(poly[0])
    tring = -(-RING // interp) + 2          # input-time ring depth
    n_state = 15 + hist_len + RING + tring

    agc_params = (chain_params.agc_attack, chain_params.agc_decay,
                  1.0, 5000.0, 10e-5, chain_params.squelch_threshold or 0.0)

    # (B, L) -> (L, B): window rows in the leading dim, lanes last
    def to_cols(a):
        return a.T

    # scratch row layout must match _kernel: 6 pll, 1 gain, 3 gd, 5 ma,
    # hist, ring_v, ring_t — all zeros except pll/gain
    st_in = jnp.zeros((n_state, B), dt)
    st_in = st_in.at[0].set(pll_state.phase)
    st_in = st_in.at[1].set(pll_state.freq)
    st_in = st_in.at[2].set(pll_state.locksig)
    st_in = st_in.at[3].set(pll_state.avg_phase)
    st_in = st_in.at[4].set(pll_state.sweep)
    st_in = st_in.at[5].set(pll_state.locked.astype(dt))
    st_in = st_in.at[6].set(agc_gain.astype(dt))

    taps_in = jnp.broadcast_to(
        jnp.asarray([t for ph in poly for t in ph], dt)[:, None],
        (interp * hist_len, B))

    grid = (G, L // window)
    spec_w = pl.BlockSpec((window, LANES), lambda g, w: (w, g))
    spec_s = pl.BlockSpec((n_state, LANES), lambda g, w: (0, g))
    spec_t = pl.BlockSpec((interp * hist_len, LANES), lambda g, w: (0, g))
    bits, btimes, emit, st_out = pl.pallas_call(
        functools.partial(_kernel, chain_params, agc_params, poly, interp,
                          window, chain_params.squelch_position, tring),
        grid=grid,
        in_specs=[spec_w, spec_w, spec_w, spec_t, spec_s],
        out_specs=[spec_w, spec_w, spec_w, spec_s],
        out_shape=[
            jax.ShapeDtypeStruct((L, B), dt),
            jax.ShapeDtypeStruct((L, B), dt),
            jax.ShapeDtypeStruct((L, B), dt),
            jax.ShapeDtypeStruct((n_state, B), dt),
        ],
        scratch_shapes=[pltpu.VMEM((n_state, LANES), dt)],
        interpret=interpret,
    )(to_cols(zre), to_cols(zim), to_cols(t_next), taps_in, st_in)

    avg_phase = st_out[3]
    return bits.T, btimes.T, emit.T > 0.5, avg_phase
