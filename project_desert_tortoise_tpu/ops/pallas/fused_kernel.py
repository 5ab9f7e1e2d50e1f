"""Fully fused demod Pallas kernel: PLL -> FIR-interp -> AGC -> Gardner ->
Manchester in ONE pass, no intermediate HBM traffic.

Extends chain_kernel.py with timing recovery: the `interp` outputs of each
input sample rotate through a small VMEM ring (values + times); a lane emits
a symbol when its fractional pointer crosses the newest produced interp index,
reading the on-time sample from the ring with an unrolled slot-select (the
per-lane dynamic index that made the XLA path gather-bound becomes a few
compare+selects on vregs).  The Gardner MID-BIT sample — ``step_size/2``
outputs behind the on-time read in the reference
(``GardenerClockRecovery.c:78``) — is NOT served by a deep ring: its target
index is set at the previous emission and always lies in the future at that
point, so a one-plane capture latch grabs the value the body step it is
produced (round-5 diet; the ARGOS geometry previously carried 26 value
planes for this one read).  Manchester decodes emitted symbols in the same
step.  Since the symbol stride (Fs*interp/baud) exceeds `interp`, each lane
emits at most one bit per input sample, so outputs are dense per-sample
planes with emit masks — compressed downstream exactly like the scan
path's.

Output parity with the XLA op path is exact (see tests/test_pallas_fused.py).
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
# default body unroll for compiled (Mosaic) lowering: consecutive samples'
# FIR/AGC/Gardner vector work overlaps the serial PLL dependency chain in
# the scheduler.  Measured round 3 at (B=1024, core=225280, window=256):
# U=1 -> 1173 Msps, 8 -> 1288, 32 -> 1312 (tune_results.json); gains
# flatten past 32.  Interpret mode defaults to 1 (8-32x trace blowup for
# zero benefit); outputs are bit-exact across U (test_pallas_fused).
DEFAULT_UNROLL = 32


def ring_size(step_size: float, err_limit: float, interp: int) -> int:
    """Mid-bit history depth: the Gardner half-sample lies ``step_size/2``
    outputs behind the newest, plus timing-error slack.  16 covers POES
    (step ~9); ARGOS needs 26 (step 40 -> half offset 20) — with a fixed
    RING=16 the interp==1 modes silently read hval=0 and the timing loop
    free-ran (round-3 bug fix, caught by test_blocked_argos line parity).

    Since the round-5 capture-latch diet the FUSED kernel no longer carries
    a ring this deep (its value ring is ``ring_t_size`` planes and the
    mid-bit read is a one-plane latch); this sizing still governs the
    XLA windowed variant's buffer image (ops/clock.py)."""
    need = int(np.ceil(step_size / 2.0 + err_limit)) + interp + 2
    return max(16, -(-need // 2) * 2)


def ring_t_size(step_size: float, err_limit: float, interp: int) -> int:
    """Time-ring depth — much shallower than the value ring (VERDICT r4
    item 3, the ARGOS S=16 VMEM wall).

    Only the VALUE ring is read at deep ages (the Gardner mid-bit sample,
    ``step_size/2`` behind).  The time ring serves just the ON-TIME read:
    its age is ``j_hi - round(next_sample)``, bounded by the emission
    condition (``target <= j_hi``, and each emission advances the pointer
    by ``step_size > interp``) to ``interp - 1`` plus the clamped timing
    error (``err_limit``, 0.1 samples for both reference modes,
    POESTIPdemod/main.c:111 / ARGOSdemod config).  Sizing it to
    ``interp + ceil(err_limit) + 2`` drops ~20 dead state planes from the
    ARGOS geometry (ring 26 -> time ring 4-6), which is what let the
    interp==1 kernel onto the 16-sublane rung."""
    need = interp + int(np.ceil(err_limit)) + 2
    return min(max(4, -(-need // 2) * 2),
               ring_size(step_size, err_limit, interp))


def _ring_read(ring_planes, age):
    """age: (S,128) int32, 0 = newest; unrolled compare-select over the
    shift-register ring."""
    acc = jnp.zeros_like(ring_planes[0])
    for k in range(len(ring_planes)):
        acc = jnp.where(age == k, ring_planes[k], acc)
    return acc


def _kernel(cp, agc_params, poly, interp, window, squelch_pos, ring_t,
            n_tg, unroll, tgen_ts, in_scale, *refs):
    if tgen_ts is None:
        (re_ref, im_ref, tn_ref, st_in_ref,
         be_ref, btime_ref, st_out_ref, st_scratch) = refs
    else:
        # time-generation mode: no staged time plane; the kernel rebuilds
        # the reference's accumulated-f32 axis from per-block seeds
        # (bit-exact: the same sequential t += Ts left fold, wave.c:167)
        (re_ref, im_ref, st_in_ref,
         be_ref, btime_ref, st_out_ref, st_scratch) = refs
        tn_ref = None
    (attack, decay, reference, max_gain, min_gain, squelch_thr) = agc_params
    hist_len = len(poly[0])
    # state plane layout (round-5 diet: shallow value ring + mid-bit
    # capture latch + grouped time ring + merged prev_bit/mcur plane)
    P0 = 0           # PLL: 6
    H0 = 6           # FIR history: hist_len
    G0 = H0 + hist_len            # AGC gain: 1
    R0 = G0 + 1                   # on-time value ring: ring_t (shallow)
    HL = R0 + ring_t              # mid-bit capture latch: 1
    T0 = HL + 1                   # time ring, one plane per interp group: n_tg
    GD = T0 + n_tg                # gardner ns, half: 2 (prev merged into MA+2)
    MA = GD + 2                   # manchester clockmod, evenodd, prev_sym
    #                               (== gardner prev_bit), prev, prevprev: 5

    w = pl.program_id(0)

    @pl.when(w == 0)
    def _():
        st_scratch[:] = st_in_ref[:]

    # loop state lives in the fori_loop carry (vector registers); VMEM
    # scratch is only touched at window boundaries
    TG = MA + 5      # time-gen (optional): t_cur, pad countdown
    n_state = MA + 5 + (2 if tgen_ts is not None else 0)
    s0 = st_scratch[:]

    def body(i, carry):
        s = carry
        dt = s[0].dtype
        c = lambda v: jnp.asarray(v, dt)
        st = pll_ops.PLLState(
            phase=s[P0], freq=s[P0 + 1], locksig=s[P0 + 2],
            avg_phase=s[P0 + 3], sweep=s[P0 + 4], locked=s[P0 + 5] > 0.5)
        xre, xim = re_ref[i], im_ref[i]
        if in_scale is not None:     # int16 PCM window: exact wave.c:117
            xre = xre.astype(dt) * c(in_scale)
            xim = xim.astype(dt) * c(in_scale)
        new, (soft, lock) = pll_ops._step(cp.pll, st, xre, xim)
        if squelch_pos == "after_pll":
            # |lock|: block relock may settle at the inverted BPSK point
            # (see parallel/blocked.py squelch note)
            soft = jnp.where(jnp.abs(lock) < c(squelch_thr),
                             jnp.zeros_like(soft), soft)

        hist = [soft] + [s[H0 + m] for m in range(hist_len - 1)]
        gain = s[G0]
        ring_v = [s[R0 + k] for k in range(ring_t)]
        hlatch = s[HL]
        tgroups = [s[T0 + k] for k in range(n_tg)]
        if tgen_ts is None:
            tval_in = tn_ref[i]
            tg_tail = []
        else:
            t_cur, pcnt = s[TG], s[TG + 1]
            # pcnt counts down through zero-padded head positions (block 0
            # only); at pcnt == 0 the emitted time is the seed itself, then
            # the accumulated fold continues
            tval_in = jnp.where(pcnt > 0, jnp.zeros_like(t_cur), t_cur)
            t_cur = jnp.where(pcnt <= 0, t_cur + c(tgen_ts), t_cur)
            tg_tail = [t_cur, pcnt - 1.0]

        # ring is a shift register, entry k = interp output at age k
        # (0 = newest); produce this sample's `interp` outputs newest-first
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
                y = jnp.where(jnp.abs(lock) < c(squelch_thr),
                              jnp.zeros_like(y), y)
            produced.append(y)
        ring_v = produced[::-1] + ring_v[:ring_t - interp]
        tgroups = [tval_in] + tgroups[:n_tg - 1]

        # --- Gardner: emit at most one symbol this input sample ---
        ns, half_raw = s[GD], s[GD + 1]
        prev_sym = s[MA + 2]      # == gardner prev_bit == manchester mcur:
        #                           both latch `cur` on emission (merged)
        j_hi = j_base + interp - 1

        # mid-bit capture: the half target set at the previous emission is
        # always strictly ahead of j_hi at that point (half_new - j_hi >=
        # step/2 - err_limit - interp > 0 for both reference geometries), so
        # the value at round(half_raw) is latched the body step it is
        # produced instead of being served by a step/2-deep ring; negative
        # or never-produced targets leave the latch at its reset value 0.0,
        # exactly the old out-of-ring read (GardenerClockRecovery.c:78-83)
        hidx = jnp.round(half_raw).astype(jnp.int32)
        off = hidx - j_base
        capv = jnp.zeros_like(soft)
        for p in range(interp):
            capv = jnp.where(off == p, produced[p], capv)
        hlatch = jnp.where((off >= 0) & (off < interp), capv, hlatch)

        target = jnp.round(ns)
        emit_sym = target <= j_hi
        tgt_i = jnp.maximum(target.astype(jnp.int32), 0)
        # the on-time read age is bounded by interp + clamped timing error
        # (ring_t_size) — the ring carries only that depth
        age = jnp.clip(j_hi - tgt_i, 0, ring_t - 1)
        cur = _ring_read(ring_v, age)
        # time ring entries are inserted `interp` at a time with one value,
        # so group g = age // interp holds the time; select over the
        # n_tg = ceil(ring_t/interp) group planes
        sym_t = tgroups[-1]
        for k in reversed(range(n_tg - 1)):
            sym_t = jnp.where(age < (k + 1) * interp, tgroups[k], sym_t)
        hval = hlatch

        err = jnp.clip(c(cp.gardner_gain) * (cur - prev_sym) * hval,
                       c(-cp.gardner_err_limit), c(cp.gardner_err_limit))
        ns_adj = ns - err
        half_new = ns_adj + c(cp.step_size) / 2.0
        ns_new = ns_adj + c(cp.step_size)
        ns = jnp.where(emit_sym, ns_new, ns)
        half_raw = jnp.where(emit_sym, half_new, half_raw)
        # a consumed mid-bit resets the latch for the new (future) target
        hlatch = jnp.where(emit_sym, jnp.zeros_like(hlatch), hlatch)

        # --- Manchester on the emitted symbol ---
        clockmod, evenodd = s[MA], s[MA + 1]
        mprev, mprevprev = s[MA + 3], s[MA + 4]
        prevprev = mprev
        prev = prev_sym
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

        # merged bit+emit output plane (one less (window, S, 128) VMEM
        # out buffer): value in {0, 1} when no emission, {2, 3} = 2 + bit
        # on emission — exact small integers in f32
        be_ref[i] = bit + 2.0 * emit_bit.astype(dt)
        btime_ref[i] = sym_t

        clockmod = jnp.where(emit_sym, clockmod_n, clockmod)
        evenodd = jnp.where(emit_sym,
                            jnp.remainder(evenodd + 1.0, 2.0), evenodd)
        prev_sym = jnp.where(emit_sym, cur, prev_sym)
        mprev = jnp.where(emit_sym, prev, mprev)
        mprevprev = jnp.where(emit_sym, prevprev, mprevprev)

        return tuple(
            [new.phase, new.freq, new.locksig, new.avg_phase, new.sweep,
             new.locked.astype(dt)] + hist + [gain] + ring_v + [hlatch]
            + tgroups + [ns, half_raw]
            + [clockmod, evenodd, prev_sym, mprev, mprevprev] + tg_tail)

    if unroll == 1:
        final = jax.lax.fori_loop(
            0, window, body, tuple(s0[k] for k in range(n_state)))
    else:
        # hand-unrolled: Mosaic's fori only lowers unroll=1 or full, so we
        # unroll in the body.  Consecutive samples' FIR/AGC/Gardner work is
        # independent of each other's PLL updates EXCEPT through the carried
        # state, so the scheduler can overlap sample u+1's transcendentals
        # with sample u's tail — the chain is latency-bound (DESIGN.md 7).
        def body_u(j, carry):
            s = carry
            for u in range(unroll):
                s = body(j * unroll + u, s)
            return s
        final = jax.lax.fori_loop(
            0, window // unroll, body_u, tuple(s0[k] for k in range(n_state)))
    st_scratch[:] = jnp.stack(list(final))

    @pl.when(w == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = st_scratch[:]


@functools.partial(jax.jit,
                   static_argnames=("chain_params", "window", "interpret",
                                    "unroll", "ts"))
def fused_demod_pallas(chain_params, pll_state, agc_gain, z, t_next,
                       window: int = 512, interpret: bool = False,
                       unroll: int = 0, t_seed=None, t_pad0=None,
                       ts: float = 0.0):
    """Full chain on (B, L) blocks; B % 128 == 0, L % window == 0.

    t_next: (B, L) stage time axis (see blocked.demod_blocks), or None to
    regenerate it in-kernel (time-generation mode): pass per-block
    ``t_seed`` (B,) — the axis value at the block's first valid sample —
    and ``t_pad0`` (B,) — the count of zero-padded head positions (only
    block 0 of a recording has any) — plus the static step ``ts`` = 1/fs
    in stream dtype.  Bit-exact vs the staged plane (the same sequential
    f32 ``t += Ts`` fold, wave.c:167) everywhere except zero-padded
    tail positions past the end of the recording, where the generated axis
    keeps accumulating instead of reading 0 — positions whose frames the
    core-interval stitcher drops either way.  Saves one (B, L) f32 plane
    of HBM traffic and, in the flat E2E path, a third of the host->device
    upload bytes.
    Returns (bits (B, L) float 0/1, bit_times (B, L), emit_mask (B, L) bool,
    avg_phase (B,)).  At most one bit per input sample per lane.

    z may be int16 PCM planes: the kernel DMAs the half-width windows and
    applies the exact /32768 normalization in-body (bit-identical to a
    separate conversion pass, minus two full-plane HBM materializations).
    """
    zre, zim = z
    B, L = zre.shape
    assert B % LANES == 0 and L % window == 0, (B, L, window)
    tgen = t_next is None
    if tgen:
        assert t_seed is not None and t_pad0 is not None and ts > 0.0
    if unroll == 0:
        unroll = 1 if interpret else DEFAULT_UNROLL
    while window % unroll:
        unroll //= 2              # keep any odd window size working

    S = B // LANES
    in_i16 = zre.dtype == jnp.int16
    # int16 PCM planes are consumed directly: the window DMA moves half the
    # bytes and the exact /32768 normalization of ``common/wave.c:117``
    # happens in-body (int16 -> f32 and the 2^-15 scale are both lossless,
    # so this is bit-identical to converting in a separate XLA pass — which
    # also materialized two full f32 planes in HBM first)
    dt = jnp.float32 if in_i16 else zre.dtype
    interp = chain_params.interp
    poly = tuple(tuple(r) for r in _polyphase(chain_params.taps, interp))
    hist_len = len(poly[0])
    # capture-latch validity (module docstring): a freshly set mid-bit
    # target must round strictly ahead of the newest produced index.  At an
    # emission step ns >= j_hi - interp + 0.5 (else the emission would have
    # fired a step earlier), so half_new - j_hi >= step/2 - err_limit -
    # interp + 0.5; requiring that to exceed 0.5 (round-half-even) gives
    # step/2 - err_limit - interp > 0.  POES: 4.55 - 0.1 - 3 = 1.45;
    # ARGOS: 20 - 0.1 - 1 = 18.9.  Custom geometries that violate it must
    # use the XLA scan path (the latch would miss targets the old deep
    # ring served).
    margin = (chain_params.step_size / 2.0
              - chain_params.gardner_err_limit - interp)
    if margin <= 0:
        raise ValueError(
            "fused kernel capture-latch invariant violated: "
            f"step_size/2 - err_limit - interp = {margin:.3f} <= 0 "
            f"(step_size={chain_params.step_size}, interp={interp}); this "
            "geometry's mid-bit target can be produced before its emission "
            "is consumed — use the XLA path (use_pallas=False)")
    ring_t = ring_t_size(chain_params.step_size,
                         chain_params.gardner_err_limit, interp)
    n_tg = -(-ring_t // interp)   # time-ring group planes (one per interp)
    n_state = (6 + hist_len + 1 + ring_t + 1 + n_tg + 2 + 5
               + (2 if tgen else 0))

    agc_params = (chain_params.agc_attack, chain_params.agc_decay,
                  1.0, 5000.0, 10e-5, chain_params.squelch_threshold or 0.0)

    def to_tiles(a):
        return jnp.moveaxis(a.reshape(S, LANES, L), -1, 0)

    planes = [
        jnp.stack([pll_state.phase, pll_state.freq, pll_state.locksig,
                   pll_state.avg_phase, pll_state.sweep,
                   pll_state.locked.astype(dt)]),
        jnp.zeros((hist_len + 1 + ring_t + 1 + n_tg + 2 + 5, B), dt)
        .at[hist_len].set(agc_gain.astype(dt)),
    ]
    if tgen:
        planes.append(jnp.stack([t_seed.astype(dt), t_pad0.astype(dt)]))
    st_in = jnp.concatenate(planes).reshape(n_state, S, LANES)

    grid = (L // window,)
    spec_w = pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0))
    spec_s = pl.BlockSpec((n_state, S, LANES), lambda w: (0, 0, 0))
    operands = [to_tiles(zre), to_tiles(zim)]
    in_specs = [spec_w, spec_w]
    if not tgen:
        operands.append(to_tiles(t_next))
        in_specs.append(spec_w)
    operands.append(st_in)
    in_specs.append(spec_s)
    be, btimes, st_out = pl.pallas_call(
        functools.partial(_kernel, chain_params, agc_params, poly, interp,
                          window, chain_params.squelch_position, ring_t,
                          n_tg, unroll, float(ts) if tgen else None,
                          1.0 / 32768.0 if in_i16 else None),
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec_w, spec_w, spec_s],
        out_shape=[
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((L, S, LANES), dt),
            jax.ShapeDtypeStruct((n_state, S, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((n_state, S, LANES), dt)],
        interpret=interpret,
    )(*operands)

    def from_tiles(a):
        return jnp.moveaxis(a, 0, -1).reshape(B, L)

    so = st_out.reshape(n_state, B)
    avg_phase = so[3]
    be = from_tiles(be)
    emit = be > 1.5               # merged plane: 2 + bit on emission
    bits = be - 2.0 * emit.astype(dt)
    return (bits, from_tiles(btimes), emit, avg_phase)
