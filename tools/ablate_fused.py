#!/usr/bin/env python3
"""Stage-level ablation of the ACTUAL fused demod kernel body.

Rebuilds fused_kernel._kernel with individual stages stubbed out to attribute
the per-step cost: PLL, FIR+AGC, ring bookkeeping, Gardner+Manchester, output
stores.  Timing is honest dispatch->fetch.

NOTE: this harness models the pre-round-5b kernel body (deep mid-bit value
ring, separate prev_bit/mcur planes, f32 window DMA); the shipped kernel
has since moved to the capture-latch layout (fused_kernel.py docstring,
DESIGN.md 7d).  The stage ATTRIBUTION shape is still representative; the
absolute numbers belong to tune_results.json history.

    python tools/ablate_fused.py [--s 1] [--window 1024] [--steps 118784]
"""

import argparse
import functools
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


class Timeout(Exception):
    pass


def _alarm(sig, frm):
    raise Timeout()


LANES = 128
RING = 16


def make_fused(cp, S, window, flags):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from project_desert_tortoise_tpu.ops import pll as pll_ops
    from project_desert_tortoise_tpu.ops.fastmath import sign
    from project_desert_tortoise_tpu.ops.pallas.chain_kernel import _polyphase

    interp = cp.interp
    poly = tuple(tuple(r) for r in _polyphase(cp.taps, interp))
    hist_len = len(poly[0])
    use_pll = "pll" in flags
    use_fir = "fir" in flags
    use_ring = "ring" in flags
    use_gm = "gm" in flags
    use_store = "store" in flags

    def _ring_read(ring_planes, age):
        acc = jnp.zeros_like(ring_planes[0])
        for k in range(RING):
            acc = jnp.where(age == k, ring_planes[k], acc)
        return acc

    P0, H0 = 0, 6
    G0 = H0 + hist_len
    R0 = G0 + 1
    T0 = R0 + RING
    GD = T0 + RING
    MA = GD + 3
    n_state = MA + 5
    attack, decay, reference = cp.agc_attack, cp.agc_decay, 1.0
    max_gain, min_gain = 5000.0, 10e-5

    def kernel(re_ref, im_ref, tn_ref, st_in_ref,
               bit_ref, btime_ref, emit_ref, st_out_ref, st_scratch):
        w = pl.program_id(0)

        @pl.when(w == 0)
        def _():
            st_scratch[:] = st_in_ref[:]

        s0 = st_scratch[:]

        def body(i, carry):
            s = carry
            dt = s[0].dtype
            c = lambda v: jnp.asarray(v, dt)
            if use_pll:
                st = pll_ops.PLLState(
                    phase=s[P0], freq=s[P0 + 1], locksig=s[P0 + 2],
                    avg_phase=s[P0 + 3], sweep=s[P0 + 4], locked=s[P0 + 5] > 0.5)
                new, (soft, lock) = pll_ops._step(cp.pll, st, re_ref[i],
                                                  im_ref[i])
                pll_out = [new.phase, new.freq, new.locksig, new.avg_phase,
                           new.sweep, new.locked.astype(dt)]
            else:
                soft = re_ref[i]
                pll_out = [s[P0 + k] + c(1e-7) for k in range(6)]

            hist = [soft] + [s[H0 + m] for m in range(hist_len - 1)]
            gain = s[G0]
            tval_in = tn_ref[i]
            if use_fir:
                produced = []
                for p in range(interp):
                    y = jnp.zeros_like(soft)
                    for m in range(hist_len):
                        y = y + c(poly[p][m]) * hist[m]
                    y = y * gain
                    error = jnp.abs(y) - c(reference)
                    rate = jnp.where(jnp.abs(error) > gain, c(attack),
                                     c(decay))
                    gain = gain - error * rate
                    gain = jnp.where(gain < 0.0, c(min_gain), gain)
                    gain = jnp.where(gain > c(max_gain), c(max_gain), gain)
                    produced.append(y)
            else:
                produced = [soft * c(0.5)] * interp
                gain = gain + c(1e-7)

            ring_v = [s[R0 + k] for k in range(RING)]
            ring_t = [s[T0 + k] for k in range(RING)]
            if use_ring:
                ring_v = produced[::-1] + ring_v[:RING - interp]
                ring_t = [tval_in] * interp + ring_t[:RING - interp]
            else:
                ring_v = [r + c(1e-7) for r in ring_v]
                ring_t = [r + c(1e-7) for r in ring_t]

            ns, half_raw, prev_bit = s[GD], s[GD + 1], s[GD + 2]
            clockmod, evenodd = s[MA], s[MA + 1]
            mcur, mprev, mprevprev = s[MA + 2], s[MA + 3], s[MA + 4]
            if use_gm:
                j_base = (w * window + i) * interp
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
                hval = jnp.where(
                    h_in_ring,
                    _ring_read(ring_v, jnp.clip(hage, 0, RING - 1)),
                    jnp.zeros_like(cur))
                err = jnp.clip(c(cp.gardner_gain) * (cur - prev_bit) * hval,
                               c(-cp.gardner_err_limit),
                               c(cp.gardner_err_limit))
                ns_adj = ns - err
                half_new = ns_adj + c(cp.step_size) / 2.0
                ns_new = ns_adj + c(cp.step_size)
                ns = jnp.where(emit_sym, ns_new, ns)
                half_raw = jnp.where(emit_sym, half_new, half_raw)
                prev_bit = jnp.where(emit_sym, cur, prev_bit)
                prevprev, prev = mprev, mcur
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
                clockmod = jnp.where(emit_sym, clockmod_n, clockmod)
                evenodd = jnp.where(emit_sym,
                                    jnp.remainder(evenodd + 1.0, 2.0),
                                    evenodd)
                mcur = jnp.where(emit_sym, cur, mcur)
                mprev = jnp.where(emit_sym, prev, mprev)
                mprevprev = jnp.where(emit_sym, prevprev, mprevprev)
            else:
                bit = produced[0]
                sym_t = tval_in
                emit_bit = soft > 0
                ns = ns + c(1e-7)

            if use_store:
                bit_ref[i] = bit
                btime_ref[i] = sym_t
                emit_ref[i] = emit_bit.astype(bit.dtype)
            else:
                @pl.when(i == 0)
                def _():
                    bit_ref[0] = bit
                    btime_ref[0] = sym_t
                    emit_ref[0] = emit_bit.astype(bit.dtype)

            return tuple(pll_out + hist + [gain] + ring_v + ring_t
                         + [ns, half_raw, prev_bit]
                         + [clockmod, evenodd, mcur, mprev, mprevprev])

        final = jax.lax.fori_loop(
            0, window, body, tuple(s0[k] for k in range(n_state)))
        st_scratch[:] = jnp.stack(list(final))

        @pl.when(w == pl.num_programs(0) - 1)
        def _():
            st_out_ref[:] = st_scratch[:]

    def run(steps):
        L = steps
        grid = (L // window,)
        spec_w = pl.BlockSpec((window, S, LANES), lambda w: (w, 0, 0))
        spec_s = pl.BlockSpec((n_state, S, LANES), lambda w: (0, 0, 0))
        f = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[spec_w] * 3 + [spec_s],
            out_specs=[spec_w] * 3 + [spec_s],
            out_shape=[jax.ShapeDtypeStruct((L, S, LANES), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((n_state, S, LANES), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((n_state, S, LANES), jnp.float32)],
        )
        f = jax.jit(f)
        rng = np.random.default_rng(0)
        xs = [jnp.asarray(rng.standard_normal((L, S, LANES)), jnp.float32)
              for _ in range(3)]
        st = jnp.full((n_state, S, LANES), 0.1, jnp.float32)
        out = f(*xs, st)
        _ = np.asarray(out[-1])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*xs, st)
            _ = np.asarray(out[-1])
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / steps * 1e9

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=1)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=118784)
    ap.add_argument("--budget", type=int, default=300)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    cp = chain_lib.make_params(POES_TIP, 50000.0, quirks=False)

    full = {"pll", "fir", "ring", "gm", "store"}
    variants = [
        ("full", full),
        ("no_pll", full - {"pll"}),
        ("no_fir", full - {"fir"}),
        ("no_ring", full - {"ring", "gm"}),
        ("no_gm", full - {"gm"}),
        ("no_store", full - {"store"}),
        ("pll_only", {"pll", "store"}),
        ("none", set()),
    ]
    signal.signal(signal.SIGALRM, _alarm)
    for name, flags in variants:
        if args.only and args.only not in name:
            continue
        signal.alarm(args.budget)
        try:
            ns = make_fused(cp, args.s, args.window, flags)(args.steps)
            signal.alarm(0)
            print(f"{name:10s} S={args.s} {ns:8.1f} ns/step", flush=True)
        except Timeout:
            print(f"{name:10s} TIMEOUT", flush=True)
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"{name:10s} ERROR {type(e).__name__}: {e}"[:160],
                  flush=True)


if __name__ == "__main__":
    main()
