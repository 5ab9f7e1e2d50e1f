#!/usr/bin/env python3
"""Ablation microbenchmark for the fused demod kernel.

Measures per-step cost of pallas fori_loop bodies of increasing complexity to
locate where the fused kernel's ~2us/step goes: loop overhead, carry width,
PLL transcendentals, FIR MACs, ring compare-selects, or output stores.

    python tools/ablate_kernel.py [--steps 131072] [--s 1]
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


def build_variant(name, S, window, n_carry, body_fn, n_in=1, n_out=0):
    """Generic grid-windowed kernel: carries n_carry (S,128) planes, reads
    n_in input planes per step, runs body_fn, optionally stores n_out."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        in_refs = refs[:n_in]
        st_in = refs[n_in]
        out_refs = refs[n_in + 1: n_in + 1 + n_out]
        st_out = refs[n_in + 1 + n_out]
        scratch = refs[-1]
        w = pl.program_id(0)

        @pl.when(w == 0)
        def _():
            scratch[:] = st_in[:]

        s0 = scratch[:]

        def body(i, carry):
            ins = [r[i] for r in in_refs]
            new_carry, outs = body_fn(i, carry, ins)
            for k, o in enumerate(outs[:n_out]):
                out_refs[k][i] = o
            return new_carry

        final = jax.lax.fori_loop(
            0, window, body, tuple(s0[k] for k in range(n_carry)))
        scratch[:] = jnp.stack(list(final))

        @pl.when(w == pl.num_programs(0) - 1)
        def _():
            st_out[:] = scratch[:]

    def run(steps):
        L = steps
        grid = (L // window,)
        spec_w = pl.BlockSpec((window, S, 128), lambda w: (w, 0, 0))
        spec_s = pl.BlockSpec((n_carry, S, 128), lambda w: (0, 0, 0))
        xs = [jnp.ones((L, S, 128), jnp.float32) for _ in range(n_in)]
        st = jnp.ones((n_carry, S, 128), jnp.float32) * 0.1
        f = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[spec_w] * n_in + [spec_s],
            out_specs=[spec_w] * n_out + [spec_s],
            out_shape=[jax.ShapeDtypeStruct((L, S, 128), jnp.float32)
                       for _ in range(n_out)]
            + [jax.ShapeDtypeStruct((n_carry, S, 128), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((n_carry, S, 128), jnp.float32)],
        )
        f = jax.jit(f)
        out = f(*xs, st)
        _ = np.asarray(out[-1])  # warm/compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*xs, st)
            _ = np.asarray(out[-1])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        return med / steps * 1e9  # ns per step

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=131072)
    ap.add_argument("--s", type=int, default=1)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=240)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    import jax.numpy as jnp
    from project_desert_tortoise_tpu.ops import pll as pll_ops
    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    params = chain_lib.make_params(POES_TIP, 50000.0, quirks=False)
    cp = params

    def empty_body(n):
        def body(i, carry, ins):
            return tuple(c + 1e-6 for c in carry), []
        return body

    def mac_body(n_mac):
        def body(i, carry, ins):
            x = ins[0]
            acc = carry[0]
            for k in range(n_mac):
                acc = acc * 1.0001 + x
            return (acc,) + carry[1:], []
        return body

    def pll_body():
        def body(i, carry, ins):
            st = pll_ops.PLLState(
                phase=carry[0], freq=carry[1], locksig=carry[2],
                avg_phase=carry[3], sweep=carry[4], locked=carry[5] > 0.5)
            new, (soft, lock) = pll_ops._step(cp.pll, st, ins[0], ins[0])
            return (new.phase, new.freq, new.locksig, new.avg_phase,
                    new.sweep, new.locked.astype(jnp.float32)), [soft]
        return body

    def ring_body(R):
        def body(i, carry, ins):
            ring = list(carry[:R])
            age = jnp.clip(ins[0].astype(jnp.int32), 0, R - 1)
            acc = jnp.zeros_like(ins[0])
            for k in range(R):
                acc = jnp.where(age == k, ring[k], acc)
            ring = [ins[0] + acc] + ring[:-1]
            return tuple(ring) + carry[R:], []
        return body

    variants = [
        ("empty_c1", 1, empty_body(1), 1, 0),
        ("empty_c8", 8, empty_body(8), 1, 0),
        ("empty_c73", 73, empty_body(73), 1, 0),
        ("mac26", 1, mac_body(26), 1, 0),
        ("mac78", 1, mac_body(78), 1, 0),
        ("pll", 6, pll_body(), 1, 1),
        ("ring16", 17, ring_body(16), 1, 0),
        ("store3", 1, lambda: None, 1, 3),
    ]

    signal.signal(signal.SIGALRM, _alarm)
    for name, n_carry, body, n_in, n_out in variants:
        if args.only and args.only not in name:
            continue
        if name == "store3":
            def body(i, carry, ins):  # noqa: F811
                x = ins[0] + carry[0]
                return carry, [x, x * 2, x * 3]
        signal.alarm(args.budget)
        try:
            run = build_variant(name, args.s, args.window, n_carry, body,
                                n_in, n_out)
            ns = run(args.steps)
            signal.alarm(0)
            print(f"{name:12s} S={args.s} carry={n_carry:3d} "
                  f"{ns:8.1f} ns/step", flush=True)
        except Timeout:
            print(f"{name:12s} TIMEOUT", flush=True)
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"{name:12s} ERROR {type(e).__name__}: {e}"[:160],
                  flush=True)


if __name__ == "__main__":
    main()
