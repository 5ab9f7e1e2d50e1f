#!/usr/bin/env python3
"""TPU configuration sweep for the block demod pipeline.

Honest dispatch-to-fetch timing (never trust block_until_ready through the
axon relay), one configuration per line, best config summary at the end.
Every phase runs under SIGALRM so a wedged transport can't strand the client
holding the chip (see NOTES_r1.md).

    python tools/tune_tpu.py [--quick]
"""

import argparse
import json
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


def stage_inputs(B, plan):
    import jax.numpy as jnp
    from project_desert_tortoise_tpu.parallel import blocked as BL
    from project_desert_tortoise_tpu.utils import wav as W

    iq, t, fs, _ = W.load_iq_wav("/root/reference/5sec_clip.wav")
    dt = np.dtype(np.float32)
    re = np.real(iq).astype(dt)
    im = np.imag(iq).astype(dt)
    reps = int(np.ceil((B * plan.core + plan.total) / len(re)))
    rr, ii = np.tile(re, reps), np.tile(im, reps)
    tt = W.time_axis(len(rr) + 1, fs, dt)
    brs, bis, tn, _ = BL.stage_blocks(rr, ii, tt, plan, 0, B, dt)
    return (jnp.asarray(brs), jnp.asarray(bis), jnp.asarray(tn), fs)


def measure(params, plan, jre, jim, jtn, fs, window, impl, iters=3):
    from project_desert_tortoise_tpu.parallel import blocked as BL
    import jax.numpy as jnp

    B = jre.shape[0]
    fest = jnp.full((B,), -3466.0, jnp.float32)

    def call():
        out = BL.demod_blocks(params, plan.total, jre, jim, float(fs), jtn,
                              fest, 17.58, window, impl)
        return np.asarray(out[2])

    t0 = time.perf_counter()
    nb = call()
    compile_s = time.perf_counter() - t0
    assert int(nb[0]) > 100, f"no bits decoded ({int(nb[0])})"
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return med, compile_s, B * plan.core / med / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--budget", type=int, default=420,
                    help="seconds per configuration (incl. compile)")
    args = ap.parse_args()

    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.parallel.blocked import BlockPlan
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    signal.signal(signal.SIGALRM, _alarm)
    fs = 50000.0
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)

    if args.quick:
        grid = [(False, 64, 4096), ("fused", 128, 512)]
    else:
        # NOTE: pallas impls need B % 128 == 0 (lane dimension) or they
        # silently fall back to the XLA path inside demod_blocks.
        grid = [(False, 64, 4096), (False, 128, 4096), (False, 256, 4096),
                ("front", 128, 4096),
                ("fused", 128, 256), ("fused", 128, 512), ("fused", 128, 1024),
                ("fused", 256, 512), ("fused", 384, 512)]

    results = []
    staged = {}
    for impl, B, window in grid:
        plan = BlockPlan(core=98304, head=12288, tail=8192, max_frames=64)
        signal.alarm(args.budget)
        try:
            if B not in staged:
                staged[B] = stage_inputs(B, plan)
            jre, jim, jtn, fs = staged[B]
            med, comp, msps = measure(params, plan, jre, jim, jtn, fs,
                                      window, impl)
            signal.alarm(0)
            rec = {"impl": str(impl), "B": B, "window": window,
                   "step_ms": round(med * 1e3, 2), "compile_s": round(comp, 1),
                   "msps": round(msps, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        except Timeout:
            print(json.dumps({"impl": str(impl), "B": B, "window": window,
                              "error": "timeout"}), flush=True)
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            print(json.dumps({"impl": str(impl), "B": B, "window": window,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)
    if results:
        best = max(results, key=lambda r: r["msps"])
        print(json.dumps({"best": best}), flush=True)
        with open(os.path.join(REPO, "tune_results.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
