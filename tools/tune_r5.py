#!/usr/bin/env python3
"""Round-5 kernel sweep: POES and ARGOS fused-kernel geometry after the
VMEM diet (shallow time ring + merged bit/emit output plane).

Goals (VERDICT r4): break the ARGOS S=16 VMEM wall (item 3) and re-probe
the POES S=16 envelope the diet may have widened (item 4's ablation).

Run:  python tools/tpurun.py --cts 300 tools/tune_r5.py [--out FILE]
One process, one registration; every phase under SIGALRM.
"""

import argparse
import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402


class Timeout(Exception):
    pass


def _alarm(sig, frm):
    raise Timeout()


def stage(mode_name, B, core):
    """Stage (B, total) int16 block planes + tgen seeds on device once per
    (mode, B); int16 halves the tunnel upload and demod_blocks converts
    on device (bit-identical)."""
    import jax.numpy as jnp
    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.parallel import blocked as BL
    from project_desert_tortoise_tpu.utils import synth, wav as W
    from project_desert_tortoise_tpu.utils.config import MODES

    mode = MODES[mode_name]
    dt = np.dtype(np.float32)
    plan = BL.BlockPlan(core=core, head=12288, tail=8192, max_frames=64)
    if mode_name.startswith("poes"):
        iq, _, fs, _ = W.load_iq_wav("/root/reference/5sec_clip.wav")
    else:
        fs = 32000.0
        iq, _ = synth.make_argos_recording(n_packets=40, fs=fs, snr_db=30.0)
    params = chain_lib.make_params(mode, fs, quirks=False)
    re = np.real(iq).astype(dt)
    im = np.imag(iq).astype(dt)
    reps = int(np.ceil((B * plan.core + plan.total) / len(re)))
    rr, ii = np.tile(re, reps), np.tile(im, reps)
    tt = W.time_axis(len(rr) + 1, fs, dt)
    r16 = np.round(rr * 32768.0).astype(np.int16)
    i16 = np.round(ii * 32768.0).astype(np.int16)
    brs, bis, _, _ = BL.stage_blocks(r16, i16, tt, plan, 0, B, np.int16,
                                     shift=params.interp > 1)
    lo = np.arange(B) * plan.core - plan.head
    pad0 = np.maximum(-lo, 0)
    off = 1 if params.interp > 1 else 0
    seeds = jnp.asarray(tt[np.clip(lo + off + pad0, 0, len(tt) - 1)]
                        .astype(dt))
    jre, jim = jnp.asarray(brs), jnp.asarray(bis)
    _ = np.asarray(jre[:1, :1]); _ = np.asarray(jim[:1, :1])   # force upload
    line = fs * params.interp / (2.0 * params.step_size) \
        if mode_name.startswith("poes") else fs / params.step_size
    fest = BL.coarse_carrier_est(jre, jim, float(fs), float(line))
    _ = np.asarray(fest)
    return dict(params=params, plan=plan, fs=fs, jre=jre, jim=jim,
                fest=fest, seeds=seeds, pad0=jnp.asarray(pad0.astype(dt)))


def measure(st, window, unroll, iters=3):
    from project_desert_tortoise_tpu.parallel import blocked as BL

    plan, params = st["plan"], st["params"]
    B = st["jre"].shape[0]

    def call():
        out = BL.demod_blocks(params, plan.total, st["jre"], st["jim"],
                              float(st["fs"]), None, st["fest"], 17.58,
                              window, "fused", unroll, st["seeds"],
                              st["pad0"])
        return np.asarray(out[2])

    t0 = time.perf_counter()
    nb = call()
    compile_s = time.perf_counter() - t0
    assert int(np.asarray(nb).sum()) > 1000, "no bits decoded"
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return med, compile_s, B * plan.core / med / 1e6


GRID = [
    # (mode, B, core, window, unroll)
    # Round-5c fine probe around the int16-DMA champions (note: window
    # must divide plan.total = 245760 — 224/320 silently fall back)
    ("poes_tip", 2048, 225280, 128, 32),
    ("poes_tip", 2048, 225280, 128, 64),
    ("poes_tip", 2048, 225280, 160, 16),
    ("poes_tip", 2048, 225280, 192, 64),
    ("argos_realtime", 2048, 225280, 128, 32),
    ("argos_realtime", 2048, 225280, 160, 64),
    ("argos_realtime", 2048, 225280, 192, 64),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "tune_results_r5.json"))
    ap.add_argument("--budget", type=int, default=600)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, _alarm)
    results = []
    staged = {}
    for mode, B, core, window, unroll in GRID:
        if args.only and args.only not in mode:
            continue
        key = (mode, B, core)
        rec = {"round": 5, "mode": mode, "B": B, "core": core,
               "window": window, "unroll": unroll}
        signal.alarm(args.budget)
        try:
            if key not in staged:
                staged.clear()        # one staged geometry at a time (RAM)
                staged[key] = stage(mode, B, core)
            med, comp, msps = measure(staged[key], window, unroll)
            signal.alarm(0)
            rec.update(step_ms=round(med * 1e3, 2),
                       compile_s=round(comp, 1), msps=round(msps, 1))
        except Timeout:
            rec["error"] = "timeout"
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            rec["error"] = f"{type(e).__name__}: {e}"[:200]
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    ok = [r for r in results if "msps" in r]
    if ok:
        print(json.dumps({"best": max(ok, key=lambda r: r["msps"])}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
