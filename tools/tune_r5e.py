#!/usr/bin/env python3
"""Round-5e probe: B=4096 (S=32) at FULL core, post state-diet.

Round 4 measured B=4096 once (1200.9 Msps) but had to halve the core to
fit VMEM, and the halo fraction ate the sublane gain.  Since then the
carried state shrank 63->49 / 96->74 planes (round-5b capture latch) and
the window I/O planes halved (round-5c int16 DMA), so S=32 may now fit at
core=225280 with a moderate window.  DESIGN.md section 7d pins the kernel
as chain-latency bound (~1.3 us/body-step regardless of the 21-33% op
cut), so amortizing the serial PLL chain over 2x lanes per step is the
one remaining scheduling-level lever that does not break bit parity.

Run:  /opt/venv/bin/python tools/tpurun.py --cts 300 tools/tune_r5e.py
"""

import argparse
import json
import os
import signal
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from tools.tune_r5 import Timeout, _alarm, measure, stage  # noqa: E402

GRID = [
    # (mode, B, core, window, unroll) — window must divide core + 20480.
    #
    # core=225280 (the B=2048 champion) FAILS at S=32: the (L, S, 128) f32
    # output planes hit 245760*32*128*4 = 4.03 GB, just past the 4 GB
    # single-buffer limit, and the remote compile helper dies (HTTP 500).
    # tools/probe_s32.py proved S=32 itself compiles (even window 512);
    # core=204800 -> L=225280 -> 3.69 GB clears the limit at a 9.1% halo
    # fraction (vs 8.3%).
    # Root cause (tools/probe_fullerr.py, full remote-compile error): the
    # kernel's scoped VMEM at S=32/w=128 is 16.70 MB vs the 16.00 MB
    # limit — every window we tried busts it once the grid is long enough
    # for the pipeliner to double-buffer (short-L probes passed because it
    # doesn't).  Separately the (L, S, 128) f32 out planes cross 4 GB at
    # the champion core.  So: S=24 rows at full core (fits at w<=160),
    # and S=32 rows at w<=96 with core chosen so L divides the window and
    # the out planes stay under 4 GB.  The kernel is chain-latency-bound
    # (DESIGN.md 7d): more lanes per body step is the one bit-exact lever.
    ("poes_tip", 3072, 225280, 160, 32),
    ("poes_tip", 3072, 225280, 128, 32),
    ("argos_realtime", 3072, 225280, 160, 32),
    ("argos_realtime", 3072, 225280, 128, 32),
    ("poes_tip", 4096, 204800, 80, 32),     # L=225280: /80=2816, 3.69 GB
    ("poes_tip", 4096, 204800, 64, 32),     # same staging, smaller window
    ("argos_realtime", 4096, 204800, 80, 32),
    ("argos_realtime", 4096, 204800, 64, 32),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "tune_results_r5e.json"))
    ap.add_argument("--budget", type=int, default=900)
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
               "window": window, "unroll": unroll,
               "note": "round-5e: S=32 at full core after the state diet"}
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
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
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
