#!/usr/bin/env python3
"""Round-5 serving measurement matrix -> SERVING_r05.json.

Rows (VERDICT r4 items 2 and 5, weak #2):
  - continuity rows (XLA f32) vs round 4;
  - int16 staging at the 64-channel tunnel-saturation point (the staged
    bytes halve; p50 should close on the core+tail model);
  - a channel-ceiling probe at 96;
  - low-latency --core rows (core ~ 0.5 s) at 8/32 channels;
  - a sustained-margin probe at 1.5x realtime.

Run:  python tools/tpurun.py --cts 300 tools/serving_r5.py
"""

import json
import os
import signal
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402


class Timeout(Exception):
    pass


def main():
    from tools.bench_serving import measure_serving
    from project_desert_tortoise_tpu.parallel import blocked as BL
    from project_desert_tortoise_tpu.utils.config import POES_TIP_REALTIME

    signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(
        Timeout()))
    fs = 48000.0
    low_plan = BL.default_plan(POES_TIP_REALTIME, fs, core=24576)
    rows = []
    matrix = [
        # (label, channels, speedup, plan, batch, window, pallas, stage, dur)
        ("xla_f32_8", 8, 1.0, None, 16, 4096, False, np.float32, 22),
        ("xla_int16_32", 32, 1.0, None, 16, 4096, False, np.int16, 22),
        ("fused_f32_64", 64, 1.0, None, 128, 256, "fused", np.float32, 30),
        ("fused_int16_64", 64, 1.0, None, 128, 256, "fused", np.int16, 30),
        ("fused_int16_96", 96, 1.0, None, 128, 256, "fused", np.int16, 30),
        ("lowcore_int16_8", 8, 1.0, low_plan, 16, 4096, False, np.int16,
         22),
        ("lowcore_int16_32", 32, 1.0, low_plan, 16, 4096, False, np.int16,
         22),
        ("margin_1p5x_int16_32", 32, 1.5, None, 128, 256, "fused",
         np.int16, 25),
    ]
    for (label, nc, spd, plan, bb, win, up, stage, dur) in matrix:
        signal.alarm(900)
        try:
            row = measure_serving(POES_TIP_REALTIME, fs, nc,
                                  duration_s=dur, speedup=spd, plan=plan,
                                  batch_blocks=bb, window=win,
                                  use_pallas=up, stage_dtype=stage)
            row["label"] = label
            signal.alarm(0)
        except Timeout:
            row = {"label": label, "error": "timeout"}
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            row = {"label": label, "error": f"{type(e).__name__}: {e}"[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(REPO, "SERVING_r05.json"), "w") as f:
            json.dump({"rows": rows, "mode": "poes_tip_realtime",
                       "fs": fs}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
