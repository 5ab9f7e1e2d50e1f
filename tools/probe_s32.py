#!/usr/bin/env python3
"""Compile-only probe of the fused kernel's sublane envelope (round-5e).

Tiny total (two windows) so staging is negligible; probes which (S, window,
unroll) geometries the Mosaic compiler accepts on the real chip.  Run:

    /opt/venv/bin/python tools/tpurun.py --cts 120 tools/probe_s32.py
"""

import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402


class Timeout(Exception):
    pass


def _alarm(sig, frm):
    raise Timeout()


def probe(mode_name, B, window, unroll, total=None):
    import jax.numpy as jnp
    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.parallel import blocked as BL
    from project_desert_tortoise_tpu.utils.config import MODES

    # POES golden-clip rate (interp=3, the shipped champion geometry);
    # ARGOS realtime synth rate (interp=1) — matches tools/tune_r5.stage
    fs = 50000.0 if mode_name.startswith("poes") else 32000.0
    params = chain_lib.make_params(MODES[mode_name], fs, quirks=False)
    total = total or 4 * window
    rng = np.random.default_rng(0)
    r16 = jnp.asarray(rng.integers(-2000, 2000, (B, total), dtype=np.int16))
    i16 = jnp.asarray(rng.integers(-2000, 2000, (B, total), dtype=np.int16))
    seeds = jnp.zeros((B,), np.float32)
    pad0 = jnp.zeros((B,), np.float32)
    fest = jnp.zeros((B,), np.float32)
    t0 = time.perf_counter()
    out = BL.demod_blocks(params, total, r16, i16, float(fs), None, fest,
                          17.58, window, "fused", unroll, seeds, pad0)
    _ = np.asarray(out[2])
    return time.perf_counter() - t0


GRID = [
    # (mode, B, window, unroll) — S = B // 128
    ("poes_tip", 2048, 512, 32),    # control: the shipped champion rung
    ("poes_tip", 4096, 512, 32),    # S=32 at the same window
    ("poes_tip", 4096, 256, 32),
    ("poes_tip", 4096, 128, 8),
    ("poes_tip", 3072, 512, 32),    # S=24
    ("poes_tip", 2560, 512, 32),    # S=20
]


def main():
    signal.signal(signal.SIGALRM, _alarm)
    out = []
    for mode, B, window, unroll in GRID:
        rec = {"mode": mode, "B": B, "S": B // 128, "window": window,
               "unroll": unroll}
        signal.alarm(420)
        try:
            rec["compile_s"] = round(probe(mode, B, window, unroll), 1)
        except Timeout:
            rec["error"] = "timeout"
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            rec["error"] = f"{type(e).__name__}: {e}"[:400]
        signal.alarm(0)
        out.append(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
