#!/usr/bin/env python3
"""Map the fused kernel's per-buffer size envelope (round-5e).

B=4096 (S=32) compiles at tiny totals (tools/probe_s32.py) but the full
geometry fails remote compile with an opaque HTTP 500.  Hypothesis: the
(L, S, 128) f32 output planes cross a 2^31-byte single-buffer limit — the
shipped B=2048 champion sits at 2.0132 GB, just under.  This probe
AOT-lowers demod_blocks for a ladder of (B, L) shapes with NO data upload
(jax.ShapeDtypeStruct) and reports which compile.

Run:  /opt/venv/bin/python tools/tpurun.py --cts 120 tools/probe_buflimit.py
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


def compile_only(B, total, window, unroll):
    import jax
    import jax.numpy as jnp
    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.parallel import blocked as BL
    from project_desert_tortoise_tpu.utils.config import MODES

    fs = 50000.0
    params = chain_lib.make_params(MODES["poes_tip"], fs, quirks=False)
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    t0 = time.perf_counter()
    lowered = BL.demod_blocks.lower(
        params, total,
        sds((B, total), jnp.int16), sds((B, total), jnp.int16),
        float(fs), None, sds((B,), jnp.float32), 17.58,
        window, "fused", unroll,
        sds((B,), jnp.float32), sds((B,), jnp.float32), False)
    lowered.compile()
    return time.perf_counter() - t0


# window 128 divides every L below; out-plane bytes = L * S * 128 * 4
#
# First sweep result: the 2^31 theory is DEAD — S=32 fails even at
# L=110592 (1.688 GiB out plane, SMALLER than the passing S=16 control's
# 1.875), while tools/probe_s32.py passed S=32 at L=2048.  Bisect L.
# Second sweep: S=32 fails even at L=4096 (0.06 GiB) while S=24 passes
# at the champion L — NOT a size limit.  Every S=32 pass so far had
# exactly grid = L/window = 4 steps; probe the grid-count axis.
GRID = [
    # (B, L, window) — S = B // 128
    (4096, 1024, 128),     # grid 8
    (4096, 2048, 128),     # grid 16
    (4096, 4096, 512),     # grid 8, big window
    (4096, 8192, 512),     # grid 16
    (4096, 2048, 256),     # grid 8, mid window
]


def main():
    signal.signal(signal.SIGALRM, _alarm)
    for B, L, W in GRID:
        gb = L * (B // 128) * 128 * 4 / 2**30
        rec = {"B": B, "S": B // 128, "L": L, "window": W,
               "out_plane_gib": round(gb, 3)}
        signal.alarm(420)
        try:
            rec["compile_s"] = round(compile_only(B, L, W, 32), 1)
        except Timeout:
            rec["error"] = "timeout"
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            rec["error"] = f"{type(e).__name__}: {e}"[:200]
        signal.alarm(0)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
