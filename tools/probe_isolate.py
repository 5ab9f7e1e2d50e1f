#!/usr/bin/env python3
"""Isolate which part of demod_blocks fails compile at B=4096, L>=4096:
the fused Pallas kernel itself, or the XLA compaction after it.

Run:  /opt/venv/bin/python tools/tpurun.py --cts 150 tools/probe_isolate.py
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


def kernel_only(B, total, window):
    """Compile just fused_demod_pallas (no compaction)."""
    import jax
    import jax.numpy as jnp
    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.ops import pll as pll_ops
    from project_desert_tortoise_tpu.ops.pallas.fused_kernel import (
        fused_demod_pallas)
    from project_desert_tortoise_tpu.utils.config import MODES

    fs = 50000.0
    params = chain_lib.make_params(MODES["poes_tip"], fs, quirks=False)
    pll_state = pll_ops.init_state(params.pll, jnp.float32, (B,))

    def fn(zre, zim, seeds, pad0):
        return fused_demod_pallas(
            params, pll_state, jnp.full((B,), 17.58, jnp.float32),
            (zre, zim), None, window=window, unroll=32, interpret=False,
            t_seed=seeds, t_pad0=pad0, ts=1.0 / fs)

    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    t0 = time.perf_counter()
    jax.jit(fn).lower(
        sds((B, total), jnp.int16), sds((B, total), jnp.int16),
        sds((B,), jnp.float32), sds((B,), jnp.float32)).compile()
    return time.perf_counter() - t0


def compress_only(B, total):
    """Compile just the compaction on fused-kernel-shaped outputs."""
    import jax
    import jax.numpy as jnp
    from project_desert_tortoise_tpu.ops import manchester as man_ops

    max_bits = total // 4 + 8

    def fn(bits, btimes, emit):
        return man_ops.compress_spaced(bits, btimes, emit, max_bits,
                                       min_spacing=4)

    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    t0 = time.perf_counter()
    jax.jit(fn).lower(
        sds((B, total), jnp.uint8), sds((B, total), jnp.float32),
        sds((B, total), jnp.bool_)).compile()
    return time.perf_counter() - t0


GRID = [
    ("kernel", 4096, 4096, 128),
    ("kernel", 4096, 245760, 128),   # the full S=32 target geometry
    ("compress", 4096, 4096, 0),
    ("compress", 4096, 245760, 0),
]


def main():
    signal.signal(signal.SIGALRM, _alarm)
    for what, B, L, W in GRID:
        rec = {"what": what, "B": B, "L": L, "window": W}
        signal.alarm(420)
        try:
            if what == "kernel":
                rec["compile_s"] = round(kernel_only(B, L, W), 1)
            else:
                rec["compile_s"] = round(compress_only(B, L), 1)
        except Timeout:
            rec["error"] = "timeout"
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            rec["error"] = f"{type(e).__name__}: {e}"[:200]
        signal.alarm(0)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
