#!/usr/bin/env python3
"""Scaling-efficiency benchmark over a device mesh (BASELINE.md: samples/s at
1 chip / 1 host / N hosts, >=80% efficiency target).

On this container only one real chip is reachable, so by default this runs on
the forced-host CPU backend with a virtual 8-device mesh — which exercises the
sharding/halo machinery end to end; on a real slice, run with JAX_PLATFORMS
unset to use all chips.  Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

if os.environ.get("PDT_SCALING_CPU", "1") == "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")


def main():
    import jax
    devices = jax.devices()
    if len(devices) < 2:
        devices = jax.devices("cpu")
    import jax.numpy as jnp  # noqa: F401
    from project_desert_tortoise_tpu.parallel.blocked import BlockPlan
    from project_desert_tortoise_tpu.parallel.sharding import (
        demodulate_sharded, make_mesh)
    from project_desert_tortoise_tpu.utils import synth, wav as W
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    fs = 50000.0
    iq, _ = synth.make_poes_recording(n_frames=24, fs=fs, snr_db=28.0)
    t = W.time_axis(len(iq), fs, np.float32)
    plan = BlockPlan(core=16384, head=8192, tail=6144, max_frames=8)

    results = {}
    for n_blk in [1, 2, 4, 8]:
        if n_blk > len(devices):
            break
        mesh = make_mesh(1, n_blk, devices)
        t0 = time.perf_counter()
        res = demodulate_sharded(iq[None, :], t, fs, POES_TIP, mesh, plan=plan)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = demodulate_sharded(iq[None, :], t, fs, POES_TIP, mesh, plan=plan)
        dt = time.perf_counter() - t0
        msps = len(iq) / dt / 1e6
        results[n_blk] = msps
        eff = msps / (results[1] * n_blk) if 1 in results else 1.0
        print(json.dumps({
            "metric": "scaling", "devices": n_blk,
            "value": round(msps, 3), "unit": "Msamples/s",
            "efficiency_vs_1dev": round(eff, 3),
            "frames": len(res[0]), "warm_s": round(warm, 1)}))


if __name__ == "__main__":
    main()
