#!/usr/bin/env python3
"""Probe the container->TPU upload path: rate vs transfer size and vs
concurrent stream count.

The round-4 E2E wall is ~96% host->device upload through the container
tunnel (25-38 MB/s observed).  Before investing in staging-byte diets,
measure whether (a) the rate depends on transfer granularity and (b)
multiple concurrent ``jax.device_put`` streams aggregate to more than one
stream's rate (TCP-window-bound tunnels often do).

Run:  python tools/tpurun.py --cts 300 tools/probe_tunnel.py
"""

import concurrent.futures as cf
import json
import sys
import time

import numpy as np


def upload(arrs):
    """device_put + fence (fetch 1 element of each) -> seconds."""
    import jax

    t0 = time.perf_counter()
    devs = [jax.device_put(a) for a in arrs]
    for d in devs:
        np.asarray(d[:1])
    return time.perf_counter() - t0


def main():
    import jax

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    rows = []

    # rate vs size, one stream
    for mb in (16, 64, 256):
        a = rng.integers(-2000, 2000, size=mb * 512 * 1024,
                         dtype=np.int16)
        upload([a[: 1024]])          # warm
        s = upload([a])
        rows.append({"probe": "size", "mb": mb, "s": round(s, 3),
                     "mbps": round(mb / s, 1)})
        print(rows[-1], flush=True)

    # concurrent streams: same total bytes, split across k threads
    total_mb = 256
    a = rng.integers(-2000, 2000, size=total_mb * 512 * 1024,
                     dtype=np.int16)
    for k in (1, 2, 4, 8):
        parts = np.array_split(a, k)
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(k) as ex:
            list(ex.map(lambda p: upload([p]), parts))
        s = time.perf_counter() - t0
        rows.append({"probe": "streams", "k": k, "mb": total_mb,
                     "s": round(s, 3), "mbps": round(total_mb / s, 1)})
        print(rows[-1], flush=True)

    json.dump(rows, open("/tmp/probe_tunnel.json", "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
