#!/usr/bin/env python3
"""Print the FULL compile error for the two failing shapes (no truncation).

Run:  /opt/venv/bin/python tools/tpurun.py --cts 150 tools/probe_fullerr.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

from tools.probe_buflimit import compile_only  # noqa: E402


def main():
    for B, L, W in [(4096, 4096, 128)]:
        print(f"=== demod_blocks B={B} L={L} w={W}", flush=True)
        try:
            print("compile_s", compile_only(B, L, W, 32), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{type(e).__name__}:", flush=True)
            print(str(e)[:8000], flush=True)


if __name__ == "__main__":
    sys.exit(main())
