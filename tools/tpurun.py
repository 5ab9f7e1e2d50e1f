#!/usr/bin/env python3
"""Run a python script against the TPU with fail-fast axon registration.

Usage:  python tools/tpurun.py [--cts 90] script.py [args...]

Re-execs the target in a sanitized environment (sitecustomize
auto-registration disabled) and registers the axon backend with a finite
claim timeout, so a transport wedge surfaces as an exception instead of an
infinite hang. See tools/tpu_connect.py for the background.
"""

import os
import runpy
import sys


def main():
    argv = sys.argv[1:]
    cts = 90
    if argv and argv[0] == "--cts":
        cts = int(argv[1])
        argv = argv[2:]
    if not argv:
        print(__doc__)
        return 2

    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        # re-exec with auto-registration disabled
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS")
        env.pop("JAX_PLATFORMS", None)
        env["PDT_TPURUN_CTS"] = str(cts)
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)] + argv, env)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.tpu_connect import fresh_register
    fresh_register(claim_timeout_s=int(os.environ.get("PDT_TPURUN_CTS", cts)))

    sys.argv = argv
    runpy.run_path(argv[0], run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
