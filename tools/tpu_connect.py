"""Robust axon-TPU connection helper.

Round-1 post-mortem (NOTES_r1.md, VERDICT.md item 1): the container's
sitecustomize registers the axon backend with ``claim_timeout_s=None`` —
if a client process dies while holding the device claim, the terminal
never releases it and every later backend touch hangs forever.

This module gives every bench/tool a fail-fast path instead:

* ``fresh_register()`` — manual axon registration with a finite claim
  timeout and optional priority. Must run in a process where the
  sitecustomize auto-registration was disabled (``PALLAS_AXON_POOL_IPS``
  unset), because connect options are a process-lifetime OnceLock.
* ``run_probe()`` — a tiny end-to-end jit+fetch that either succeeds
  quickly or raises; used by watchdogs and by bench.py's probe phase.
* ``spawn_probe()`` — runs the probe in a **subprocess** with a hard
  wall-clock timeout, so the parent never blocks on a wedged transport
  and never holds a claim itself.

Rules learned the hard way (do not regress):
1. Never SIGKILL a python process that may hold an in-flight TPU
   execution; let it fail fast via claim_timeout_s instead.
2. Never trust ``block_until_ready`` through the relay — always time
   dispatch -> ``np.asarray`` fetch.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

SO_PATH = "/opt/axon/libaxon_pjrt.so"


def fresh_register(claim_timeout_s: int = 60, priority: int = 0,
                   topology: str | None = None) -> None:
    """Register axon manually with a finite claim timeout.

    Only valid in a process where sitecustomize did NOT already register
    (run with ``PALLAS_AXON_POOL_IPS`` removed from the env).
    """
    import uuid

    os.environ.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    os.environ.setdefault("AXON_LOOPBACK_RELAY", "1")
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    os.environ["JAX_PLATFORMS"] = "axon"
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    from axon.register import register  # type: ignore

    register(
        None,
        topology or f"{gen}:1x1x1",
        so_path=SO_PATH,
        session_id=str(uuid.uuid4()),
        remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1",
        claim_timeout_s=claim_timeout_s,
        priority=priority,
    )


def run_probe() -> float:
    """Tiny jit + host fetch. Returns elapsed seconds or raises."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    y = jax.jit(lambda a: a * 2 + 1)(jnp.ones(8, jnp.float32))
    v = np.asarray(y)
    assert float(v[0]) == 3.0, v
    return time.time() - t0


_PROBE_SNIPPET = (
    "import sys; sys.path.insert(0, {repo!r});"
    "from tools.tpu_connect import fresh_register, run_probe;"
    "fresh_register(claim_timeout_s={cts});"
    "print('PROBE_OK %.2fs' % run_probe(), flush=True)"
)


def spawn_probe(timeout_s: float = 150.0, claim_timeout_s: int = 45):
    """Run the probe in a sanitized subprocess. Returns (ok, detail).

    The subprocess registers with a finite claim timeout so it fails
    fast instead of wedging; the parent additionally enforces a hard
    wall-clock timeout (safe to enforce — if the child is still in the
    connect/claim phase it holds nothing, and claim_timeout_s bounds
    any grant the terminal may have issued).
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable auto-registration
    env.pop("JAX_PLATFORMS", None)
    code = _PROBE_SNIPPET.format(repo=repo, cts=claim_timeout_s)
    try:
        r = subprocess.run(
            [sys.executable, "-u", "-c", code],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, "probe timeout after %.0fs" % timeout_s
    out = (r.stdout or "") + (r.stderr or "")
    if r.returncode == 0 and "PROBE_OK" in out:
        return True, out.strip().splitlines()[-1]
    tail = out.strip().splitlines()[-3:]
    return False, " | ".join(tail)


if __name__ == "__main__":
    ok, detail = spawn_probe(
        timeout_s=float(os.environ.get("PDT_PROBE_TIMEOUT", "150")))
    print({"ok": ok, "detail": detail})
    sys.exit(0 if ok else 1)
