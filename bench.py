#!/usr/bin/env python3
"""Benchmark: POES TIP full-chain demod throughput on one TPU chip.

Measures the block-parallel fast path (PLL + FIR-interp + AGC + Gardner +
Manchester + bit compression) end to end over real golden-clip IQ data, with
honest dispatch-to-fetch timing (the axon relay's block_until_ready is
unreliable, so every timed iteration fetches a result to the host).

Prints ONE JSON line:
  {"metric": ..., "value": Msps, "unit": ..., "vs_baseline": x}
vs_baseline is against the reference C demodulator compiled and timed on this
machine (oracle/c_baseline.json; 3.46 Msps through the same chain).
"""

import json
import os
import signal
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_MSPS = 3.4586  # oracle/c_baseline.json fallback
try:
    BASELINE_MSPS = json.load(
        open(os.path.join(REPO, "oracle", "c_baseline.json"))
    )["c_demod_poes_msps"]
except Exception:
    pass


class Timeout(Exception):
    pass


def _alarm(sig, frm):
    raise Timeout()


def run_bench(batch_blocks: int, iters: int):
    """Env overrides for tuning: PDT_BENCH_B, PDT_BENCH_WINDOW,
    PDT_BENCH_PALLAS=1, PDT_BENCH_CORE."""
    import jax
    import jax.numpy as jnp
    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.parallel import blocked as BL
    from project_desert_tortoise_tpu.utils import wav as W
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    fs = 50000.0
    dt = np.dtype(np.float32)
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)
    # 4096-aligned plan so the VMEM-windowed scans divide evenly
    core = int(os.environ.get("PDT_BENCH_CORE", 98304))
    plan = BL.BlockPlan(core=core, head=12288, tail=8192, max_frames=64)
    B = int(os.environ.get("PDT_BENCH_B", batch_blocks))
    # default to the best tuned TPU config (tune_results.json, round 2):
    # the fused Pallas kernel needs B % 128 == 0 or demod_blocks silently
    # falls back to the XLA scan path.
    up = os.environ.get("PDT_BENCH_PALLAS", "fused" if B % 128 == 0 else "0")
    use_pallas = {"0": False, "1": "front", "front": "front",
                  "fused": "fused", "fused2": "fused2",
                  "fused3": "fused3", "fused4": "fused4"}.get(up, False)
    fused_impls = ("fused", "fused2", "fused3", "fused4")
    window = int(os.environ.get(
        "PDT_BENCH_WINDOW", 256 if use_pallas in fused_impls else 4096))

    clip = os.path.join("/root/reference", "5sec_clip.wav")
    if os.path.exists(clip):
        iq, t, fs, _ = W.load_iq_wav(clip)
        re = np.real(iq).astype(dt)
        im = np.imag(iq).astype(dt)
    else:  # synthetic fallback
        from project_desert_tortoise_tpu.utils import synth
        iq, _ = synth.make_poes_recording(n_frames=40, fs=fs)
        re = np.real(iq).astype(dt)
        im = np.imag(iq).astype(dt)
    reps = int(np.ceil((B * plan.core + plan.total) / len(re)))
    rr = np.tile(re, reps)
    ii = np.tile(im, reps)
    tt = W.time_axis(len(rr) + 1, fs, dt)
    brs, bis, tn, bounds = BL.stage_blocks(rr, ii, tt, plan, 0, B, dt)

    jre, jim, jtn = jnp.asarray(brs), jnp.asarray(bis), jnp.asarray(tn)
    jfest = jax.jit(BL.coarse_carrier_est, static_argnums=(2, 3))
    fest = jfest(jre, jim, float(fs), 8320.0)
    _ = np.asarray(fest)  # force

    def call():
        out = BL.demod_blocks(params, plan.total, jre, jim, float(fs), jtn,
                              fest, 17.58, window, use_pallas)
        return np.asarray(out[2])  # fetch n_bits -> true completion

    nb = call()  # compile + warm
    assert int(nb[0]) > 1000, "demod produced no bits"

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    msps = B * plan.core / med / 1e6

    # sanity: frames decode from the staged real data
    out = BL.demod_blocks(params, plan.total, jre, jim, float(fs), jtn,
                          fest, 17.58, window, use_pallas)
    fb = BL.extract_frames(POES_TIP.framer, plan.max_frames, *out[:3])
    n_frames = int(np.asarray(fb.count).sum())
    dev = str(jax.devices()[0])
    return msps, med, n_frames, dev


def probe_device():
    """Tiny end-to-end device touch; raises Timeout if the transport hangs."""
    import jax
    import jax.numpy as jnp
    v = np.asarray(jax.jit(lambda a: a * 2 + 1)(jnp.ones(8)))
    assert float(v[0]) == 3.0


def _parent():
    """Probe via sanitized subprocesses (finite claim timeout, hard wall
    clock) with retries — the round-1 wedge survived because the probe ran
    in-process under the sitecustomize registration whose claim never times
    out.  Only after a probe succeeds is the real bench run, in a child
    that registers with a finite claim timeout so a dying bench can never
    strand the chip (NOTES_r1.md post-mortem)."""
    import subprocess
    try:
        from tools.tpu_connect import spawn_probe
    except Exception:
        return None                  # no axon tooling: run inline
    if not os.path.exists("/opt/axon/libaxon_pjrt.so"):
        return None                  # not an axon host: run inline
    budget = float(os.environ.get("PDT_BENCH_PROBE_BUDGET", "900"))
    deadline = time.time() + budget
    ok, msg = False, ""
    while True:
        ok, msg = spawn_probe(timeout_s=120)
        if ok or time.time() + 165 > deadline:
            break
        time.sleep(45)               # claims can take minutes to expire
    if not ok:
        print(json.dumps({
            "metric": "poes_demod_throughput", "value": 0.0,
            "unit": "Msamples/s/chip", "vs_baseline": 0.0,
            "error": f"device unreachable after retries: {msg[:140]}"}))
        return 0
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # disable no-timeout auto-reg
    env.pop("JAX_PLATFORMS", None)
    env["PDT_BENCH_CHILD"] = "1"
    r = subprocess.run([sys.executable, "-u", os.path.abspath(__file__)],
                       env=env, timeout=1800)
    return r.returncode


def main():
    if os.environ.get("PDT_BENCH_CHILD") != "1":
        rc = _parent()
        if rc is not None:
            return rc
    else:
        try:
            from tools.tpu_connect import fresh_register
            fresh_register(claim_timeout_s=300)
        except Exception:
            pass                     # fall back to the default platform
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(240)
    try:
        probe_device()
        signal.alarm(0)
    except Timeout:
        print(json.dumps({
            "metric": "poes_demod_throughput", "value": 0.0,
            "unit": "Msamples/s/chip", "vs_baseline": 0.0,
            "error": "device unreachable (transport hang on a 8-float jit)"}))
        return
    result = None
    # B = 1024 = 8 sublanes x 128 lanes: the fused kernel batches 8
    # lane-groups into full (8, 128) vregs (tune_results.json round 2)
    for B, iters, budget in [(1024, 5, 900), (128, 5, 420), (64, 3, 300)]:
        signal.alarm(budget)
        try:
            result = run_bench(B, iters)
            signal.alarm(0)
            break
        except Timeout:
            continue
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            print(json.dumps({
                "metric": "poes_demod_throughput", "value": 0.0,
                "unit": "Msamples/s/chip", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:200]}))
            return
    if result is None:
        print(json.dumps({
            "metric": "poes_demod_throughput", "value": 0.0,
            "unit": "Msamples/s/chip", "vs_baseline": 0.0,
            "error": "timeout"}))
        return
    msps, med, n_frames, dev = result
    print(json.dumps({
        "metric": "poes_demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
        "step_ms": round(med * 1e3, 2),
        "frames_decoded": n_frames,
        "device": dev,
    }))


if __name__ == "__main__":
    main()
