#!/usr/bin/env python3
"""Scaling-efficiency benchmark over a device mesh (BASELINE.md: samples/s at
1 chip / 1 host / N hosts, >=80% efficiency target).

On this container only one real chip is reachable, so by default this runs on
the forced-host CPU backend with a virtual 8-device mesh — which exercises the
sharding/halo machinery end to end; on a real slice, run with JAX_PLATFORMS
unset to use all chips.

Timing is the jitted sharded step only (dispatch -> host fetch of the frame
counts), with host staging and compilation excluded — that is the quantity
that scales with devices.  Prints one JSON line per mesh size and writes
SCALING_r{N}.json (PDT_SCALING_OUT overrides).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

if os.environ.get("PDT_SCALING_CPU", "1") == "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")


def lane_scaling():
    """Real-chip lane scaling: demod_blocks throughput vs block batch B.

    Run via  python tools/tpurun.py bench_scaling.py --lanes  on the TPU.
    """
    import jax
    import jax.numpy as jnp
    from project_desert_tortoise_tpu import chain as chain_lib
    from project_desert_tortoise_tpu.parallel import blocked as BL
    from project_desert_tortoise_tpu.utils import wav as W
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    fs = 50000.0
    dt = np.dtype(np.float32)
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)
    plan = BL.BlockPlan(core=225280, head=12288, tail=8192, max_frames=64)
    impl = os.environ.get("PDT_BENCH_PALLAS", "fused")
    use_pallas = {"0": False, "front": "front", "fused": "fused"}[impl]
    iq, t, fs, _ = W.load_iq_wav("/root/reference/5sec_clip.wav")
    re0 = np.real(iq).astype(dt)
    im0 = np.imag(iq).astype(dt)
    rows = []
    for B in [128, 256, 512, 1024, 2048]:
        # window follows the sublane count (VMEM): 256 up to S=8, the
        # round-4 champion 160 with unroll 16 at S=16 (tune_results.json)
        window = 160 if B >= 2048 else 256
        unroll = 16 if B >= 2048 else 0
        try:
            reps = int(np.ceil((B * plan.core + plan.total) / len(re0)))
            rr, ii = np.tile(re0, reps), np.tile(im0, reps)
            tt = W.time_axis(len(rr) + 1, fs, dt)
            brs, bis, tn, _ = BL.stage_blocks(rr, ii, tt, plan, 0, B, dt)
            jre, jim = jnp.asarray(brs), jnp.asarray(bis)
            fest = BL.coarse_carrier_est(jre, jim, float(fs), 8320.0)
            _ = np.asarray(fest)
            # in-kernel time generation on the fused path (as bench.py):
            # at S=16 the staged time plane is the third input plane that
            # busts VMEM (tune_results round-4 notes)
            tgen = use_pallas == "fused" and B % 128 == 0
            if tgen:
                lo = np.arange(B) * plan.core - plan.head
                pad0 = np.maximum(-lo, 0)
                # t[i+1] seed only for interpolating modes (as bench.py /
                # stage_flat_slices); interp==1 modes seed at t[i]
                off = 1 if params.interp > 1 else 0
                seeds = jnp.asarray(tt[np.clip(lo + off + pad0, 0,
                                               len(tt) - 1)].astype(dt))
                jpad0 = jnp.asarray(pad0.astype(dt))
                jtn = None
            else:
                seeds = jpad0 = None
                jtn = jnp.asarray(tn)

            def call():
                out = BL.demod_blocks(params, plan.total, jre, jim,
                                      float(fs), jtn, fest, 17.58, window,
                                      use_pallas, unroll, seeds, jpad0)
                return np.asarray(out[2])
            call()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                call()
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            msps = B * plan.core / med / 1e6
            row = {"metric": "lane_scaling", "B": B, "impl": impl,
                   "value": round(msps, 1), "unit": "Msamples/s",
                   "step_ms": round(med * 1e3, 1), "window": window,
                   "device": str(jax.devices()[0])}
        except Exception as e:  # noqa: BLE001 — keep earlier rows
            row = {"metric": "lane_scaling", "B": B, "impl": impl,
                   "window": window,
                   "error": f"{type(e).__name__}: {e}"[:160]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    import jax
    devices = jax.devices()
    if len(devices) < 2:
        devices = jax.devices("cpu")
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P
    from project_desert_tortoise_tpu.parallel import sharding as SH
    from project_desert_tortoise_tpu.parallel.blocked import BlockPlan
    from project_desert_tortoise_tpu.utils import synth, wav as W
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    fs = 50000.0
    n_frames = int(os.environ.get("PDT_SCALING_FRAMES", "64"))
    iters = int(os.environ.get("PDT_SCALING_ITERS", "3"))
    iq, _ = synth.make_poes_recording(n_frames=n_frames, fs=fs, snr_db=28.0)
    t = W.time_axis(len(iq), fs, np.float32)
    plan = BlockPlan(core=16384, head=8192, tail=6144, max_frames=8)

    rows = []
    base = None
    for n_blk in [1, 2, 4, 8]:
        if n_blk > len(devices):
            break
        mesh = SH.make_mesh(1, n_blk, devices)
        params, plan_, re, im, tn, bounds, norm = SH.stage_global(
            iq[None, :], t, fs, POES_TIP, mesh, plan)
        sh = NamedSharding(mesh, P("ch", "blk"))
        step = SH.sharded_demod_step(params, plan_, POES_TIP.framer, mesh,
                                     float(fs))
        args = (jax.device_put(re, sh), jax.device_put(im, sh),
                jax.device_put(tn, sh),
                jax.device_put(bounds, NamedSharding(mesh, P("ch", "blk", None))),
                jax.device_put(norm, NamedSharding(mesh, P(None, None))))
        t0 = time.perf_counter()
        out = step(*args)
        nf = int(np.asarray(out[3]).sum())
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = step(*args)
            _ = np.asarray(out[3])      # fetch -> true completion
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        # the device path processes the padded global length
        msps = re.shape[1] / dt / 1e6
        base = base if base is not None else msps
        eff = msps / (base * n_blk)
        row = {"metric": "scaling", "devices": n_blk,
               "value": round(msps, 3), "unit": "Msamples/s",
               "efficiency_vs_1dev": round(eff, 3),
               "frames": nf, "step_s": round(dt, 3),
               "warm_s": round(warm, 1),
               "backend": str(devices[0].platform),
               "label": ("measured" if n_blk <= os.cpu_count()
                         else "host-core contention (virtual mesh "
                              "oversubscribes a %d-core host %dx)"
                              % (os.cpu_count(),
                                 max(1, n_blk // os.cpu_count())))}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Weak scaling: fixed work per device (the deployment-relevant metric
    # for a throughput pipeline — more chips demodulate more channels /
    # longer recordings, not the same clip faster).  Recording length grows
    # with the mesh, so per-shard block count is constant.
    base = None
    for n_blk in [1, 2, 4, 8]:
        if n_blk > len(devices):
            break
        iq_n, _ = synth.make_poes_recording(
            n_frames=max(8, n_frames // 8) * n_blk, fs=fs, snr_db=28.0)
        t_n = W.time_axis(len(iq_n), fs, np.float32)
        mesh = SH.make_mesh(1, n_blk, devices)
        params, plan_, re, im, tn, bounds, norm = SH.stage_global(
            iq_n[None, :], t_n, fs, POES_TIP, mesh, plan)
        sh = NamedSharding(mesh, P("ch", "blk"))
        step = SH.sharded_demod_step(params, plan_, POES_TIP.framer, mesh,
                                     float(fs))
        args = (jax.device_put(re, sh), jax.device_put(im, sh),
                jax.device_put(tn, sh),
                jax.device_put(bounds, NamedSharding(mesh, P("ch", "blk", None))),
                jax.device_put(norm, NamedSharding(mesh, P(None, None))))
        t0 = time.perf_counter()
        out = step(*args)
        nf = int(np.asarray(out[3]).sum())
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = step(*args)
            _ = np.asarray(out[3])
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        msps = re.shape[1] / dt / 1e6
        base = base if base is not None else msps
        eff = msps / (base * n_blk)
        row = {"metric": "weak_scaling", "devices": n_blk,
               "value": round(msps, 3), "unit": "Msamples/s",
               "efficiency_vs_1dev": round(eff, 3),
               "frames": nf, "step_s": round(dt, 3),
               "warm_s": round(warm, 1),
               "backend": str(devices[0].platform),
               "label": ("measured" if n_blk <= os.cpu_count()
                         else "host-core contention (virtual mesh "
                              "oversubscribes a %d-core host %dx)"
                              % (os.cpu_count(),
                                 max(1, n_blk // os.cpu_count())))}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Per-device sharded work is invariant in n_blk (each shard demodulates
    # its own blocks after a one-shot halo exchange), so real-chip scaling
    # efficiency is bounded by the collective fraction.  Quantify it:
    # bytes moved per shard per step = 3 streams x (head+tail) x 4 B plus the
    # returned frame buffers — microseconds on ICI vs the measured step time.
    halo_bytes = 3 * (plan.head + plan.tail) * 4
    step_s = rows[0]["step_s"] if rows else 1.0
    ici_gbps = 45.0        # conservative v5e per-link ICI bandwidth (GB/s)
    t_halo = halo_bytes / (ici_gbps * 1e9)
    projection = {
        "metric": "ici_projection",
        "label": "ANALYTIC MODEL, not a measurement",
        "halo_bytes_per_shard": halo_bytes,
        "t_halo_s_at_45GBps": t_halo,
        "single_dev_step_s": step_s,
        "projected_efficiency": round(step_s / (step_s + t_halo), 6),
        "note": ("virtual-CPU-mesh rows above share one host CPU's cores, so "
                 "their 'efficiency' measures core contention, not the "
                 "sharding design; per-shard work is independent of mesh "
                 "size and the only cross-device traffic is the halo ring."),
    }
    rows.append(projection)
    print(json.dumps(projection), flush=True)

    # Defensible-evidence summary (VERDICT r2 next #7): which rows are real
    # measurements of the scaling design vs artifacts of the 2-core host.
    weak2 = next((r for r in rows if r.get("metric") == "weak_scaling"
                  and r.get("devices") == 2), None)
    summary = {
        "metric": "summary",
        "defensible_rows": [
            "weak_scaling devices<=2 (measured; each virtual device gets a "
            "real core)",
            "lane_scaling (real-chip measurements, see entries)",
        ],
        "weak_scaling_2dev_efficiency": (weak2 or {}).get(
            "efficiency_vs_1dev"),
        "contention_rows": "devices>2 entries are labeled; they measure "
                           "2-core host oversubscription, not the sharding "
                           "design",
        "baseline_target": ">=0.8 efficiency at N>=2 (BASELINE.md)",
    }
    rows.append(summary)
    print(json.dumps(summary), flush=True)

    out_path = os.environ.get("PDT_SCALING_OUT",
                              os.path.join(REPO, "SCALING_r04.json"))
    existing = []
    if os.path.exists(out_path):
        try:
            existing = [r for r in json.load(open(out_path))
                        if r.get("metric") == "lane_scaling"]
        except Exception:
            existing = []
    with open(out_path, "w") as f:
        json.dump(rows + existing, f, indent=1)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", action="store_true",
                    help="real-chip lane scaling (run under tools/tpurun.py)")
    a = ap.parse_args()
    if a.lanes:
        rows = lane_scaling()
        out_path = os.environ.get("PDT_SCALING_OUT",
                                  os.path.join(REPO, "SCALING_r04.json"))
        existing = []
        if os.path.exists(out_path):
            try:
                existing = [r for r in json.load(open(out_path))
                            if r.get("metric") != "lane_scaling"]
            except Exception:
                existing = []
        with open(out_path, "w") as f:
            json.dump(existing + rows, f, indent=1)
    else:
        main()
