#!/usr/bin/env python3
"""Interp-level vs decode-success study for the upsampling clock-recovery
variants — the framework-owned reproduction of the reference's
``standalone_matlab/Functionized/MM_interplevel_vs_success.png`` evidence
(VERDICT r4 item 7).

Sweeps upsample level x kernel x algorithm over a synthesized POES
recording and counts correctly recovered frames (payload-matched against
the transmitted set).  Writes docs/studies/upsampling_levels.json and a
PNG rendered with the repo's dependency-free plotter.

    JAX_PLATFORMS=cpu python tools/study_upsampling.py [--frames 8]
"""

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--snr", type=float, default=16.0)
    ap.add_argument("--levels", default="1,2,3,4,6,8")
    ap.add_argument("--out-dir", default=os.path.join(REPO, "docs",
                                                      "studies"))
    args = ap.parse_args()

    from project_desert_tortoise_tpu.models.demodulator import DemodSession
    from project_desert_tortoise_tpu.utils import synth, wav as W
    from project_desert_tortoise_tpu.utils.config import FIRConfig, POES_TIP
    from project_desert_tortoise_tpu.utils.png import render_series_png

    iq, sent = synth.make_poes_recording(n_frames=args.frames, fs=50000.0,
                                         snr_db=args.snr)
    t = W.time_axis(len(iq), 50000.0, np.float32)
    sset = {f.tobytes() for f in sent}
    levels = [int(x) for x in args.levels.split(",")]

    rows = []
    for alg in ("upsampling_gardner", "upsampling_mm"):
        for kind in ("cubic", "linear"):
            for lv in levels:
                cfg = dataclasses.replace(
                    POES_TIP,
                    fir=FIRConfig(cutoff_hz=11000.0, base_order=26,
                                  target_rate_hz=None, interp=1),
                    gardner=dataclasses.replace(
                        POES_TIP.gardner, algorithm=alg,
                        upsample_level=lv, upsample_kind=kind,
                        gain=1.0, error_limit=2.0))
                res = DemodSession(cfg, 50000.0, quirks=False,
                                   norm_factor=17.58).run(iq, t)
                ok = sum(1 for f in res.frames if f.complete and
                         np.asarray(f.data, np.uint8).tobytes() in sset)
                rows.append({"algorithm": alg, "kind": kind, "level": lv,
                             "frames_sent": args.frames,
                             "frames_ok": ok,
                             "success": round(ok / args.frames, 3)})
                print(json.dumps(rows[-1]), flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    meta = {"snr_db": args.snr, "fs": 50000.0, "mode": "poes_tip interp=1",
            "note": "decode success vs upsample level; twin of "
                    "MM_interplevel_vs_success.png", "rows": rows}
    with open(os.path.join(args.out_dir, "upsampling_levels.json"),
              "w") as f:
        json.dump(meta, f, indent=1)

    series = {}
    for alg in ("upsampling_gardner", "upsampling_mm"):
        for kind in ("cubic", "linear"):
            pts = [(r["level"], r["success"]) for r in rows
                   if r["algorithm"] == alg and r["kind"] == kind]
            series[f"{alg.split('_')[1]}/{kind}"] = (
                [p[0] for p in pts], [p[1] for p in pts])
    render_series_png(os.path.join(args.out_dir, "upsampling_levels.png"),
                      series, title="decode success vs upsample level",
                      xlabel="upsample level L", ylabel="success fraction",
                      markers=True)
    print("wrote", args.out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
