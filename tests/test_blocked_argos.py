"""ARGOS fast-path golden parity (closes VERDICT r2 "Missing #4" / next #3).

The POES fast path has line-level golden coverage (test_blocked.py,
test_pallas_fused.py); this file closes the remaining (mode x path) cells:
ARGOS (file, ``demodARGOS``, reference chain ``ARGOSdemod/main.c:250-284``)
and ARGOS_REALTIME (``demodARGOSP`` via the oracle/tap_argosp tap) through
BOTH fast paths — the XLA windowed scans and the shipped fused Pallas kernel
(CPU interpret lowering) — asserting every oracle packet is recovered with
matching payload bytes and a timestamp within one sample period.

The inverted-carrier ARGOS_REALTIME recording only decodes through the
framer's inverse-sync path (``ARGOSdemodPortAudio/ByteSync.c:112``), so it
also proves the fast path preserves that behavior per block.
"""

import glob
import os
import subprocess

import numpy as np
import pytest

from project_desert_tortoise_tpu.parallel.blocked import (BlockPlan,
                                                          demodulate_blocked)
from project_desert_tortoise_tpu.utils import synth, wav as W
from project_desert_tortoise_tpu.utils.config import ARGOS, ARGOS_REALTIME

ORACLE_FILE = "/root/repo/oracle/build/demodARGOS"
ORACLE_RT = "/root/repo/oracle/build/tap_argosp"

# core/head/tail all divide by 4096 and total % 512 == 0 (fused window);
# tail covers a full 7-byte packet at 400 bit/s, head covers PLL/AGC settle
PLAN = BlockPlan(core=8192, head=8192, tail=8192, max_frames=8)


def _parse(lines):
    out = []
    for l in lines:
        ts, body = l.split(" ", 1)
        out.append((float(ts.rstrip("i")), body.strip()))
    return out


def _assert_covers(frames, oracle_lines, fs):
    """Every oracle packet appears in `frames` with identical bytes and a
    timestamp inside the same 400 bit/s bit slot (±half a bit period).

    Sub-bit timing cannot be tighter: the frame time is the Gardner-chosen
    sample time of the sync's last bit, and a cold-started per-block Gardner
    converges to the signal's symbol boundaries with a residual of tens of
    samples relative to the oracle's continuously-run loop (measured ~21
    samples here).  The parity contract is frame-level (BASELINE.md:
    sync-rate parity), and POES keeps its stricter exact-timestamp tests."""
    tol = 1.5 / fs
    mine = [(f.time, " ".join(f"{b:02X}" for b in f.data)) for f in frames]
    for ot, obody in _parse(oracle_lines):
        hits = [t for t, body in mine
                if body == obody and abs(t - ot) <= tol]
        assert hits, (ot, obody, mine)


@pytest.fixture(scope="module")
def argos_file_golden(tmp_path_factory):
    if not os.path.exists(ORACLE_FILE):
        pytest.skip("C oracle not built")
    d = tmp_path_factory.mktemp("blocked_argos")
    iq, payloads = synth.make_argos_recording(
        n_packets=4, fs=32000.0, carrier_hz=200.0, snr_db=30.0)
    wav = str(d / "synth_argos.wav")
    W.write_iq_wav(wav, iq / (np.abs(iq).max() * 1.2), 32000)
    subprocess.run([ORACLE_FILE, "synth_argos.wav"], cwd=d,
                   capture_output=True, timeout=300)
    outs = glob.glob(str(d / "packets_*.txt"))
    assert outs, "oracle produced no packets file"
    lines = [l.rstrip() for l in open(outs[0]) if l.strip()]
    assert lines
    return wav, lines


@pytest.fixture(scope="module", params=["normal", "inverted"])
def argosp_golden(request, tmp_path_factory):
    if not os.path.exists(ORACLE_RT):
        pytest.skip("tap_argosp oracle not built")
    d = tmp_path_factory.mktemp(f"blocked_argosp_{request.param}")
    iq, payloads = synth.make_argos_recording(
        n_packets=4, fs=32000.0, carrier_hz=200.0, snr_db=30.0,
        invert_bits=request.param == "inverted")
    iq = iq / (np.abs(iq).max() * 1.2)
    wav = str(d / "synth.wav")
    W.write_iq_wav(wav, iq, 32000)
    out = str(d / "oracle_packets.txt")
    subprocess.run([ORACLE_RT, wav, out], check=True, capture_output=True,
                   timeout=300)
    lines = [l.rstrip() for l in open(out) if l.strip()]
    assert lines, "oracle decoded nothing"
    return wav, lines


def _fast(wav, cfg, use_pallas):
    # ARGOS file mode is the reference's one double-precision app: its
    # oracle accumulates the time axis in f64.  Load f64 and let staging
    # cast to f32 — correctly-rounded per-sample times instead of an
    # f32-accumulated axis that drifts ~0.7 ms/2 s from the oracle's.
    tdt = np.float64 if cfg is ARGOS else np.float32
    iq, t, fs, _ = W.load_iq_wav(wav, tdt)
    iq = iq.astype(np.complex64)
    if use_pallas:
        # the fused kernel needs B % 128 == 0: tile the recording so one
        # batch fills the lane dimension
        reps = -(-128 * PLAN.core // len(iq))
        iq = np.tile(iq, reps)
        t = W.time_axis(len(iq), fs, tdt)
    frames = demodulate_blocked(iq, t, fs, cfg, plan=PLAN,
                                batch_blocks=128,
                                window=512 if use_pallas else 4096,
                                use_pallas="fused" if use_pallas else False)
    return frames, fs


@pytest.mark.parametrize("use_pallas", [False, True],
                         ids=["xla", "pallas_fused"])
def test_argos_file_fast_line_parity(argos_file_golden, use_pallas):
    wav, oracle_lines = argos_file_golden
    frames, fs = _fast(wav, ARGOS, use_pallas)
    _assert_covers(frames, oracle_lines, fs)


@pytest.mark.parametrize("use_pallas", [False, True],
                         ids=["xla", "pallas_fused"])
def test_argos_realtime_fast_line_parity(argosp_golden, use_pallas):
    wav, oracle_lines = argosp_golden
    frames, fs = _fast(wav, ARGOS_REALTIME, use_pallas)
    _assert_covers(frames, oracle_lines, fs)


def test_argos_realtime_inverted_uses_inverse_sync(argosp_golden):
    variant, = [p for p in ["inverted"]
                if p in str(argosp_golden[0])] or ["normal"]
    wav, oracle_lines = argosp_golden
    if variant != "inverted":
        pytest.skip("normal-carrier param")
    frames, _ = _fast(wav, ARGOS_REALTIME, False)
    assert frames and all(f.inverted for f in frames
                          if f.time > 1.0)  # past the first block's warm-up
