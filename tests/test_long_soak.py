"""Long-recording parity soak (VERDICT r1 item 8).

Over multi-minute recordings the exact chain's libm transcendentals (XLA's
sin/cos vs glibc's) can differ from the C oracle by 1 ulp; on rare samples
that flips one ``rint`` in Gardner clock recovery, shifting a frame's
timestamp by exactly one sample period while leaving every payload byte
identical.  This is inherent to reimplementation (the golden 5 s clip is
bit-identical; the flips appear ~1 per 30 s of signal) — so this test PINS
the bound instead of pretending it is zero:

  * every frame's 104 payload bytes byte-identical to the oracle,
  * frame count identical,
  * timestamp mismatches on <= 2%% of frames (measured: 5/398 at 28 dB SNR,
    3/1998 on the round-1 10M-sample soak), each by <= 1 sample period.

See docs/DESIGN.md "Numerical parity envelope".
"""

import os
import subprocess

import numpy as np
import pytest

from project_desert_tortoise_tpu.utils import synth, wav as W
from project_desert_tortoise_tpu.utils.config import POES_TIP

ORACLE = "/root/repo/oracle/build/demodPOES"
N_FRAMES = 400          # 40 s of signal @ 10 frames/s -> ~2M samples


@pytest.fixture(scope="module")
def soak_pair(tmp_path_factory):
    if not os.path.exists(ORACLE):
        pytest.skip("C oracle not built")
    d = tmp_path_factory.mktemp("soak")
    fs = 50000.0
    iq, sent = synth.make_poes_recording(n_frames=N_FRAMES, fs=fs,
                                         snr_db=28.0)
    wav = str(d / "soak.wav")
    W.write_iq_wav(wav, iq / (np.abs(iq).max() * 1.2), int(fs))
    subprocess.run([ORACLE, "soak.wav"], cwd=d, capture_output=True,
                   timeout=600)
    import glob
    outs = glob.glob(str(d / "minorFrames_*.txt"))
    assert outs, "oracle produced no output"
    lines = [l.rstrip() for l in open(outs[0]) if l.strip()]
    return wav, lines


def test_soak_parity_bound(soak_pair):
    wav, oracle_lines = soak_pair
    from project_desert_tortoise_tpu.models.demodulator import demodulate_wav
    res = demodulate_wav(wav, POES_TIP)
    mine = [f.hex_line() for f in res.frames]
    # the final partial frame line is emitted without trailing newline by
    # the reference; compare complete frames
    o_complete = [l for l in oracle_lines if len(l.split()) == 105]
    m_complete = [f.hex_line() for f in res.frames if f.complete]
    assert len(m_complete) == len(o_complete), \
        (len(m_complete), len(o_complete))

    ts_mismatch = 0
    for a, b in zip(m_complete, o_complete):
        at, ab = a.split(" ", 1)
        bt, bb = b.split(" ", 1)
        assert ab == bb, (a, b)           # payload bytes always identical
        if at != bt:
            ts_mismatch += 1
            da = abs(float(at.rstrip("i")) - float(bt.rstrip("i")))
            assert da <= 1.1 / 50000.0, (a, b)   # <= one sample period
    assert ts_mismatch <= max(2, len(o_complete) // 50), \
        f"{ts_mismatch}/{len(o_complete)} timestamp mismatches"


def test_integer_timebase_past_f32_stall():
    """timebase="integer" (VERDICT r4 item 8): exact timestamps beyond the
    accumulated-f32 fold's stall point.

    The reference timebase is a float32 ``t += Ts`` fold (wave.c:167); at
    t ~ 4096 s its ulp (~4.9e-4 s) exceeds Ts/2 at 50 ksps and the axis
    quantizes (pinned below).  The integer-counter mode must emit frame
    times at a 5000 s stream offset that match the base-0 run shifted by
    exactly 5000 s, to well under one sample period."""
    from project_desert_tortoise_tpu.models.demodulator import DemodSession
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    fs = 50000.0
    ts = 1.0 / fs
    # motivation pin: the f32 fold really does stall past 4096 s
    stall = np.float32(5000.0)
    assert np.float32(stall + np.float32(ts)) == stall

    iq, sent = synth.make_poes_recording(n_frames=12, fs=fs, snr_db=28.0)
    t = W.time_axis(len(iq), fs, np.float32)    # ignored in integer mode

    def run(n0):
        sess = DemodSession(POES_TIP, fs, quirks=False, norm_factor=17.58,
                            timebase="integer")
        sess._n0 = n0
        res = sess.run(iq, t)
        return [(f.time, f.data.tobytes()) for f in res.frames
                if f.complete]

    base = run(0)
    offset_s = 5000.0
    far = run(int(offset_s * fs))
    assert len(base) == len(far) >= 8
    for (t0, d0), (t1, d1) in zip(base, far):
        assert d0 == d1                       # payloads identical
        # exact to ~1e-7 s at t ~ 5000 s (vs the fold's 4.9e-4 s ulp)
        assert abs((t1 - t0) - offset_s) < 1e-6, (t0, t1)


def test_integer_timebase_exact_grid():
    """Same payloads as the accumulated fold, but times on the TRUE
    sample grid: the reference's f32 ``t += Ts`` fold drifts ~1e-4 s per
    stream-second even near t=0 (biased accumulation rounding — C-oracle
    parity pins that the reference prints the same drifted values), while
    integer-mode times are exact multiples of Ts at f64 precision."""
    from project_desert_tortoise_tpu.models.demodulator import DemodSession
    from project_desert_tortoise_tpu.utils.config import POES_TIP

    fs = 50000.0
    iq, _ = synth.make_poes_recording(n_frames=8, fs=fs, snr_db=28.0)
    t = W.time_axis(len(iq), fs, np.float32)
    a = DemodSession(POES_TIP, fs, quirks=False, norm_factor=17.58).run(iq, t)
    b = DemodSession(POES_TIP, fs, quirks=False, norm_factor=17.58,
                     timebase="integer").run(iq, t)
    la = [f for f in a.frames if f.complete]
    lb = [f for f in b.frames if f.complete]
    assert len(la) == len(lb) >= 5
    for fa, fb in zip(la, lb):
        assert fa.data.tobytes() == fb.data.tobytes()
        # integer-mode timestamps sit on the n*Ts grid...
        frac = (fb.time * fs) % 1.0
        assert min(frac, 1.0 - frac) < 1e-3, fb.time
        # ...within the fold's known drift envelope of the same frame
        assert abs(fa.time - fb.time) < 1e-3
