"""End-to-end golden parity: our exact chain vs the local C oracle.

The C reference itself is platform-sensitive at the 1-2 weak-bit level (the
committed 2020 golden and today's locally-built oracle agree on 45/46 frame
payloads with 2 single-byte diffs), so the contract here is:

- identical frame count and sync timestamps (within one symbol period),
- byte-for-byte payload equality with at most 2 differing bytes total,
- identical symbol/bit totals (strong evidence of per-sample agreement).
"""

import numpy as np
import pytest

from project_desert_tortoise_tpu.models.demodulator import DemodSession
from project_desert_tortoise_tpu.utils.config import POES_TIP


@pytest.fixture(scope="module")
def golden_run(poes_clip, taps_dir):
    iq, t, fs = poes_clip
    sess = DemodSession(POES_TIP, fs)
    res = sess.run(iq, t)
    return res


def test_frame_count(golden_run, oracle_frames):
    assert golden_run.total_frames == len(oracle_frames)


def test_totals(golden_run):
    # from the local oracle run: 83259 symbols, 41703 bits
    assert golden_run.total_symbols == 83259
    assert golden_run.total_bits == 41703


def test_frames_match_oracle(golden_run, oracle_frames):
    byte_diffs = 0
    for f, (ot, oinv, obytes) in zip(golden_run.frames, oracle_frames):
        assert abs(f.time - ot) < 1e-4, (f.time, ot)
        assert f.inverted == oinv
        assert len(f.data) == len(obytes)
        byte_diffs += int(np.sum(np.asarray(f.data) != np.asarray(obytes)))
    assert byte_diffs <= 2, f"{byte_diffs} byte diffs vs oracle"


def test_hex_lines_match_oracle(golden_run, taps_dir):
    import os
    oracle_lines = [l.rstrip().rstrip("\n") for l in
                    open(os.path.join(taps_dir, "frames.txt")) if l.strip()]
    mine = [f.hex_line() for f in golden_run.frames]
    same = sum(1 for a, b in zip(mine, oracle_lines) if a == b)
    assert same >= len(oracle_lines) - 2


def test_lock_frequency(golden_run):
    # oracle printed: "PLL locked at -3466.19Hz"
    assert golden_run.lock_freq_hz is not None
    assert abs(golden_run.lock_freq_hz - (-3466.19)) < 60.0


def test_quality_metric(golden_run):
    # oracle console ended at -3.6Q (GOOD region)
    assert -4.0 < golden_run.quality_db < -3.2
