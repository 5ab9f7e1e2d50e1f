"""Multi-channel fast path + PLL reacquisition watchdog."""

import numpy as np

from project_desert_tortoise_tpu.models.demodulator import DemodSession
from project_desert_tortoise_tpu.parallel.blocked import (default_plan,
                                                          demodulate_many)
from project_desert_tortoise_tpu.utils import synth, wav as W
from project_desert_tortoise_tpu.utils.config import POES_TIP


def test_demodulate_many_channels():
    fs = 50000.0
    iq1, sent1 = synth.make_poes_recording(n_frames=5, fs=fs, snr_db=28.0,
                                           carrier_hz=-3000.0)
    iq2, sent2 = synth.make_poes_recording(n_frames=5, fs=fs, snr_db=28.0,
                                           carrier_hz=2200.0)
    n = min(len(iq1), len(iq2))
    iqs = np.stack([iq1[:n], iq2[:n]])
    t = W.time_axis(n, fs, np.float32)
    plan = default_plan(POES_TIP, fs, core=16384)
    res = demodulate_many(iqs, t, fs, POES_TIP, plan=plan, batch_blocks=8)
    s1 = {f.tobytes() for f in sent1}
    s2 = {f.tobytes() for f in sent2}
    ok1 = sum(1 for f in res[0] if np.asarray(f.data, np.uint8).tobytes() in s1)
    ok2 = sum(1 for f in res[1] if np.asarray(f.data, np.uint8).tobytes() in s2)
    assert ok1 >= 4 and ok2 >= 4


def test_reacquisition_watchdog():
    """Signal disappears mid-stream and returns at a different carrier; the
    watchdog must re-enter acquisition and decode the second burst."""
    fs = 50000.0
    iq1, sent1 = synth.make_poes_recording(n_frames=5, fs=fs,
                                           carrier_hz=-3000.0, snr_db=28.0)
    iq2, sent2 = synth.make_poes_recording(n_frames=5, fs=fs,
                                           carrier_hz=3500.0, snr_db=28.0)
    rng = np.random.default_rng(3)
    gap = (0.002 * (rng.standard_normal(60000)
                    + 1j * rng.standard_normal(60000))).astype(np.complex64)
    iq = np.concatenate([iq1, gap, iq2])
    t = W.time_axis(len(iq), fs, np.float32)

    sess = DemodSession(POES_TIP, fs, quirks=False, reacquire_after_s=0.5,
                        reacquire_quality_db=-12.0)
    res = sess.run(iq, t)
    assert sess.reacquisitions >= 1
    s2 = {f.tobytes() for f in sent2}
    ok2 = sum(1 for f in res.frames
              if f.complete and np.asarray(f.data, np.uint8).tobytes() in s2)
    assert ok2 >= 2
