"""Synthetic-signal loop closure + telemetry layer (parity/daytime/metrics)."""

import numpy as np

from project_desert_tortoise_tpu.models.demodulator import DemodSession
from project_desert_tortoise_tpu.telemetry.minorframes import (
    check_parity, daytime_decode, frames_to_matrix, sync_spacing_report)
from project_desert_tortoise_tpu.utils import metrics, synth, wav as W
from project_desert_tortoise_tpu.utils.config import POES_TIP


def _decode(n_frames=12, snr_db=25.0, carrier=-3000.0):
    fs = 50000.0
    iq, sent = synth.make_poes_recording(n_frames=n_frames, fs=fs,
                                         carrier_hz=carrier, snr_db=snr_db)
    t = W.time_axis(len(iq), fs, np.float32)
    res = DemodSession(POES_TIP, fs).run(iq, t)
    return res, sent


def test_synth_roundtrip_payloads():
    res, sent = _decode()
    sent_set = {f.tobytes() for f in sent}
    ok = sum(1 for f in res.frames
             if f.complete and np.asarray(f.data, np.uint8).tobytes() in sent_set)
    assert ok >= len(sent) - 3  # acquisition eats the first frame(s)


def test_parity_all_good():
    res, _ = _decode()
    m = frames_to_matrix(res.frames)
    good, errs = check_parity(m)
    assert len(m) >= 9
    assert good.all()


def test_parity_detects_corruption():
    res, _ = _decode()
    m = frames_to_matrix(res.frames)
    m[0, 10] ^= 1  # flip one bit in group 1
    good, errs = check_parity(m)
    assert not good[0]
    assert errs[0, 0]
    assert good[1:].all()


def test_daytime_decode_spacecraft():
    res, _ = _decode()
    m = frames_to_matrix(res.frames)
    info = daytime_decode(m)
    assert info.spacecraft_name == "NOAA-19"
    # frame counter increments by 1
    d = np.diff(info.minor_frame_ids)
    assert np.all(d == 1)


def _frame0_row(day: int, ms: int, spacecraft: int = 15) -> np.ndarray:
    """A minor frame with id 0 carrying the day/ms-of-day words
    (daytimeDecode.m:20-24 bit layout)."""
    f = np.zeros(104, np.uint8)
    f[2] = spacecraft
    f[4] = 0
    f[5] = 0                       # 9-bit frame id = 0
    f[8] = (day >> 1) & 0xFF
    f[9] = ((day & 1) << 7) | ((ms >> 24) & 0b111)
    f[10] = (ms >> 16) & 0xFF
    f[11] = (ms >> 8) & 0xFF
    f[12] = ms & 0xFF
    return f


def test_t0_consensus_binning():
    """Jittered frame timestamps fragment an exact-rounded-ms mode across
    adjacent milliseconds; the +/-100 ms window (daytimeDecode.m:39
    T0Threshold) must keep the true cluster together and out-vote a
    repeated bogus value."""
    t0_true = 50_000_000.0         # ms of day
    times = np.array([10.0, 20.0, 30.0, 40.0, 55.0, 60.0])
    jitter = np.array([-40.0, 30.0, 45.0, -25.0, 0.0, 0.0])
    rows, tvals = [], []
    for t, j in zip(times[:4], jitter[:4]):
        rows.append(_frame0_row(241, int(round(t0_true + t * 1000.0 + j))))
        tvals.append(t)
    for t in times[4:]:            # two identical corrupted T0s, 1000 s off
        rows.append(_frame0_row(241, int(round(t0_true - 1e6 + t * 1000.0))))
        tvals.append(t)
    info = daytime_decode(np.stack(rows), np.asarray(tvals))
    # exact-ms mode would pick the bogus pair (count 2 beats four count-1
    # fragments); windowed support must recover the jittered majority
    assert abs(info.t0_ms_best - t0_true) <= 100.0
    assert info.t0_outliers is not None
    assert info.t0_outliers.tolist() == [False] * 4 + [True] * 2
    assert info.julian_day == 241


def test_positive_carrier_offset():
    res, sent = _decode(carrier=2500.0)
    assert res.total_frames >= len(sent) - 3


def test_quality_metric_range():
    # PM at 67 deg: |pi/2 - avg|phase|| ~ 0.4 rad -> about -8 dB
    res, _ = _decode(snr_db=30.0)
    assert res.quality_db > -12.0


def test_m2m4_snr():
    rng = np.random.default_rng(0)
    x = np.where(rng.random(20000) > 0.5, 1.0, -1.0)
    noisy = x + 0.1 * rng.standard_normal(20000)
    est = metrics.m2m4_snr_db(noisy.astype(np.float32))
    assert 18.0 < est < 22.0  # true 20 dB


def test_sync_spacing():
    pos = np.array([0, 832, 1664, 3000, 3832])
    n_ok, n_total = sync_spacing_report(pos)
    assert (n_ok, n_total) == (3, 4)


def test_argos_quality_annotation(tmp_path):
    """Packets carry quality/SNR annotations (reference README.md:42 TODO)."""
    from project_desert_tortoise_tpu.utils.config import ARGOS
    iq, payloads = synth.make_argos_recording(n_packets=3, fs=32000.0,
                                              snr_db=30.0)
    t = W.time_axis(len(iq), 32000.0, np.float64)
    sess = DemodSession(ARGOS, 32000.0, annotate_quality=True, quirks=False)
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        res = sess.run(iq, t)
    finally:
        jax.config.update("jax_enable_x64", False)
    assert res.total_frames >= 2
    for f in res.frames:
        assert f.snr_db is not None and np.isfinite(f.snr_db)
        assert "snr=" in f.hex_line(with_quality=True)


def test_argos_platform_filter_and_report():
    from project_desert_tortoise_tpu.ops.framer import Frame
    from project_desert_tortoise_tpu.telemetry import argos as TA
    mk = lambda t, data: Frame(t, False, np.asarray(data, np.uint8),
                               True, -4.0, 12.0)
    pkts = [mk(10.0, [251, 58, 208, 0, 1, 2, 3]),
            mk(70.5, [251, 58, 208, 0, 1, 2, 4]),
            mk(33.0, [9, 9, 9, 9, 0, 0, 0])]
    mine = TA.filter_platform(pkts)
    assert len(mine) == 2
    groups = TA.group_by_repetition(mine)
    assert len(groups) == 1 and len(groups[0]) == 2
    rep = TA.packet_report(pkts)
    assert "251-58-208-0: 2 packets" in rep
    assert "snr=" in rep


import pytest


@pytest.mark.parametrize("fs,interp", [(96000.0, 2), (150000.0, 1),
                                       (32000.0, 5)])
def test_dynamic_sample_rates(fs, interp):
    """Dynamic FIR design: interp = rint(150k/Fs) (POESTIPdemod/main.c:335);
    the chain must decode at any input rate, including interp == 1."""
    from project_desert_tortoise_tpu.utils.config import POES_TIP
    assert POES_TIP.fir.interp_factor(fs) == interp
    iq, sent = synth.make_poes_recording(n_frames=8, fs=fs,
                                         carrier_hz=-3000.0, snr_db=28.0)
    t = W.time_axis(len(iq), fs, np.float32)
    res = DemodSession(POES_TIP, fs, quirks=False).run(iq, t)
    sset = {f.tobytes() for f in sent}
    ok = sum(1 for f in res.frames
             if f.complete and np.asarray(f.data, np.uint8).tobytes() in sset)
    assert ok >= 4
