"""Streaming session (ring-fed) and checkpoint/resume tests."""

import threading

import numpy as np
import pytest

from project_desert_tortoise_tpu.models.demodulator import DemodSession
from project_desert_tortoise_tpu.utils import synth, wav as W
from project_desert_tortoise_tpu.utils.config import POES_TIP


def _synth():
    iq, sent = synth.make_poes_recording(n_frames=8, fs=50000.0, snr_db=28.0)
    t = W.time_axis(len(iq), 50000.0, np.float32)
    return iq, t, sent


def test_streaming_matches_batch():
    from project_desert_tortoise_tpu.native import wavio as N
    if not N.available():
        pytest.skip("native ring not built")
    from project_desert_tortoise_tpu.models.streaming import (
        StreamingDemodulator, feed_array)

    iq, t, sent = _synth()
    batch = DemodSession(POES_TIP, 50000.0, quirks=False).run(iq, t)

    sd = StreamingDemodulator(POES_TIP, 50000.0, chunk_size=10000)
    stop = threading.Event()
    prod = threading.Thread(target=feed_array, args=(sd.ring, iq),
                            kwargs={"stop": stop})
    prod.start()
    prod.join()
    sd.stop()
    frames = sd.run(max_chunks=len(iq) // 10000 + 2)
    got = [f.hex_line() for f in frames if f.complete]
    want = [f.hex_line() for f in batch.frames if f.complete]
    assert got == want
    assert sd.overruns == 0
    assert "Sym" in sd.status_line()


def test_checkpoint_resume_equals_continuous(tmp_path):
    from project_desert_tortoise_tpu.utils.checkpoint import (
        load_session, save_session)

    iq, t, sent = _synth()
    n = len(iq)
    dt = np.float32
    ts = np.float32(1.0) / np.float32(50000.0)
    t_ext = np.concatenate([t, [np.float32(t[-1] + ts)]])

    def feed(sess, lo_chunks, hi_chunks):
        frames = []
        for c in range(lo_chunks, hi_chunks):
            lo, hi = c * 10000, min((c + 1) * 10000, n)
            if lo >= n:
                break
            frames += sess.process(iq[lo:hi], t[lo:hi], t_ext[lo + 1:hi + 1])
        return frames

    n_chunks = -(-n // 10000)
    cont = DemodSession(POES_TIP, 50000.0, quirks=False)
    frames_cont = feed(cont, 0, n_chunks)
    cont.framer.flush()

    half = n_chunks // 2
    a = DemodSession(POES_TIP, 50000.0, quirks=False)
    frames_a = feed(a, 0, half)
    ck = str(tmp_path / "session.npz")
    save_session(a, ck)

    b = load_session(ck)
    assert b.total_samples == a.total_samples
    frames_b = feed(b, half, n_chunks)
    b.framer.flush()

    got = [f.hex_line() for f in frames_a + frames_b + b.framer.frames[
        len(frames_a) + len(frames_b):]]
    want = [f.hex_line() for f in cont.framer.frames]
    assert got == want


def test_realtime_mode_squelch_chain():
    """POES realtime mode (squelch after PLL, fixed interp 3) decodes synth."""
    from project_desert_tortoise_tpu.utils.config import POES_TIP_REALTIME
    fs = 48000.0
    iq, sent = synth.make_poes_recording(n_frames=6, fs=fs,
                                         carrier_hz=-2000.0, snr_db=28.0)
    t = W.time_axis(len(iq), fs, np.float32)
    res = DemodSession(POES_TIP_REALTIME, fs, quirks=False).run(iq, t)
    sent_set = {f.tobytes() for f in sent}
    ok = sum(1 for f in res.frames
             if f.complete and np.asarray(f.data, np.uint8).tobytes() in sent_set)
    assert ok >= 3


def test_argos_realtime_inverse_sync():
    """ARGOS realtime framer accepts phase-inverted packets (ByteSync.c:112
    in the PortAudio variant enables the inverse sync word)."""
    from project_desert_tortoise_tpu.utils.config import ARGOS_REALTIME
    fs = 32000.0
    iq, payloads = synth.make_argos_recording(n_packets=3, fs=fs,
                                              snr_db=30.0, rng=np.random.default_rng(11))
    t = W.time_axis(len(iq), fs, np.float32)
    res = DemodSession(ARGOS_REALTIME, fs, quirks=False).run(iq, t)
    # per-block PLL phase is ambiguous by 180 deg; with inverse sync enabled
    # every transmitted payload must decode one way or the other
    sent = {p.tobytes() for p in payloads}
    got = {np.asarray(f.data, np.uint8).tobytes() for f in res.frames
           if f.complete}
    assert len(sent & got) >= len(payloads) - 1
