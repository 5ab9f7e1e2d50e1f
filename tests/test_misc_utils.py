"""Profiling helpers, multihost mesh math, misc utils."""

import numpy as np
import jax
import pytest


def test_stage_timer():
    import jax.numpy as jnp
    from project_desert_tortoise_tpu.utils.profiling import StageTimer
    st = StageTimer()
    x = jnp.ones(128)
    with st.stage("mul", n_samples=128, fetch=lambda: y):
        y = x * 2
    rep = st.report()
    assert "mul" in rep and "Msps" in rep


def test_global_mesh_and_slices():
    from project_desert_tortoise_tpu.parallel import multihost as MH
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs virtual devices")
    mesh = MH.global_mesh(n_channel=2, devices=devs)
    assert dict(mesh.shape) == {"ch": 2, "blk": 4}
    lo, hi = MH.local_time_slice(1000, mesh)
    assert lo == 0 and hi == 1000  # single-process: all columns local


def test_seconds_to_time_and_describe(poes_clip):
    from project_desert_tortoise_tpu.utils import wav as W
    assert W.seconds_to_time(3725.5) == "1:2:5.500"
    _, _, _, = poes_clip
    iq, t, fs, hdr = W.load_iq_wav("/root/reference/5sec_clip.wav")
    d = hdr.describe()
    assert "Sample rate: 50000" in d
    assert "Number of samples:250195" in d


def test_png_writer(tmp_path):
    from project_desert_tortoise_tpu.utils.png import autoscale_u8, write_gray_png
    img = (np.arange(64 * 32) % 251).reshape(64, 32).astype(np.uint16)
    u8 = autoscale_u8(img)
    p = str(tmp_path / "x.png")
    write_gray_png(p, u8)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IEND" in raw


def test_static_gain_fast_matches_recurrence():
    import jax.numpy as jnp
    from project_desert_tortoise_tpu.ops.agc import static_gain, static_gain_fast
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
          ).astype(np.complex64) * 0.02
    slow = static_gain(iq, 1.0, np.float32)
    fast = float(static_gain_fast(jnp.asarray(iq), 1.0))
    assert abs(fast - slow) < 1e-3 * abs(slow)


def test_follow_raw_file(tmp_path):
    import threading
    import time
    from project_desert_tortoise_tpu.native import wavio as N
    if not N.available():
        pytest.skip("native ring not built")
    from project_desert_tortoise_tpu.models.streaming import follow_raw_file
    p = str(tmp_path / "grow.raw")
    data = np.arange(2 * 500, dtype="<f4")
    open(p, "wb").write(data[:400].tobytes())
    ring = N.IQRing(4096)
    stop = threading.Event()
    th = threading.Thread(target=follow_raw_file, args=(ring, p, stop),
                          kwargs={"poll_s": 0.01})
    th.start()
    time.sleep(0.15)
    with open(p, "ab") as f:        # file grows
        f.write(data[400:].tobytes())
    time.sleep(0.3)
    stop.set()
    th.join(timeout=2)
    assert ring.available == 500
    re, im = ring.pop(500)
    assert np.array_equal(re, data[0::2])
    assert np.array_equal(im, data[1::2])


def test_poes_raw_api(tmp_path):
    from project_desert_tortoise_tpu.models import poes
    from project_desert_tortoise_tpu.utils import synth
    iq, sent = synth.make_poes_recording(n_frames=5, fs=50000.0, snr_db=28.0)
    raw = np.empty(2 * len(iq), "<f4")
    raw[0::2], raw[1::2] = np.real(iq), np.imag(iq)
    p = str(tmp_path / "x.raw")
    raw.tofile(p)
    res = poes.demodulate(p, sample_rate_hz=50000.0, quirks=False)
    assert res.total_frames >= 3
