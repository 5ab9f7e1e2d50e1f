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
