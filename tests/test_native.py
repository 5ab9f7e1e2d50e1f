"""Native IO runtime (C++ wavio) vs the numpy reference reader."""

import numpy as np
import pytest

from project_desert_tortoise_tpu.native import wavio as N
from project_desert_tortoise_tpu.utils import wav as W


pytestmark = pytest.mark.skipif(
    not N.available(), reason="libpdtwavio.so not built")


def test_native_wav_matches_numpy(poes_clip):
    iq, t, fs = poes_clip
    re, im, nfs, bits = N.load_iq_wav_native("/root/reference/5sec_clip.wav")
    assert nfs == fs and bits == 16
    assert np.array_equal(re, np.real(iq))
    assert np.array_equal(im, np.imag(iq))


def test_ring_roundtrip():
    ring = N.IQRing(1024)
    assert ring.capacity == 1024
    re = np.arange(300, dtype=np.float32)
    im = -re
    assert ring.push(re, im) == 300
    assert ring.available == 300
    r2, i2 = ring.pop(128)
    assert np.array_equal(r2, re[:128])
    assert np.array_equal(i2, im[:128])
    r3, i3 = ring.pop(1000)
    assert len(r3) == 172
    assert np.array_equal(r3, re[128:])
    ring.close()


def test_ring_overrun_counting():
    ring = N.IQRing(128)
    x = np.zeros(200, np.float32)
    pushed = ring.push(x, x)
    assert pushed == 128
    assert ring.overruns == 72
    ring.close()
