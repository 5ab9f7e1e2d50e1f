import numpy as np

from project_desert_tortoise_tpu.utils import wav as W
from tests.conftest import load_tap


def test_header_fields(poes_clip):
    _, _, fs = poes_clip
    assert fs == 50000.0


def test_iq_bit_exact_vs_c(poes_clip, taps_dir):
    iq, t, _ = poes_clip
    iq_c = np.fromfile(f"{taps_dir}/iq.c64", np.complex64)
    t_c = load_tap("time.f32")
    assert np.array_equal(iq, iq_c)
    assert np.array_equal(t, t_c)


def test_time_axis_fold_semantics():
    # t[0] = Ts (the reference accumulates before the first store)
    t = W.time_axis(5, 50000.0, np.float32)
    ts = np.float32(1.0) / np.float32(50000.0)
    assert t[0] == ts
    acc = ts
    for i in range(1, 5):
        acc = np.float32(acc + ts)
        assert t[i] == acc


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    iq = (rng.uniform(-0.9, 0.9, 1000) + 1j * rng.uniform(-0.9, 0.9, 1000))
    p = str(tmp_path / "x.wav")
    W.write_iq_wav(p, iq, 48000)
    iq2, t, fs, hdr = W.load_iq_wav(p)
    assert fs == 48000.0
    assert hdr.bits_per_sample == 16
    # quantization (0.5 lsb) + 32767-write/32768-read scale skew (1 lsb)
    assert np.abs(iq2 - iq).max() < 2.0 / 32768


def test_raw_reader(tmp_path):
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((100, 2)).astype("<f4")
    p = str(tmp_path / "x.raw")
    vals.tofile(p)
    iq, t, fs = W.load_iq_raw(p, 48000.0)
    assert np.array_equal(np.real(iq), vals[:, 0])
    assert np.array_equal(np.imag(iq), vals[:, 1])


def test_non_canonical_wav_with_list_chunk(tmp_path):
    """Real SDR recorders insert LIST/fact chunks; the reference breaks on
    these (fixed 44-byte layout) — we walk RIFF chunks to the data."""
    import struct
    rng = np.random.default_rng(5)
    pcm = (rng.integers(-3000, 3000, (50, 2))).astype("<i2")
    body = pcm.tobytes()
    lst = b"LIST" + struct.pack("<I", 10) + b"INFOhello\x00"
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + 24 + len(lst) + 8 + len(body),
                      b"WAVE")
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 48000, 192000, 4, 16)
    data = struct.pack("<4sI", b"data", len(body)) + body
    p = str(tmp_path / "x.wav")
    open(p, "wb").write(hdr + fmt + lst + data)
    iq, t, fs, h = W.load_iq_wav(p)
    assert fs == 48000.0
    assert len(iq) == 50
    assert np.allclose(np.real(iq), pcm[:, 0] / 32768.0, atol=1e-6)
