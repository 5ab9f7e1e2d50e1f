"""TIP instrument dissectors over the real golden minor frames + crafted
streams (POES.m behavioral checks)."""

import numpy as np
import pytest

from project_desert_tortoise_tpu.telemetry import tip
from project_desert_tortoise_tpu.utils.output import parse_frames_file


@pytest.fixture(scope="module")
def golden_mf(taps_dir):
    rows = parse_frames_file(f"{taps_dir}/frames.txt")
    frames = np.array([r[2] for r in rows if len(r[2]) == 104], np.uint8)
    times = np.array([r[0] for r in rows if len(r[2]) == 104])
    return frames, times


def test_hirs_elements_sequential(golden_mf):
    """HIRS element counter advances by one per frame while in earth view —
    strong evidence the 13-bit word extraction is aligned."""
    frames, times = golden_mf
    h = tip.hirs_extract(frames, times)
    d = np.diff(h.element)
    wraps = d < 0
    assert np.all((d == 1) | wraps)
    img = tip.hirs_images(h)
    assert img.shape[0] == 20 and img.shape[2] == 64
    assert img.sum() > 0


def test_hirs_word_signs():
    # craft one frame: word 2 with sign bit set -> positive magnitude
    f = np.zeros((1, 104), np.uint8)
    bits = np.zeros(288, np.uint8)
    # word index 2 occupies bits 26..38; set sign (first) bit + value 5
    bits[26] = 1
    bits[36], bits[38] = 1, 1  # 0b101 = 5
    f[0, tip.HIRS_BYTES] = np.packbits(bits)
    h = tip.hirs_extract(f)
    assert h.words[0, 2] == 5
    bits[26] = 0
    f[0, tip.HIRS_BYTES] = np.packbits(bits)
    h = tip.hirs_extract(f)
    assert h.words[0, 2] == -5


def test_dcs_extracts_golden_packets(golden_mf):
    frames, times = golden_mf
    pk = tip.dcs_extract(frames, times)
    assert len(pk) >= 10
    # all packets headed by 0xD6, plausible platform counters, mostly clean
    assert all(p.data[0] == 0xD6 for p in pk)
    ok = sum(p.parity_ok for p in pk)
    assert ok >= len(pk) * 2 // 3
    groups = tip.dcs_by_txid(pk)
    assert len(groups) >= 2


def test_dcs_crafted_packet():
    # one 16-byte packet planted in the DCS byte lanes of two frames
    frames = np.zeros((2, 104), np.uint8)
    payload = [0xD6, 0x01, 0x0A, 0x46, 0x6B, 0x1C, 0xA3, 0x01, 0x00, 0x01,
               0x02, 0x03, 0x04, 0x05, 0x06, 0x83]
    lanes = tip.DCS_BYTES
    for i, b in enumerate(payload):
        frames[0, lanes[i + 2]] = b
    pk = tip.dcs_extract(frames, spacecraft=8)
    assert len(pk) == 1
    p = pk[0]
    assert p.txid == "A3010001"
    assert len(p.data) == 16
    counter = ((0x46 & 0x1F) << 16) | (0x6B << 8) | 0x1C
    assert abs(p.counter_s - 0.9549 * counter / 100.0) < 1e-9
    last3 = (0x05 << 16) | (0x06 << 8) | 0x83
    assert p.parity_ok == (bin(last3).count("1") % 2 == 0)
    assert p.doppler == ((last3 >> 1) - 2 ** 22) / 32.0


def test_sem_channels(golden_mf):
    frames, times = golden_mf
    meped, ted = tip.sem_extract(frames)
    # ~47 frames at 10/s cover over two 20-frame subcom cycles
    for ch in ["0P1", "0E1", "9P1", "9E3"]:
        assert ch in meped and len(meped[ch]) >= 2
    for ch in ["0EFL", "0PFH", "3DEM"]:
        assert ch in ted and len(ted[ch]) >= 2


def test_sem_inversion():
    frames = np.zeros((1, 104), np.uint8)
    frames[0, 20] = 255 - 42
    frames[0, 21] = 255 - 7
    frames[0, 5] = 1  # id 1 -> 0P2 from byte0, 0P3 from byte1
    meped, _ = tip.sem_extract(frames)
    assert meped["0P2"][0] == 42 and meped["0P3"][0] == 7


def test_despike():
    x = np.array([10, 10, 200, 10, 10])
    y = tip.despike(x, 20)
    assert y[2] == 0 and y[0] == 10


def test_sbuv_lines(golden_mf):
    frames, times = golden_mf
    sb = tip.sbuv_extract(frames, times)
    assert set(sb) == set(tip.SBUV_LINE_NAMES)
    total = sum(len(v["word1"]) for v in sb.values())
    assert total == len(frames)


def test_analog_subcom_shapes(golden_mf):
    frames, times = golden_mf
    an = tip.analog_subcom(frames, times)
    assert set(an) == {"STX1", "STX2", "STX3", "SARR_A", "SARR_B"}


def test_telemetry_explorer_cli(tmp_path, taps_dir):
    import subprocess
    import sys
    import os
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.path.dirname(os.path.dirname(
               os.path.abspath(__file__)))}
    out = tmp_path / "products"
    r = subprocess.run(
        [sys.executable, "-m",
         "project_desert_tortoise_tpu.apps.telemetry_explorer",
         f"{taps_dir}/frames.txt", "--outdir", str(out)],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-400:]
    assert (out / "summary.txt").exists()
    assert "47 out of 47 Error Free Frames" in (out / "summary.txt").read_text()
    assert (out / "DCS_RAW.txt").exists()
    assert (out / "HIRS1.png").read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    assert (out / "SEM_MEPED.txt").exists()
    # figure products (the POES.m plot windows, VERDICT r3 item 7): analog
    # transmitter powers, SEM channel groups, SBUV lines — all valid PNGs
    for fig in ["analog_telemetry.png", "SEM_MEPED_P0.png",
                "SEM_MEPED_E.png", "SEM_TED_FLUX0.png", "SBUV_grating.png"]:
        assert (out / fig).read_bytes()[:8] == b"\x89PNG\r\n\x1a\n", fig
    assert (out / "analog.txt").exists()
