"""ARGOS *realtime* variant parity (reference ``demodARGOSP``).

The fourth reference app differs from the ARGOS file demod in exactly two
ways: float32 arithmetic (``ARGOSdemodPortAudio/config.h:4``) and inverse-sync
detection enabled in its framer copy (``ARGOSdemodPortAudio/ByteSync.c:112``,
with complemented decoding via the zero/one swap at ``:138-139`` and NO "i"
timestamp suffix). ``oracle/tap_argosp.c`` drives those exact reference
objects from a wav file; this test proves our ``ARGOS_REALTIME`` mode is
line-identical — including an inverted-carrier recording that only decodes
through the inverse-sync path.
"""

import os
import subprocess

import numpy as np
import pytest

from project_desert_tortoise_tpu.utils import synth, wav as W
from project_desert_tortoise_tpu.utils.config import ARGOS_REALTIME

ORACLE = "/root/repo/oracle/build/tap_argosp"


def _oracle_lines(wav_path, tmpdir):
    out = os.path.join(tmpdir, "oracle_packets.txt")
    subprocess.run([ORACLE, wav_path, out], check=True, capture_output=True,
                   timeout=300)
    return [l.rstrip() for l in open(out) if l.strip()]


@pytest.fixture(scope="module", params=["normal", "inverted"])
def golden(request, tmp_path_factory):
    if not os.path.exists(ORACLE):
        pytest.skip("tap_argosp oracle not built")
    d = tmp_path_factory.mktemp(f"argosp_{request.param}")
    iq, payloads = synth.make_argos_recording(
        n_packets=4, fs=32000.0, carrier_hz=200.0, snr_db=30.0,
        invert_bits=request.param == "inverted")
    iq = iq / (np.abs(iq).max() * 1.2)
    wav = str(d / "synth.wav")
    W.write_iq_wav(wav, iq, 32000)
    lines = _oracle_lines(wav, str(d))
    assert lines, "oracle decoded nothing"
    return request.param, wav, payloads, lines


def test_exact_chain_matches_oracle(golden):
    variant, wav, payloads, oracle_lines = golden
    from project_desert_tortoise_tpu.models.demodulator import demodulate_wav
    res = demodulate_wav(wav, ARGOS_REALTIME)
    mine = [f.hex_line(inverted_mark=False) for f in res.frames if f.complete]
    assert mine == oracle_lines
    if variant == "inverted":
        assert all(f.inverted for f in res.frames if f.complete)
        # inverse-sync decoding recovers the true payloads
        sent = {" ".join(f"{b:02X}" for b in p) for p in payloads}
        got = {l.split(" ", 1)[1].strip() for l in oracle_lines}
        assert got <= sent and got


def test_detect_inverted_gates_inverted_carrier(golden):
    """With inverse-sync disabled (the file-variant framer), an inverted
    carrier decodes nothing while a normal one still decodes — proving the
    inverted recordings really exercise ``ARGOSdemodPortAudio/ByteSync.c:112``.
    """
    variant, wav, payloads, oracle_lines = golden
    import dataclasses
    from project_desert_tortoise_tpu.models.demodulator import demodulate_wav
    file_style = dataclasses.replace(
        ARGOS_REALTIME,
        framer=dataclasses.replace(ARGOS_REALTIME.framer,
                                   detect_inverted=False))
    res = demodulate_wav(wav, file_style)
    complete = [f for f in res.frames if f.complete]
    if variant == "inverted":
        assert not complete
    else:
        assert complete
