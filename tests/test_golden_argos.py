"""ARGOS mode parity: synthetic golden recording through the locally built C
oracle vs our exact (float64) chain and the fast block path.

The reference's shipped ``packet.wav`` decodes 0 packets even in the reference
itself (it is a sub-second excerpt; the 50 s recording behind ``packets.txt``
is absent from the mount, ``.MISSING_LARGE_BLOBS``), so the golden pair here
is synthesized and validated through the reference binary.
"""

import glob
import os
import subprocess

import numpy as np
import pytest
import jax

from project_desert_tortoise_tpu.utils import synth, wav as W
from project_desert_tortoise_tpu.utils.config import ARGOS

ORACLE = "/root/repo/oracle/build/demodARGOS"


@pytest.fixture(scope="module")
def argos_golden(tmp_path_factory):
    if not os.path.exists(ORACLE):
        pytest.skip("C oracle not built")
    d = tmp_path_factory.mktemp("argos")
    iq, payloads = synth.make_argos_recording(
        n_packets=4, fs=32000.0, carrier_hz=200.0, snr_db=30.0)
    wav = str(d / "synth_argos.wav")
    W.write_iq_wav(wav, iq / (np.abs(iq).max() * 1.2), 32000)
    subprocess.run([ORACLE, "synth_argos.wav"], cwd=d, capture_output=True,
                   timeout=300)
    outs = glob.glob(str(d / "packets_*.txt"))
    assert outs, "oracle produced no packets file"
    lines = [l.rstrip() for l in open(outs[0]) if l.strip()]
    return wav, payloads, lines


def test_oracle_decodes_synth(argos_golden):
    wav, payloads, oracle_lines = argos_golden
    sent = {" ".join(f"{b:02X}" for b in p) for p in payloads}
    got = {l.split(" ", 1)[1].strip() for l in oracle_lines}
    assert got <= sent           # every oracle packet is a sent payload
    assert len(got) >= len(payloads) - 1   # acquisition may eat the first


def test_exact_chain_matches_oracle(argos_golden):
    wav, payloads, oracle_lines = argos_golden
    jax.config.update("jax_enable_x64", True)
    try:
        from project_desert_tortoise_tpu.models.demodulator import demodulate_wav
        res = demodulate_wav(wav, ARGOS)
        mine = [f.hex_line() for f in res.frames if f.complete]
        same = sum(1 for a, b in zip(mine, oracle_lines) if a == b)
        assert same == len(oracle_lines), (mine, oracle_lines)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fast_path_recovers_payloads(argos_golden):
    wav, payloads, oracle_lines = argos_golden
    from project_desert_tortoise_tpu.parallel.blocked import demodulate_blocked
    iq, t, fs, _ = W.load_iq_wav(wav, np.float32)
    frames = demodulate_blocked(iq, t, fs, ARGOS)
    got = {" ".join(f"{b:02X}" for b in f.data) for f in frames}
    oracle_payloads = {l.split(" ", 1)[1].strip() for l in oracle_lines}
    assert oracle_payloads <= got
