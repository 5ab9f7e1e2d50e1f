"""StreamFramer vs the reference framer binary on real bit streams.

Uses the bit-string fixture the reference author embedded in the disabled
unit harness of ``POESTIPdemod/ByteSync.c:8`` (SURVEY.md section 4.2) plus
random streams with planted syncs, in one-shot and chunked feeds.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from project_desert_tortoise_tpu.ops.framer import StreamFramer
from project_desert_tortoise_tpu.utils.config import POES_TIP

ORACLE = "/root/repo/oracle/build/tap_bytesync"
REF_BYTESYNC = "/root/reference/POESTIPdemod/ByteSync.c"


def _oracle_frames(bits_str: str, chunk: int = 0):
    r = subprocess.run([ORACLE, str(chunk)], input=bits_str,
                       capture_output=True, text=True, timeout=120)
    lines = [l.rstrip() for l in r.stdout.split("\n") if l.strip()]
    n_syncs = int(r.stderr.strip())
    return lines, n_syncs


def _my_frames(bits_str: str, chunk: int = 0):
    bits = np.frombuffer(bits_str.encode(), np.uint8) - ord("0")
    times = np.arange(len(bits), dtype=np.float32)
    fr = StreamFramer(POES_TIP.framer)
    step = chunk or len(bits)
    for lo in range(0, len(bits), step):
        fr.process(bits[lo:lo + step], times[lo:lo + step])
    fr.flush()
    return fr.frames


def _compare(bits_str, chunk=0):
    oracle_lines, n_syncs = _oracle_frames(bits_str, chunk)
    mine = _my_frames(bits_str, chunk)
    assert len(mine) == n_syncs
    # reconstruct oracle lines (time printed %.5f of the bit index)
    my_lines = []
    for f in mine:
        ts = f"{f.time:.5f}" + ("i" if f.inverted else "")
        body = "".join(f"{b:02X} " for b in f.data)
        my_lines.append((ts + " " + body).rstrip())
    assert my_lines[:len(oracle_lines)] == oracle_lines


@pytest.fixture(scope="module")
def embedded_fixture():
    if not os.path.exists(ORACLE):
        pytest.skip("oracle harness not built")
    src = open(REF_BYTESYNC).read()
    m = re.search(r'char dataStreamBits\[\] = "([01]+)"', src)
    assert m, "embedded fixture not found"
    return m.group(1)


def test_embedded_fixture_one_shot(embedded_fixture):
    _compare(embedded_fixture)


def test_embedded_fixture_chunked(embedded_fixture):
    _compare(embedded_fixture, chunk=137)


def test_random_with_planted_syncs():
    if not os.path.exists(ORACLE):
        pytest.skip("oracle harness not built")
    rng = np.random.default_rng(0)
    sync = POES_TIP.framer.sync_word
    parts = []
    for _ in range(4):
        parts.append("".join(map(str, rng.integers(0, 2, 200))))
        parts.append(sync)
        parts.append("".join(map(str, rng.integers(0, 2, 813))))
    s = "".join(parts)
    _compare(s)
    _compare(s, chunk=97)
