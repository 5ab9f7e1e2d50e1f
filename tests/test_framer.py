import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu.ops.framer import StreamFramer, frame_extract
from project_desert_tortoise_tpu.utils.config import ARGOS, POES_TIP


def _plant(rng, cfg, n_frames, gap, inverted_every=None):
    """Random bit stream with planted sync words + payloads."""
    sync = cfg.sync_bits()
    payload = cfg.payload_bits
    bits = rng.integers(0, 2, 64).astype(np.uint8).tolist()
    planted = []
    for k in range(n_frames):
        inv = inverted_every is not None and (k % inverted_every == 1)
        sw = (1 - sync) if inv else sync
        pay = rng.integers(0, 2, payload).astype(np.uint8)
        planted.append((len(bits) + len(sync) - 1, inv, pay))
        bits.extend(sw.tolist())
        bits.extend(((1 - pay) if inv else pay).tolist())
        bits.extend(np.zeros(gap, np.uint8).tolist())  # quiet gap
    return np.array(bits, np.uint8), planted


def _expect_bytes(cfg, pay):
    first_bits = 8 - cfg.first_bit_index
    out = list(cfg.prefix_bytes)
    out.append(int("".join(map(str, pay[:first_bits])), 2))
    rest = pay[first_bits:]
    for i in range(0, len(rest), 8):
        out.append(int("".join(map(str, rest[i:i + 8])), 2))
    return out


def test_stream_framer_poes_planted():
    rng = np.random.default_rng(0)
    bits, planted = _plant(rng, POES_TIP.framer, 3, gap=40, inverted_every=2)
    times = np.arange(len(bits), dtype=np.float32)
    fr = StreamFramer(POES_TIP.framer)
    frames = fr.process(bits, times)
    assert len(frames) == 3
    for f, (pos, inv, pay) in zip(frames, planted):
        assert f.time == times[pos]
        assert f.inverted == inv
        assert list(f.data) == _expect_bytes(POES_TIP.framer, pay)


def test_stream_framer_argos():
    rng = np.random.default_rng(1)
    bits, planted = _plant(rng, ARGOS.framer, 4, gap=25)
    times = np.arange(len(bits), dtype=np.float32)
    fr = StreamFramer(ARGOS.framer)
    frames = fr.process(bits, times)
    assert len(frames) == 4
    for f, (pos, inv, pay) in zip(frames, planted):
        assert list(f.data) == _expect_bytes(ARGOS.framer, pay)
        assert len(f.data) == 7  # 7 data bytes, no prefix (ByteSync.c:100)


def test_stream_framer_chunked_equals_whole():
    rng = np.random.default_rng(2)
    bits, _ = _plant(rng, POES_TIP.framer, 5, gap=17, inverted_every=3)
    times = np.arange(len(bits), dtype=np.float32)
    whole = StreamFramer(POES_TIP.framer)
    whole.process(bits, times)
    chunked = StreamFramer(POES_TIP.framer)
    for lo in range(0, len(bits), 97):
        chunked.process(bits[lo:lo + 97], times[lo:lo + 97])
    assert len(whole.frames) == len(chunked.frames)
    for a, b in zip(whole.frames, chunked.frames):
        assert a.time == b.time and np.array_equal(a.data, b.data)


def test_partial_frame_flush():
    cfg = POES_TIP.framer
    sync = cfg.sync_bits()
    bits = np.concatenate([np.zeros(10, np.uint8), sync,
                           np.ones(20, np.uint8)])
    fr = StreamFramer(cfg)
    fr.process(bits, np.arange(len(bits), dtype=np.float32))
    f = fr.flush()
    assert f is not None and not f.complete
    assert list(f.data[:2]) == [0xED, 0xE2]


def test_parallel_framer_matches_stream():
    rng = np.random.default_rng(3)
    bits, _ = _plant(rng, POES_TIP.framer, 4, gap=33, inverted_every=2)
    times = np.arange(len(bits), dtype=np.float32)
    want = StreamFramer(POES_TIP.framer)
    want.process(bits, times)
    want.flush()
    complete = [f for f in want.frames if f.complete]

    fb = frame_extract(jnp.asarray(bits), jnp.asarray(times), len(bits),
                       POES_TIP.framer, max_frames=8)
    n = int(fb.count)
    assert n == len(complete)
    for k in range(n):
        assert float(fb.times[k]) == complete[k].time
        assert bool(fb.inverted[k]) == complete[k].inverted
        assert np.array_equal(np.asarray(fb.data[k]), complete[k].data)


def test_parallel_framer_suppression_rearm():
    """A sync ending exactly at the previous frame's last bit is accepted."""
    cfg = ARGOS.framer
    sync = cfg.sync_bits()
    pay = np.zeros(cfg.payload_bits, np.uint8)
    # frame 1 payload immediately followed by another sync
    bits = np.concatenate([sync, pay, sync, pay, np.zeros(8, np.uint8)])
    times = np.arange(len(bits), dtype=np.float32)
    sf = StreamFramer(cfg)
    sf.process(bits, times)
    fb = frame_extract(jnp.asarray(bits), jnp.asarray(times), len(bits),
                       cfg, max_frames=4)
    assert int(fb.count) == len([f for f in sf.frames if f.complete])
