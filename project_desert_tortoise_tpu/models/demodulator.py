"""Exact chunked demodulator sessions — the reference app drivers, functional.

`DemodSession` is the behavioral twin of one reference application's
``while(!feof)`` loop (``POESTIPdemod/main.c:373``, ``ARGOSdemod/main.c:250``):
feed it chunks of IQ samples (any source: wav file, raw file, live stream) and
it advances the jitted chain, runs the exact host-side framer on the emitted
bits, and tracks the reference's console telemetry (quality, lock events,
sym/bit/frame counters).

The session state (`ChainState` + framer + timebase) is a small serializable
object: checkpoint it, move it across hosts, resume mid-stream.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu import chain as chain_lib
from project_desert_tortoise_tpu.ops import agc as agc_ops
from project_desert_tortoise_tpu.ops.framer import Frame, StreamFramer
from project_desert_tortoise_tpu.utils import wav as wav_lib


@dataclasses.dataclass
class DemodResult:
    frames: List[Frame]
    total_samples: int
    total_symbols: int
    total_bits: int
    quality_db: float
    lock_freq_hz: Optional[float]
    avg_phase: float

    @property
    def total_frames(self) -> int:
        return len(self.frames)


def quality_db_from_avg_phase(avg_phase: float) -> float:
    """10*log10((pi/2 - avgPhase)^2) — POESTIPdemod/main.c:468."""
    d = abs(np.pi / 2.0 - avg_phase)
    return float(10.0 * np.log10(d * d)) if d > 0 else -np.inf


class DemodSession:
    """One demod stream.  Optional failure recovery: `reacquire_after_s`
    arms a watchdog that, when the quality figure stays below
    `reacquire_quality_db` for that long while nominally locked, resets the
    PLL to acquisition (sweep restart) — the reference's "unlock/reset PLL on
    prolonged low quality" idea (changelog.txt:23) made real."""

    def __init__(self, mode_cfg, fs: float, chunk_size: Optional[int] = None,
                 norm_factor: Optional[float] = None, quirks: bool = True,
                 reacquire_after_s: Optional[float] = None,
                 reacquire_quality_db: float = -20.0,
                 annotate_quality: bool = False,
                 timebase: str = "accumulated"):
        self.cfg = mode_cfg
        self.fs = float(fs)
        self.chunk_size = int(chunk_size or mode_cfg.chunk_size)
        self.dtype = mode_cfg.np_dtype()
        self.params = chain_lib.make_params(mode_cfg, self.fs, quirks=quirks)
        self.norm_factor = norm_factor
        # timebase="integer" (quirks=False only): an int64 global sample
        # counter replaces the reference's accumulated stream-dtype fold
        # (wave.c:167), whose f32 ulp exceeds Ts/2 past t ~ 4096 s at
        # 50 ksps and quantizes multi-hour timestamps.  The chain sees a
        # small per-chunk f32 OFFSET axis (exact to ~3e-8 s); the f64
        # base n*Ts is added at emission, so timestamps stay exact at any
        # stream age (VERDICT r4 item 8; test_long_soak integer rows).
        if timebase not in ("accumulated", "integer"):
            raise ValueError(f"unknown timebase {timebase!r}")
        if timebase == "integer" and quirks:
            raise ValueError("timebase='integer' requires quirks=False "
                             "(the accumulated fold IS a reference quirk)")
        self.timebase = timebase
        self._n0 = 0                  # int64 global sample counter
        self._ts64 = 1.0 / np.float64(fs)
        self.state = None           # created on first chunk (needs norm)
        self.framer = StreamFramer(mode_cfg.framer)
        self.total_samples = 0
        self.total_symbols = 0
        self.total_bits = 0
        self.avg_phase = float(np.pi / 2.0)
        self.lock_freq_hz: Optional[float] = None
        self._was_locked = False
        self.reacquire_after_s = reacquire_after_s
        self.reacquire_quality_db = reacquire_quality_db
        self.reacquisitions = 0
        self._low_quality_samples = 0
        self.raw_tap = None          # optional file object for -r dumps
        self.annotate_quality = annotate_quality
        self.snr_db = float("nan")
        self._snr_window = np.zeros(0)

    def _ensure_state(self, first_chunk_iq):
        if self.state is not None:
            return
        if self.norm_factor is None:
            # StaticGain over the first chunk (POESTIPdemod/main.c:386)
            self.norm_factor = agc_ops.static_gain(
                first_chunk_iq, self.cfg.static_gain_level, self.dtype)
        self.state = chain_lib.init_state(
            self.params, self.norm_factor, self.chunk_size, self.dtype)

    def process(self, iq: np.ndarray, t: np.ndarray,
                t_next: np.ndarray) -> List[Frame]:
        """Feed one chunk (<= chunk_size samples). Returns frames completed.

        With timebase="integer" the passed t/t_next are ignored — the
        session synthesizes its own exact offset axis."""
        self._ensure_state(iq)
        re = np.ascontiguousarray(np.real(iq), self.dtype)
        im = np.ascontiguousarray(np.imag(iq), self.dtype)
        n = len(re)
        base_s = 0.0
        if self.timebase == "integer":
            # offset axis: time of local sample i is (i+1)*Ts relative to
            # the chunk base n0*Ts (the reference convention t[0] = Ts)
            off = (np.arange(1, n + 2, dtype=np.float64)
                   * self._ts64).astype(self.dtype)
            t, t_next = off[:n], off[1:]
            base_s = float(self._n0 * self._ts64)
        self.state, out = chain_lib.chunk_step(
            self.params, self.state, jnp.asarray(re), jnp.asarray(im),
            jnp.asarray(t), jnp.asarray(t_next))
        if self.timebase == "integer":
            # rebase the carried time image for the next chunk's origin;
            # the shift is within 2x of the carried offsets, so the f32
            # subtraction is exact (Sterbenz) and margin-emitted bit
            # times stay consistent to <= one f32 ulp of the chunk span
            shift = self.dtype.type(np.float64(n) * self._ts64)
            self.state = self.state._replace(t_img=self.state.t_img - shift)
            self._n0 += n

        bits = np.asarray(out.bits)
        mask = np.asarray(out.bit_mask)
        btimes = np.asarray(out.bit_times)
        bits_c = bits[mask]
        times_c = btimes[mask]
        if base_s:
            times_c = base_s + times_c.astype(np.float64)
        self.total_samples += len(re)
        self.total_symbols += int(out.sym_count)
        self.total_bits += len(bits_c)
        self.avg_phase = float(out.avg_phase)
        if self.raw_tap is not None:
            # post-AGC soft stream, like the reference's -r debug dump
            # (ARGOSdemod/main.c:273)
            np.asarray(out.agc_stream).astype(self.dtype).tofile(self.raw_tap)
        locked = bool(np.asarray(self.state.pll.locked))
        if locked and not self._was_locked:
            self._was_locked = True
            self.lock_freq_hz = float(
                np.asarray(self.state.pll.freq) * self.fs / (2 * np.pi))
        self._maybe_reacquire(locked, len(re))
        new_frames = self.framer.process(bits_c, times_c)
        if self.annotate_quality:
            # per-packet quality/SNR annotation ("Append Quality/SNR for
            # triangulation", reference README.md:42 TODO)
            from project_desert_tortoise_tpu.utils import metrics as _metrics
            # estimate at the Gardner decision points (soft symbols) over a
            # rolling window, skipping squelched symbols
            syms = np.asarray(out.syms, np.float64)[np.asarray(out.sym_valid)]
            syms = syms[syms != 0.0]
            self._snr_window = np.concatenate([self._snr_window, syms])[-512:]
            if len(self._snr_window) >= 128:
                self.snr_db = _metrics.m2m4_snr_db(self._snr_window)
            q = quality_db_from_avg_phase(self.avg_phase)
            carrier = float(np.asarray(self.state.pll.freq)
                            * self.fs / (2 * np.pi))
            for f in new_frames:
                f.quality_db = q
                f.snr_db = self.snr_db
                f.carrier_hz = carrier   # Doppler measurement for geolocation
        return new_frames

    def _maybe_reacquire(self, locked: bool, n_samples: int):
        """Failure recovery: restart acquisition after prolonged low quality."""
        if self.reacquire_after_s is None or not locked:
            self._low_quality_samples = 0
            return
        if quality_db_from_avg_phase(self.avg_phase) < self.reacquire_quality_db:
            self._low_quality_samples += n_samples
        else:
            self._low_quality_samples = 0
        if self._low_quality_samples >= self.reacquire_after_s * self.fs:
            from project_desert_tortoise_tpu.ops import pll as pll_ops
            fresh = pll_ops.init_state(self.params.pll, self.dtype)
            self.state = self.state._replace(pll=fresh)
            self._was_locked = False
            self._low_quality_samples = 0
            self.reacquisitions += 1

    def run(self, iq: np.ndarray, t: np.ndarray) -> DemodResult:
        """Process a whole recording (replicates the reference chunk loop)."""
        n = len(iq)
        ts = self.dtype.type(1.0) / self.dtype.type(self.fs)
        t_ext = np.concatenate([t, [t[-1] + ts] if n else [ts]]).astype(self.dtype)
        for start in range(0, n, self.chunk_size):
            end = min(start + self.chunk_size, n)
            self.process(iq[start:end], t[start:end], t_ext[start + 1:end + 1])
        self.framer.flush()
        return self.result()

    def result(self) -> DemodResult:
        return DemodResult(
            frames=list(self.framer.frames),
            total_samples=self.total_samples,
            total_symbols=self.total_symbols,
            total_bits=self.total_bits,
            quality_db=quality_db_from_avg_phase(self.avg_phase),
            lock_freq_hz=self.lock_freq_hz,
            avg_phase=self.avg_phase,
        )


def demodulate_wav(path: str, mode_cfg, chunk_size: Optional[int] = None,
                   norm_factor: Optional[float] = None,
                   sample_rate_override: float = 0.0,
                   quirks: bool = True) -> DemodResult:
    iq, t, fs, _ = wav_lib.load_iq_wav(path, mode_cfg.np_dtype(),
                                       sample_rate_override)
    sess = DemodSession(mode_cfg, fs, chunk_size, norm_factor, quirks)
    return sess.run(iq, t)


def demodulate_raw(path: str, mode_cfg, sample_rate_hz: float,
                   chunk_size: Optional[int] = None,
                   norm_factor: Optional[float] = None,
                   quirks: bool = True) -> DemodResult:
    iq, t, fs = wav_lib.load_iq_raw(path, sample_rate_hz, mode_cfg.np_dtype())
    sess = DemodSession(mode_cfg, fs, chunk_size, norm_factor, quirks)
    return sess.run(iq, t)
