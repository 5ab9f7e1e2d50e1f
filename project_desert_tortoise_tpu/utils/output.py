"""Frame/packet output writers matching the reference text formats.

POES: ``minorFrames_YYYYMMDD_HHMMSS.txt`` — per frame one line:
``<time%.5f>[i] <104 hex bytes> `` (``POESTIPdemod/ByteSync.c:96-144``).
ARGOS: ``packets_YYYYMMDD_HHMMSS.txt`` — ``<time%.5f>[i] <7 hex bytes> ``.
Empty outputs are removed on close, like ``POESTIPdemod/main.c:508-512``.
"""

from __future__ import annotations

import os
import time as time_mod
from typing import Iterable, Optional

from project_desert_tortoise_tpu.ops.framer import Frame


def default_output_name(prefix: str, when: Optional[time_mod.struct_time] = None
                        ) -> str:
    tm = when or time_mod.localtime()
    return (f"{prefix}_{tm.tm_year:4d}{tm.tm_mon:02d}{tm.tm_mday:02d}_"
            f"{tm.tm_hour:02d}{tm.tm_min:02d}{tm.tm_sec:02d}.txt")


class FrameWriter:
    """Streaming writer; reference-compatible line format."""

    def __init__(self, path: str, remove_if_empty: bool = True,
                 with_quality: bool = False, inverted_mark: bool = True):
        self.path = path
        self.remove_if_empty = remove_if_empty
        self.with_quality = with_quality
        self.inverted_mark = inverted_mark
        self.count = 0
        self._f = open(path, "w")

    def write(self, frame: Frame):
        ts = f"{frame.time:.5f}"
        if frame.inverted and self.inverted_mark:
            ts += "i"
        self._f.write(ts + " ")
        self._f.write("".join(f"{b:02X} " for b in frame.data))
        if (self.with_quality and frame.complete
                and frame.quality_db is not None):
            self._f.write(f"| q={frame.quality_db:.1f}dB "
                          f"snr={frame.snr_db:.1f}dB ")
        if frame.complete:
            self._f.write("\n")
        self.count += 1

    def write_all(self, frames: Iterable[Frame]):
        for f in frames:
            self.write(f)

    def close(self):
        self._f.close()
        if self.remove_if_empty and self.count == 0:
            os.remove(self.path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def parse_frames_file(path: str):
    """Parse a frames/packets txt file back into (time, inverted, bytes)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            ts = parts[0]
            inv = ts.endswith("i")
            out.append((float(ts[:-1] if inv else ts), inv,
                        [int(x, 16) for x in parts[1:]]))
    return out
