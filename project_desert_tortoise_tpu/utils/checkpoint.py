"""Checkpoint / resume for streaming demod sessions.

The reference's only "resume" mechanism is its C static locals (SURVEY.md
section 5): processing can stop/continue at any chunk boundary because all
loop state persists.  Here that state is the explicit `ChainState` pytree plus
the host-side framer/timebase, so a session can be serialized to one ``.npz``
and resumed later, on another host, or handed to a neighbor shard.
"""

from __future__ import annotations

import io
import json

import numpy as np
import jax

from project_desert_tortoise_tpu import chain as chain_lib
from project_desert_tortoise_tpu.models.demodulator import DemodSession


def _flatten_state(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_session(sess: DemodSession, path: str):
    leaves, _ = _flatten_state(sess.state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    fr = sess.framer
    meta = {
        "mode": sess.cfg.name,
        "fs": sess.fs,
        "chunk_size": sess.chunk_size,
        "norm_factor": sess.norm_factor,
        "total_samples": sess.total_samples,
        "total_symbols": sess.total_symbols,
        "total_bits": sess.total_bits,
        "avg_phase": sess.avg_phase,
        "lock_freq_hz": sess.lock_freq_hz,
        "was_locked": sess._was_locked,
        "framer": {
            "shifting": fr.shifting,
            "inverted": fr.inverted,
            "bit_idx": fr.bit_idx,
            "byte": fr.byte,
            "frame": fr.frame,
            "frame_time": fr.frame_time,
        },
    }
    arrays["framer_history"] = fr.history
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_session(path: str) -> DemodSession:
    from project_desert_tortoise_tpu.models.registry import get_mode

    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    cfg = get_mode(meta["mode"])
    sess = DemodSession(cfg, meta["fs"], chunk_size=meta["chunk_size"],
                        norm_factor=meta["norm_factor"], quirks=False)
    # rebuild the state pytree with the saved leaves
    template = chain_lib.init_state(sess.params, meta["norm_factor"] or 1.0,
                                    sess.chunk_size, sess.dtype)
    leaves, treedef = _flatten_state(template)
    new_leaves = [z[f"leaf_{i}"] for i in range(len(leaves))]
    sess.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    sess.total_samples = meta["total_samples"]
    sess.total_symbols = meta["total_symbols"]
    sess.total_bits = meta["total_bits"]
    sess.avg_phase = meta["avg_phase"]
    sess.lock_freq_hz = meta["lock_freq_hz"]
    sess._was_locked = meta["was_locked"]
    frm = meta["framer"]
    sess.framer.history = z["framer_history"].astype(np.uint8)
    sess.framer.shifting = frm["shifting"]
    sess.framer.inverted = frm["inverted"]
    sess.framer.bit_idx = frm["bit_idx"]
    sess.framer.byte = frm["byte"]
    sess.framer.frame = list(frm["frame"])
    sess.framer.frame_time = frm["frame_time"]
    return sess
