"""Worker for tests/test_multihost.py — one process of a 2-process local
CPU cluster. Usage: _multihost_worker.py <coordinator> <nprocs> <pid>."""

import sys

import numpy as np


def main():
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from project_desert_tortoise_tpu.parallel import multihost as MH

    MH.init(coordinator_address=coord, num_processes=nprocs, process_id=pid)

    import jax
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    # --- global_mesh + local_time_slice (contiguous layout) ---
    mesh = MH.global_mesh(n_channel=1)
    assert dict(mesh.shape) == {"ch": 1, "blk": 4 * nprocs}
    n_samples = 800_000
    lo, hi = MH.local_time_slice(n_samples, mesh)
    per = -(-n_samples // (4 * nprocs))
    assert lo == pid * 4 * per and hi == min((pid + 1) * 4 * per, n_samples), \
        (lo, hi)
    print("LOCAL_SLICE_OK", lo, hi, flush=True)

    # --- non-contiguous column layout must be rejected loudly ---
    devs = np.asarray(jax.devices())
    interleaved = devs[[i // 2 + (i % 2) * 4 for i in range(8)]].reshape(1, 8)
    from jax.sharding import Mesh
    bad_mesh = Mesh(interleaved, ("ch", "blk"))
    try:
        MH.local_time_slice(n_samples, bad_mesh)
        print("NONCONTIG_FAIL: no error raised", flush=True)
    except ValueError as e:
        assert "contiguous" in str(e), e
        print("NONCONTIG_OK", flush=True)

    # --- gather_frames round-trip ---
    from project_desert_tortoise_tpu.ops.framer import Frame
    local = [Frame(float(pid) + 0.25, False,
                   np.arange(8, dtype=np.uint8) + pid, True)]
    gathered = MH.gather_frames(local)
    assert len(gathered) == nprocs, gathered
    times = sorted(f.time for f in gathered)
    assert times == [0.25, 1.25], times
    print("GATHERED_FRAMES_OK", flush=True)

    # --- end-to-end: each process stages ONLY its local slice ---
    from project_desert_tortoise_tpu.parallel.blocked import BlockPlan
    from project_desert_tortoise_tpu.utils.config import POES_TIP
    from project_desert_tortoise_tpu.utils import synth, wav as W

    fs = 50000.0
    iq, sent = synth.make_poes_recording(n_frames=4, fs=fs, snr_db=25.0)
    t = W.time_axis(len(iq), fs, np.float32)
    plan = BlockPlan(core=8192, head=8192, tail=6144, max_frames=8)
    frames = MH.demodulate_multihost(iq[None, :], t, fs, POES_TIP, mesh,
                                     plan=plan)
    sent_set = {x.tobytes() for x in sent}
    ok = sum(1 for f in frames[0]
             if np.asarray(f.data, np.uint8).tobytes() in sent_set)
    assert ok >= len(sent) - 1, (ok, len(sent), len(frames[0]))
    print("E2E_FRAMES_OK", ok, flush=True)


if __name__ == "__main__":
    main()
