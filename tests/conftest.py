import os

# Tests run on the CPU backend with a virtual 8-device mesh so multi-chip
# sharding paths are exercised without TPU hardware (SURVEY.md section 4.7).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; pin the
# default device to CPU so tests are deterministic and tunnel-free.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF = "/root/reference"
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
TAPS = os.path.join(REPO, "oracle", "golden", "poes", "taps")


def _autobuild():
    """Build the C oracle, stage taps, and native IO lib on first run.

    VERDICT.md round-1 weakness 1: a fresh checkout silently skipped every
    golden-parity test because these artifacts are gitignored. gcc/g++/make
    are baked into the image, so build them here (idempotent, ~2 s).
    Failures are non-fatal — the affected fixtures still skip with a reason.
    """
    import subprocess

    build = os.path.join(REPO, "oracle", "build")
    try:
        if not os.path.exists(os.path.join(build, "tap_poes")):
            subprocess.run(["bash", os.path.join(REPO, "oracle", "build_oracle.sh")],
                           check=True, capture_output=True, timeout=120)
        clip = os.path.join(REF, "5sec_clip.wav")
        if (os.path.exists(clip)
                and not os.path.exists(os.path.join(TAPS, "frames.txt"))):
            os.makedirs(TAPS, exist_ok=True)
            subprocess.run([os.path.join(build, "tap_poes"), clip, TAPS],
                           check=True, capture_output=True, timeout=300)
        native = os.path.join(REPO, "project_desert_tortoise_tpu", "native")
        if not os.path.exists(os.path.join(native, "libpdtwavio.so")):
            subprocess.run(["make", "-C", native], check=True,
                           capture_output=True, timeout=120)
    except Exception as e:  # pragma: no cover - best effort
        import sys
        print(f"[conftest] oracle autobuild failed: {e}", file=sys.stderr)


_autobuild()


@pytest.fixture(scope="session")
def poes_clip():
    from project_desert_tortoise_tpu.utils import wav as W
    if not os.path.exists(f"{REF}/5sec_clip.wav"):
        pytest.skip("reference clip not available")
    iq, t, fs, hdr = W.load_iq_wav(f"{REF}/5sec_clip.wav")
    return iq, t, fs


@pytest.fixture(scope="session")
def taps_dir():
    if not os.path.isdir(TAPS):
        pytest.skip("C oracle taps not built (run oracle/build_oracle.sh + tap_poes)")
    return TAPS


def load_tap(name, dtype=np.float32):
    return np.fromfile(os.path.join(TAPS, name), dtype)


@pytest.fixture(scope="session")
def oracle_frames(taps_dir):
    """Parsed frames.txt from the local C oracle run."""
    out = []
    with open(os.path.join(taps_dir, "frames.txt")) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            ts = parts[0]
            inv = ts.endswith("i")
            out.append((float(ts[:-1] if inv else ts), inv,
                        [int(x, 16) for x in parts[1:]]))
    return out
