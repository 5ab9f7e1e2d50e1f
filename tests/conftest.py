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
TAPS = os.path.join(os.path.dirname(__file__), "..", "oracle", "golden",
                    "poes", "taps")


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
