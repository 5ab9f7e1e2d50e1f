"""Mode registry: name -> ModeConfig (the framework's model families)."""
from project_desert_tortoise_tpu.utils.config import MODES  # noqa: F401


def get_mode(name: str):
    try:
        return MODES[name]
    except KeyError:
        raise KeyError(f"unknown mode {name!r}; available: {sorted(MODES)}")
