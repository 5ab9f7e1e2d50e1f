"""CLI: ARGOS file demodulator (twin of the reference `demodARGOS`).

Flags match ``ARGOSdemod/main.c:121-164``: ``-r``, ``-n``, ``-c``; wav input
only in the reference (we accept raw too, with ``-s``).
"""
from project_desert_tortoise_tpu.apps.demod_poes import run


def main():
    raise SystemExit(run(default_mode="argos", prefix="packets"))


if __name__ == "__main__":
    main()
