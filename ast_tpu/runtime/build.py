"""Build the native audio runtime (g++ -O3 shared library).

Called lazily by ast_tpu.data.audio_io on first use; idempotent (rebuilds
only when the source is newer than the .so)."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "audio_native.cpp")
LIB = os.path.join(_DIR, "libastaudio.so")


def build(force: bool = False) -> str:
    """Compile if needed; returns the .so path."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", LIB, SRC]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
