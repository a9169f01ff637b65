"""Build the native kernel library with g++ (no pybind11 dependency)."""

from __future__ import annotations

import os
import subprocess

SRC = os.path.join(os.path.dirname(__file__), "src", "kernels.cc")
LIB = os.path.join(os.path.dirname(__file__), "libocrfa_kernels.so")


def build(force: bool = False) -> str | None:
    """Compile the shared library; returns its path or None on failure."""
    if os.path.exists(LIB) and not force:
        if os.path.getmtime(LIB) >= os.path.getmtime(SRC):
            return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", LIB, SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return None
    return LIB


if __name__ == "__main__":
    path = build(force=True)
    print(path or "build failed")
