"""Build the native library (g++ -> libmndio.so next to this file).

Run: python -m cholesky_tpu.native.build
The package works without it (NumPy fallbacks); the extension accelerates
parsing, hashed ingest, and panel assembly for large problems.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src", "mndio.cc")
LIB = os.path.join(HERE, "libmndio.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    # portable ISA on purpose: the library is rebuilt on whatever host
    # imports it, and -march=native binaries SIGILL on lesser CPUs
    cmd = ["g++", "-O3", "-pthread", "-shared", "-fPIC", "-o", LIB, SRC]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
