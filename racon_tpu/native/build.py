"""Build the native runtime library (librtlib.so) with g++.

Compiled on demand at first import of racon_tpu.native.rtlib; the shared
object is cached next to the sources and rebuilt when the source is newer.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCES = [os.path.join(_DIR, "rtlib.cpp")]
LIB_PATH = os.path.join(_DIR, "librtlib.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(LIB_PATH):
        src_mtime = max(os.path.getmtime(s) for s in SOURCES)
        if os.path.getmtime(LIB_PATH) >= src_mtime:
            return LIB_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", "-o", LIB_PATH, *SOURCES, "-lz",
    ]
    print(f"[racon_tpu::native] building: {' '.join(cmd)}", file=sys.stderr)
    subprocess.run(cmd, check=True)
    return LIB_PATH


if __name__ == "__main__":
    build(force=True)
