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
    """Build the runtime.  Set RACON_TPU_NATIVE_DEBUG=1 for an
    AddressSanitizer debug build (the reference's `make debug` ->
    -Db_sanitize=address, Makefile:26-28)."""
    debug = os.environ.get("RACON_TPU_NATIVE_DEBUG") == "1"
    lib_path = LIB_PATH if not debug else LIB_PATH + ".asan.so"
    if not force and os.path.exists(lib_path):
        src_mtime = max(os.path.getmtime(s) for s in SOURCES)
        if os.path.getmtime(lib_path) >= src_mtime:
            return lib_path
    flags = (["-O1", "-g", "-fsanitize=address"] if debug
             else ["-O3", "-march=native"])
    cmd = [
        "g++", *flags, "-std=c++17", "-shared", "-fPIC",
        "-pthread", "-o", lib_path, *SOURCES, "-lz",
    ]
    print(f"[racon_tpu::native] building: {' '.join(cmd)}", file=sys.stderr)
    subprocess.run(cmd, check=True)
    return lib_path


if __name__ == "__main__":
    build(force=True)
