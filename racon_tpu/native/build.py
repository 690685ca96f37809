"""Build the native runtime library (librtlib.so) with g++.

Compiled on demand at first import of racon_tpu.native.rtlib; the shared
object is cached next to the sources and rebuilt whenever the source
content changes (a content hash is stored next to the .so, so a stale or
foreign binary — e.g. one built on another machine with -march=native —
is never loaded silently).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCES = [os.path.join(_DIR, "rtlib.cpp")]
LIB_PATH = os.path.join(_DIR, "librtlib.so")


def _source_hash(debug: bool) -> str:
    h = hashlib.sha256()
    h.update(b"debug" if debug else b"release")
    for s in SOURCES:
        with open(s, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def build(force: bool = False) -> str:
    """Build the runtime.  Set RACON_TPU_NATIVE_DEBUG=1 for an
    AddressSanitizer debug build (the reference's `make debug` ->
    -Db_sanitize=address, Makefile:26-28)."""
    debug = os.environ.get("RACON_TPU_NATIVE_DEBUG") == "1"
    lib_path = LIB_PATH if not debug else LIB_PATH + ".asan.so"
    stamp_path = lib_path + ".sha256"
    want = _source_hash(debug)
    if not force and os.path.exists(lib_path) and os.path.exists(stamp_path):
        with open(stamp_path) as f:
            if f.read().strip() == want:
                return lib_path
    flags = (["-O1", "-g", "-fsanitize=address"] if debug
             else ["-O3", "-march=native"])
    cmd = [
        "g++", *flags, "-std=c++17", "-shared", "-fPIC",
        "-pthread", "-o", lib_path, *SOURCES, "-lz",
    ]
    print(f"[racon_tpu::native] building: {' '.join(cmd)}", file=sys.stderr)
    subprocess.run(cmd, check=True)
    with open(stamp_path, "w") as f:
        f.write(want + "\n")
    return lib_path


if __name__ == "__main__":
    build(force=True)
