"""On-demand build of the native runtime library (g++ -O3 -fopenmp).

The shared object is cached next to the sources and rebuilt when any source
is newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["twoview_oracle.cpp", "taskpool.cpp"]
_LIB = os.path.join(_DIR, "libsrtpu_native.so")

_loaded = None


def build_native(force: bool = False) -> str:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES
            if os.path.exists(os.path.join(_DIR, s))]
    if not srcs:
        raise RuntimeError("no native sources found")
    if (not force and os.path.exists(_LIB)
            and all(os.path.getmtime(_LIB) >= os.path.getmtime(s)
                    for s in srcs)):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", "-o", _LIB] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load_library() -> ctypes.CDLL:
    global _loaded
    if _loaded is None:
        _loaded = ctypes.CDLL(build_native())
    return _loaded
