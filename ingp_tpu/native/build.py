"""Build the native data-loader shared library with g++.

Compiled on first use into the package dir (cached by source mtime);
falls back cleanly if no toolchain is present.
"""
from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "dataloader.cpp")
_LIB = os.path.join(_DIR, "_dataloader.so")


def build_library(force=False):
    """Returns the .so path, building if stale. Raises on failure."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB
