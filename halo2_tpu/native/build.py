"""Build the native host-arithmetic library (g++ -> shared object).

The artifact is cached next to the source keyed by a source hash, so the
first import after a source change rebuilds (about a second) and later
imports just dlopen. Failure to build is non-fatal: callers fall back to
the pure-Python spec path (`halo2_tpu.curves`).
"""

from __future__ import annotations

import hashlib
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "h2native.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")


def lib_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_BUILD_DIR, f"libh2native-{h}.so")


def ensure_built() -> str | None:
    """Return the shared-object path, building it if needed; None on failure."""
    path = lib_path()
    if os.path.exists(path):
        return path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = path + ".tmp"
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-fno-exceptions", "-fno-rtti",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, path)
    return path


if __name__ == "__main__":
    p = ensure_built()
    print(p or "BUILD FAILED")
