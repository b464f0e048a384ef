"""Native (C++) backends, compiled on demand with the system toolchain.

The shared library is built once per source hash into the user cache and
loaded through ctypes — no pip/pybind dependency (the environment's
Python↔C++ bridge of choice).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
from pathlib import Path

_SRC_DIR = Path(__file__).parent


def _build_and_load(name: str) -> ctypes.CDLL:
    src = _SRC_DIR / f"{name}.cpp"
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    cache = Path(
        os.environ.get(
            "NIFTY_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "nifty_tpu"),
        )
    )
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"{name}_{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(".so.tmp")
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3", "-shared", "-fPIC", "-std=c++17",
            str(src), "-o", str(tmp),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    return ctypes.CDLL(str(so))


_libs: dict = {}


def get_lib(name: str) -> ctypes.CDLL:
    if name not in _libs:
        _libs[name] = _build_and_load(name)
    return _libs[name]
