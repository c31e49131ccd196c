"""ctypes binding to the native C++ feature extractor (cpp/).

Builds libfeatures.so on demand with g++ (no pip deps) and exposes
`extract_features_native(x) -> (n_frames, 36)`, the host-side
counterpart of fpsc_tpu.dsp.frontend.extract_features_np.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cpp")
_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> str:
    lib = os.path.join(_CPP_DIR, "libfeatures.so")
    src = os.path.join(_CPP_DIR, "feature_extractor.cpp")
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-Wall", "-fPIC", "-shared", "-o", lib, src],
            check=True)
    return lib


def load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.fe_extract_features.restype = ctypes.c_int
        lib.fe_extract_features.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    return _LIB


def extract_features_native(x: np.ndarray) -> np.ndarray:
    """x: (n_samples,) float32 in [-1, 1] -> (n_frames, 36)."""
    lib = load()
    x = np.ascontiguousarray(x, np.float32)
    n_frames = max(0, len(x) // 160 - 1)
    out = np.zeros((max(n_frames, 1), 36), np.float32)
    got = lib.fe_extract_features(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:got]
