"""ctypes loader for the native Mie core (csrc/miecore.cpp).

Compiled lazily with g++ into the content-addressed cache directory and
loaded via ctypes; everything degrades gracefully to the NumPy
implementation (set SOS_RT_NO_NATIVE=1 to force the fallback).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                     "csrc", "miecore.cpp")


def _cache_dir() -> str:
    return os.environ.get(
        "SOS_RT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "sos_rt_tpu"))


def _build() -> str | None:
    src = os.path.abspath(_CSRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libsosmie_{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_cache_dir(), exist_ok=True)
    tmp = out + f".tmp{os.getpid()}.so"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except Exception as e:  # toolchain missing → numpy fallback
        print(f"[sos_rt_tpu] native mie build skipped: {e}", file=sys.stderr)
        return None


def get_lib():
    """The loaded native library, or None (NumPy fallback)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SOS_RT_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mie_nstop.restype = ctypes.c_int64
    lib.mie_nstop.argtypes = [ctypes.c_double]
    lib.mie_ab.restype = None
    lib.mie_ab.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_double,
                           ctypes.c_int64, dp, dp, dp, dp]
    lib.mie_s1s2.restype = None
    lib.mie_s1s2.argtypes = [dp, dp, dp, dp, ctypes.c_int64, dp,
                             ctypes.c_int64, dp, dp, dp, dp]
    lib.mie_efficiencies.restype = None
    lib.mie_efficiencies.argtypes = [dp, dp, dp, dp, ctypes.c_int64,
                                     ctypes.c_double, dp]
    _LIB = lib
    return _LIB


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def native_ab(m: complex, x: float, nmax: int):
    lib = get_lib()
    a_re = np.empty(nmax)
    a_im = np.empty(nmax)
    b_re = np.empty(nmax)
    b_im = np.empty(nmax)
    lib.mie_ab(float(m.real), float(m.imag), float(x), nmax,
               _ptr(a_re), _ptr(a_im), _ptr(b_re), _ptr(b_im))
    return a_re + 1j * a_im, b_re + 1j * b_im


def native_s1s2(a: np.ndarray, b: np.ndarray, mu: np.ndarray):
    lib = get_lib()
    shape = np.shape(mu)
    mu = np.ascontiguousarray(np.ravel(mu), dtype=np.float64)
    n_mu = mu.size
    a_re = np.ascontiguousarray(a.real)
    a_im = np.ascontiguousarray(a.imag)
    b_re = np.ascontiguousarray(b.real)
    b_im = np.ascontiguousarray(b.imag)
    s1_re = np.empty(n_mu)
    s1_im = np.empty(n_mu)
    s2_re = np.empty(n_mu)
    s2_im = np.empty(n_mu)
    lib.mie_s1s2(_ptr(a_re), _ptr(a_im), _ptr(b_re), _ptr(b_im), len(a),
                 _ptr(mu), n_mu, _ptr(s1_re), _ptr(s1_im), _ptr(s2_re),
                 _ptr(s2_im))
    return (s1_re + 1j * s1_im).reshape(shape), (s2_re + 1j * s2_im).reshape(shape)


def native_efficiencies(a: np.ndarray, b: np.ndarray, x: float):
    lib = get_lib()
    out = np.empty(4)
    a_re = np.ascontiguousarray(a.real)
    a_im = np.ascontiguousarray(a.imag)
    b_re = np.ascontiguousarray(b.real)
    b_im = np.ascontiguousarray(b.imag)
    lib.mie_efficiencies(_ptr(a_re), _ptr(a_im), _ptr(b_re), _ptr(b_im),
                         len(a), float(x), _ptr(out))
    return tuple(out)
