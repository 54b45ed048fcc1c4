"""ctypes bindings for the native CPU engine (ref_engine.cpp).

Builds the shared library on first use with g++ -O3 (cached beside the
source). Used as the measured single-thread CPU baseline (BASELINE.md:
no Julia runtime in the image) and as a fast host-side oracle.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ref_engine.cpp")

_lib = None


def _lib_path() -> str:
    """Build products are keyed on a content hash of the source, so a stale
    or foreign binary can never be loaded (checkout mtimes are arbitrary)."""
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"_ref_engine-{h}.so")


def _build(lib_path: str) -> None:
    # portable flags only: this is the measured CPU baseline and must build
    # and run on any x86-64 checkout (-march=native binaries SIGILL on older
    # microarchitectures)
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", lib_path]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib_path = _lib_path()
    if not os.path.exists(lib_path):
        _build(lib_path)
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        _build(lib_path)  # e.g. truncated artifact from an interrupted build
        lib = ctypes.CDLL(lib_path)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.hmmss_viterbi.argtypes = [dp, ctypes.c_int64, ip, ip, dp,
                                  ctypes.c_int64, dp, ctypes.c_int64,
                                  ctypes.c_double, ip, dp]
    lib.hmmss_forward.argtypes = [dp, ctypes.c_int64, ip, ip, dp,
                                  ctypes.c_int64, dp, ctypes.c_int64,
                                  ctypes.c_double, dp]
    lib.hmmss_backward.argtypes = lib.hmmss_forward.argtypes
    lib.hmmss_em_step.argtypes = [dp, ctypes.c_int64, ip, ip, dp,
                                  ctypes.c_int64, dp, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_double, dp, dp, dp, dp]
    _lib = lib
    return lib


def _as(arr, dtype):
    return np.ascontiguousarray(np.asarray(arr), dtype=dtype)


def _edge_args(ss, lp):
    efrom = _as(ss.edges_from, np.int32)
    eto = _as(ss.edges_to, np.int32)
    ew = _as(ss.edge_weights(lp), np.float64)
    return efrom, eto, ew


def viterbi(y, ss, lp, mu, sigma):
    """Reference-semantics Viterbi (native). Returns (x int32, ll)."""
    lib = get_lib()
    y = _as(y, np.float64)
    efrom, eto, ew = _edge_args(ss, lp)
    smu = _as(np.asarray(mu)[ss.states, np.arange(ss.n_neurons)[:, None]]
              .sum(axis=0), np.float64)
    x = np.empty(len(y), np.int32)
    ll = ctypes.c_double()
    dp = ctypes.POINTER(ctypes.c_double)
    lib.hmmss_viterbi(
        y.ctypes.data_as(dp), len(y),
        efrom.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        eto.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ew.ctypes.data_as(dp), len(ew),
        smu.ctypes.data_as(dp), ss.nstates, float(sigma),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(ll))
    return x, ll.value


def _fb(fn_name, y, ss, lp, mu, sigma):
    lib = get_lib()
    y = _as(y, np.float64)
    efrom, eto, ew = _edge_args(ss, lp)
    smu = _as(np.asarray(mu)[ss.states, np.arange(ss.n_neurons)[:, None]]
              .sum(axis=0), np.float64)
    out = np.empty((len(y), ss.nstates), np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    getattr(lib, fn_name)(
        y.ctypes.data_as(dp), len(y),
        efrom.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        eto.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ew.ctypes.data_as(dp), len(ew),
        smu.ctypes.data_as(dp), ss.nstates, float(sigma),
        out.ctypes.data_as(dp))
    return out


def em_step(y, ss, lp, mu, sigma):
    """One reference-semantics Baum-Welch iteration (src/baumwelch.jl:205-309),
    single thread — the measured BW iter/s CPU baseline.

    Returns (new_lp (N,), new_mu (K, N), new_sigma, ll)."""
    lib = get_lib()
    y = _as(y, np.float64)
    mu = _as(mu, np.float64)
    K, N = mu.shape
    efrom, eto, ew = _edge_args(ss, lp)
    smu = _as(mu[ss.states, np.arange(N)[:, None]].sum(axis=0), np.float64)
    new_lp = np.empty(N, np.float64)
    new_mu = np.empty((K, N), np.float64)
    new_sigma = ctypes.c_double()
    ll = ctypes.c_double()
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.hmmss_em_step(
        y.ctypes.data_as(dp), len(y),
        efrom.ctypes.data_as(ip), eto.ctypes.data_as(ip),
        ew.ctypes.data_as(dp), len(ew),
        smu.ctypes.data_as(dp), ss.nstates, N, K, float(sigma),
        new_lp.ctypes.data_as(dp), new_mu.ctypes.data_as(dp),
        ctypes.byref(new_sigma), ctypes.byref(ll))
    return new_lp, new_mu, new_sigma.value, ll.value


def forward(y, ss, lp, mu, sigma):
    """(T, S) alpha — reference src/baumwelch.jl:25-51 semantics (native)."""
    return _fb("hmmss_forward", y, ss, lp, mu, sigma)


def backward(y, ss, lp, mu, sigma):
    """(T, S) beta — reference src/baumwelch.jl:73-98 semantics (native)."""
    return _fb("hmmss_backward", y, ss, lp, mu, sigma)
