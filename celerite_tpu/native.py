"""ctypes loader for the native C++ core (native/celerite_core.cpp).

The shared library is compiled on demand with g++ (cached by source hash
under ``native/build/``) and loaded with ctypes — this environment has no
pybind11, and a flat C ABI keeps the boundary simple.  Falls back cleanly
(``available() -> False``) when no toolchain is present.

The native path is a JAX-independent parity oracle and a low-latency eager
CPU solver for small N (no XLA dispatch/compile overhead).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig

import numpy as np

__all__ = ["available", "NativeSolver", "loglike", "factor"]

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "celerite_core.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")

_lib = None
_tried = False


def _compile_and_load():
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, "celerite_core_{0}.so".format(digest))
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp.{0}".format(os.getpid())
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared",
            "-fPIC", "-o", tmp, _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)

    i64 = ctypes.c_int64
    dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.ct_factor.restype = ctypes.c_int
    lib.ct_factor.argtypes = [
        i64, i64, dptr, dptr, dptr, dptr, dptr, dptr,
        ctypes.POINTER(i64),
    ]
    lib.ct_loglike.restype = ctypes.c_int
    lib.ct_loglike.argtypes = [i64, i64, dptr, dptr, dptr, dptr, dptr, dptr]
    lib.ct_solve.restype = None
    lib.ct_solve.argtypes = [i64, i64, dptr, dptr, dptr, dptr, dptr, dptr]
    lib.ct_dot_l.restype = None
    lib.ct_dot_l.argtypes = [i64, i64, dptr, dptr, dptr, dptr, dptr, dptr]
    lib.ct_matmul.restype = None
    lib.ct_matmul.argtypes = [i64, i64, dptr, dptr, dptr, dptr, dptr, dptr]
    lib.ct_abi_version.restype = ctypes.c_int
    assert lib.ct_abi_version() == 1
    return lib


def _get_lib():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        try:
            _lib = _compile_and_load()
        except Exception:
            _lib = None
    return _lib


def available():
    return _get_lib() is not None


def _as_c(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float64))


def factor(U, V, phi, A):
    """Native factor; returns (D, W, ok)."""
    lib = _get_lib()
    U, V, phi, A = map(_as_c, (U, V, phi, A))
    n, p = U.shape
    D = np.empty(n)
    W = np.empty((n, p))
    bad = ctypes.c_int64(-1)
    rc = lib.ct_factor(n, p, U, V, phi, A, D, W, ctypes.byref(bad))
    return D, W, rc == 0


def matmul(U, V, phi, A, z):
    """Native K @ z (single column) without factorizing."""
    lib = _get_lib()
    U, V, phi, A, z = map(_as_c, (U, V, phi, A, z))
    n, p = U.shape
    y = np.empty_like(z)
    lib.ct_matmul(n, p, U, V, phi, A, z, y)
    return y


def loglike(U, V, phi, A, y):
    """Native fused GP log-likelihood; returns (ll, ok)."""
    lib = _get_lib()
    U, V, phi, A, y = map(_as_c, (U, V, phi, A, y))
    n, p = U.shape
    out = np.empty(2)
    rc = lib.ct_loglike(n, p, U, V, phi, A, y, out)
    if rc != 0:
        return -np.inf, False
    ll = -0.5 * (out[0] + out[1] + n * np.log(2.0 * np.pi))
    return float(ll), bool(np.isfinite(ll))


class NativeSolver:
    """Eager CPU solver over pre-lowered (U, V, phi, A) arrays.

    Pass precomputed ``D``/``W`` (e.g. from a pickled factor state) to
    skip re-factorization.
    """

    def __init__(self, U, V, phi, A, D=None, W=None):
        self.U, self.V, self.phi, self.A = map(_as_c, (U, V, phi, A))
        if D is not None:
            self.D, self.W, self.ok = _as_c(D), _as_c(W), True
        else:
            self.D, self.W, self.ok = factor(
                self.U, self.V, self.phi, self.A
            )

    @property
    def log_determinant(self):
        return float(np.sum(np.log(self.D)))

    def solve(self, y):
        lib = _get_lib()
        y = _as_c(y)
        x = np.empty_like(y)
        n, p = self.U.shape
        lib.ct_solve(n, p, self.U, self.phi, self.W, self.D, y, x)
        return x

    def dot_L(self, z):
        lib = _get_lib()
        z = _as_c(z)
        y = np.empty_like(z)
        n, p = self.U.shape
        lib.ct_dot_l(n, p, self.U, self.phi, self.W, self.D, z, y)
        return y

    def matmul(self, z):
        lib = _get_lib()
        z = _as_c(z)
        y = np.empty_like(z)
        n, p = self.U.shape
        lib.ct_matmul(n, p, self.U, self.V, self.phi, self.A, z, y)
        return y
