"""Minimal pure-numpy stand-in for ``scipy.sparse`` (dense-backed CSR).

This container ships no scipy, but tests/test_reference_parity.py wants to
execute the REFERENCE's own indexer/retriever code
(/root/reference/src/light_splade/evaluator/sparse_{indexer,retriever}.py)
side-by-side with our engine. Those modules only use a narrow slice of the
scipy.sparse API — ``csr_matrix`` construction (empty-shape and COO-triplet
forms), ``vstack``, ``.shape``, ``.dot``, ``.T``, ``.toarray()``, row
slicing — all of which are exactly reproducible with a dense float array at
test scale (hundreds of docs x a few thousand terms). ``install()`` registers
the stub under ``sys.modules['scipy']``/``['scipy.sparse']`` ONLY when real
scipy is absent, so the reference code itself runs unmodified everywhere.

Semantics matched to scipy where the reference relies on them:
* COO-triplet construction SUMS duplicate (row, col) entries;
* ``dtype`` is preserved through construction and vstack;
* ``.dot`` of (1, V) x (V, N) yields a matrix whose ``.toarray()`` is (1, N).
"""

from __future__ import annotations

import sys
import types

import numpy as np


class csr_matrix:  # noqa: N801 — name mirrors scipy's
    def __init__(self, arg, shape=None, dtype=None):
        if isinstance(arg, csr_matrix):
            a = arg._a
        elif (isinstance(arg, tuple) and len(arg) == 2
              and all(isinstance(x, (int, np.integer)) for x in arg)):
            a = np.zeros(arg, dtype=dtype or np.float64)
        elif isinstance(arg, tuple) and len(arg) == 2:
            vals, (rows, cols) = arg
            if shape is None:
                raise ValueError("shape required for triplet construction")
            a = np.zeros(shape, dtype=np.float64)
            # scipy sums duplicate coordinates
            np.add.at(a, (np.asarray(rows, dtype=np.int64),
                          np.asarray(cols, dtype=np.int64)),
                      np.asarray(vals, dtype=np.float64))
        else:
            a = np.asarray(arg)
        self._a = a.astype(dtype, copy=False) if dtype is not None else a

    @property
    def shape(self):
        return self._a.shape

    @property
    def dtype(self):
        return self._a.dtype

    @property
    def nnz(self):
        return int(np.count_nonzero(self._a))

    @property
    def T(self):  # noqa: N802 — mirrors numpy/scipy
        return csr_matrix(self._a.T)

    def dot(self, other):
        o = other._a if isinstance(other, csr_matrix) else np.asarray(other)
        return csr_matrix(self._a @ o)

    def toarray(self):
        return np.asarray(self._a).copy()

    def __getitem__(self, idx):
        out = self._a[idx]
        if out.ndim == 1:
            out = out[None, :]
        return csr_matrix(out)


def vstack(mats):
    arrs = [m._a if isinstance(m, csr_matrix) else np.asarray(m) for m in mats]
    dtype = np.result_type(*[a.dtype for a in arrs])
    return csr_matrix(np.vstack(arrs).astype(dtype, copy=False))


def install() -> None:
    """Register this module as scipy.sparse if real scipy is unavailable."""
    try:
        import scipy.sparse  # noqa: F401 — real scipy wins
        return
    except ImportError:
        pass
    import importlib.machinery

    scipy_mod = types.ModuleType("scipy")
    sparse_mod = types.ModuleType("scipy.sparse")
    # a real ModuleSpec so importlib.util.find_spec("scipy") (used by
    # pyspark.testing.utils to probe optional deps) doesn't choke on
    # __spec__ = None
    scipy_mod.__spec__ = importlib.machinery.ModuleSpec(
        "scipy", loader=None, is_package=True)
    scipy_mod.__path__ = []
    sparse_mod.__spec__ = importlib.machinery.ModuleSpec(
        "scipy.sparse", loader=None)
    sparse_mod.csr_matrix = csr_matrix
    sparse_mod.vstack = vstack
    scipy_mod.sparse = sparse_mod
    sys.modules.setdefault("scipy", scipy_mod)
    sys.modules["scipy.sparse"] = sparse_mod
