"""Pure-numpy property tests: BMW interval pruning is EXACT — identical
results to exhaustive TAAT on randomized posting structures (no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from light_splade_spark.index.wand import _bmw, _taat


def _mk_term(rng, n_docs_universe: int, df: int, block: int = 16):
    docs = np.sort(rng.choice(n_docs_universe, size=df, replace=False)).astype(np.int64)
    ws = (rng.random(df).astype(np.float32) * 3).astype(np.float32)
    bstart = np.arange(0, df, block)
    bm_max = np.maximum.reduceat(ws, bstart).astype(np.float32)
    bm_last = docs[np.minimum(bstart + block - 1, df - 1)]
    qtf = int(rng.integers(1, 3))
    return (qtf, docs, ws, bm_last, bm_max)


@given(st.integers(0, 10_000), st.integers(1, 6), st.integers(1, 20))
@settings(max_examples=60, deadline=None)
def test_bmw_equals_taat_topk(seed, n_terms, top_k):
    rng = np.random.default_rng(seed)
    terms = [_mk_term(rng, 2000, int(rng.integers(1, 400))) for _ in range(n_terms)]
    d_t, s_t = _taat(terms)
    d_b, s_b = _bmw(terms, top_k)
    # exhaustive maps for comparison
    full = dict(zip(d_t.tolist(), s_t.tolist()))
    got = dict(zip(d_b.tolist(), s_b.tolist()))
    # every BMW-scored doc has the exact exhaustive score
    for d, s in got.items():
        assert abs(full[d] - s) < 1e-9
    # the true top-k (score desc, doc asc) is contained in BMW's candidates
    order = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    guard = 1e-4
    for d, s in order:
        # candidates may legitimately omit docs only when a tie within the
        # rounding guard exists at the k-th score; require presence beyond it
        kth = order[-1][1]
        if s > kth - guard or d in got:
            assert d in got, (d, s, kth)


def test_bmw_topk_zero_means_exhaustive():
    rng = np.random.default_rng(1)
    terms = [_mk_term(rng, 500, 120), _mk_term(rng, 500, 60)]
    d_t, s_t = _taat(terms)
    d_b, s_b = _bmw(terms, 0)
    assert dict(zip(d_b.tolist(), s_b.tolist())) == dict(zip(d_t.tolist(), s_t.tolist()))
