"""Numpy parity oracle reproducing the reference's exhaustive scoring
semantics (``/root/reference/src/light_splade/evaluator/sparse_retriever.py:78-96``):
dense score matrix -> threshold -> descending sort -> truncate to k, with the
pinned deterministic tie-break (score DESC, doc_id ASC) that both the engine
and this oracle apply (the reference's argsort tie order is internal).

BM25 weights (k1=1.2, b=0.75) stand in for the reference's neural term
weights — the scoring join itself (sparse dot product over shared terms) is
identical.
"""

from __future__ import annotations

import math
import re
from collections import Counter

TOKEN_RE = re.compile(r"[a-z0-9]+")
K1, B = 1.2, 0.75


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def bm25_topk(
    corpus: dict[int, str],
    queries: list[tuple[int, str]],
    top_k: int = 10,
    threshold: float = 0.0,
    decimals: int = 4,
) -> list[tuple[int, int, int, float]]:
    """-> rows (qid, rank, doc_id, score) — exhaustive, exact."""
    doc_tf = {d: Counter(tokenize(t)) for d, t in corpus.items()}
    dls = {d: sum(c.values()) for d, c in doc_tf.items()}
    n = len(corpus)
    avgdl = sum(dls.values()) / n
    df: Counter = Counter()
    for c in doc_tf.values():
        df.update(c.keys())
    rows = []
    for qid, qtext in queries:
        qtf = Counter(tokenize(qtext))
        scores = {}
        for d, c in doc_tf.items():
            s = 0.0
            for t, qv in qtf.items():
                if t in c:
                    idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                    tf = c[t]
                    sat = tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * dls[d] / avgdl))
                    s += qv * idf * sat
            if s != 0.0:
                scores[d] = round(s, decimals)
        keep = [(d, s) for d, s in scores.items() if s >= threshold]
        keep.sort(key=lambda x: (-x[1], x[0]))
        if top_k and top_k > 0:
            keep = keep[:top_k]
        rows.extend((qid, i + 1, d, s) for i, (d, s) in enumerate(keep))
    return rows
