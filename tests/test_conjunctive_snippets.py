"""Boolean-AND retrieval (conjunctive_topk) + result snippets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_splade_spark.engine import Engine
from light_splade_spark.operators.snippets import snippets

CORPUS = [
    (0, "spark hash join merge sort"),
    (1, "hash join only here"),
    (2, "spark join and nothing else"),
    (3, "spark spark spark hash hash join"),
    (4, "completely unrelated words"),
    (5, ""),  # empty doc — stats edge case
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    docs = spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")
    d = tmp_path_factory.mktemp("conj") / "idx"
    return Engine.build(spark, docs, str(d), n_buckets=4, n_salts=2,
                        n_shard_groups=1, block_size=32), docs


def test_conjunctive_matches_only_full_matches(eng):
    engine, _ = eng
    out = engine.conjunctive([(0, "spark hash join")], top_k=0).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 3]  # both terms+join
    # disjunctive retrieve finds partial matches too
    dis = engine.retrieve([(0, "spark hash join")], top_k=0).collect()
    assert len(dis) > len(out)


def test_conjunctive_scores_equal_disjunctive(eng):
    """AND-mode scores are byte-identical to retrieve()'s for the same
    (query, doc) pairs — same impacts, same rounding, same tie-break."""
    engine, _ = eng
    q = [(7, "spark hash join"), (8, "hash join")]
    conj = {(r["qid"], r["doc_id"]): r["score"]
            for r in engine.conjunctive(q, top_k=0).collect()}
    dis = {(r["qid"], r["doc_id"]): r["score"]
           for r in engine.retrieve(q, top_k=0).collect()}
    assert conj and all(dis[k] == v for k, v in conj.items())


def test_conjunctive_absent_term_and_ranks(eng):
    engine, _ = eng
    # a term missing from the index -> zero rows (never partial matches)
    assert engine.conjunctive([(0, "spark zzzabsent")], top_k=0).count() == 0
    # ranks are 1..n, score-desc, doc_id tie-break
    rows = engine.conjunctive([(0, "hash join")], top_k=2).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]


def test_conjunctive_duckdb_oracle(eng):
    """Full mirror: BM25 over shared terms, docs containing ALL terms."""
    import duckdb

    engine, _ = eng
    got = sorted((r["qid"], r["doc_id"], r["score"])
                 for r in engine.conjunctive(
                     [(0, "spark hash"), (1, "join")], top_k=0).collect())
    k1, b = engine.manifest.k1, engine.manifest.b
    n, avgdl = engine.manifest.n_docs, engine.manifest.avgdl
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", CORPUS)
    got_sql = sorted(tuple(r) for r in con.sql(f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM docs WHERE text <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(qid, term, qtf) AS (VALUES (0, 'spark', 1), (0, 'hash', 1), (1, 'join', 1)),
nq AS (SELECT qid, count(*) AS n_terms FROM q GROUP BY 1),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(CAST(
           ln(1 + ({n} - df.df + 0.5) / (df.df + 0.5)) *
           (tf.tf * ({k1} + 1)) /
           (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / {avgdl}))
         AS FLOAT) AS DOUBLE) AS w
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)),
sc AS (
  SELECT q.qid, w.doc_id, round(sum(q.qtf * w.w), 4) AS score,
         count(*) AS nm
  FROM q JOIN w ON q.term = w.term GROUP BY 1, 2)
SELECT sc.qid, sc.doc_id, sc.score
FROM sc JOIN nq USING (qid) WHERE sc.nm = nq.n_terms
ORDER BY 1, 2""").fetchall())
    assert got == got_sql


def test_snippets_golden_and_nulls(eng, spark):
    engine, docs = eng
    res = engine.conjunctive([(0, "hash join")], top_k=0)
    out = {r["doc_id"]: r for r in
           snippets(res, docs, [(0, "hash join")], window=6).collect()}
    # doc 0: earliest occurrence of 'hash' at pos 7 ("spark hash ...")
    assert out[0]["matched_term"] == "hash"
    assert "hash" in out[0]["snippet"]
    # window clipping adds ellipses only where text was cut
    assert out[0]["snippet"].startswith("…") or out[0]["snippet"].startswith("spark")
    # every result row survives, even if no substring match existed
    assert set(out) == {r["doc_id"] for r in res.collect()}


def test_snippets_duckdb_mirror(spark):
    """The whole operator is ANSI-mirrorable: strpos/substr in DuckDB
    produce the same (matched_term, snippet) values."""
    import duckdb

    rows = [(0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "xx gamma yy"), (2, "no match here at all")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    res = spark.createDataFrame([(9, 0), (9, 1), (9, 2)],
                                "qid BIGINT, doc_id BIGINT")
    got = sorted((r["doc_id"], r["matched_term"], r["snippet"])
                 for r in snippets(res, docs, [(9, "gamma zeta")],
                                   window=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.sql("""
WITH q(qid, term) AS (VALUES (9, 'gamma'), (9, 'zeta')),
hit AS (
  SELECT d.doc_id, q.term, strpos(lower(d.text), q.term) AS pos, d.text
  FROM docs d CROSS JOIN q WHERE strpos(lower(d.text), q.term) > 0),
best AS (
  SELECT doc_id, term, pos, text,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos, term) AS rn
  FROM hit)
SELECT r.doc_id,
       b.term AS matched_term,
       CASE WHEN b.doc_id IS NULL THEN NULL ELSE
         (CASE WHEN greatest(1, b.pos - 5) > 1 THEN '…' ELSE '' END) ||
         substr(b.text, greatest(1, b.pos - 5), length(b.term) + 10) ||
         (CASE WHEN greatest(1, b.pos - 5) + length(b.term) + 10
                    <= length(b.text) THEN '…' ELSE '' END)
       END AS snippet
FROM (SELECT DISTINCT doc_id FROM docs) r
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY 1""").fetchall())
    assert got == want


def test_snippets_unicode_length_changing_case(spark):
    """Positions are found on the lowered text; when case folding changes
    string length ('İ' U+0130 lowers to 2 chars) the window must still
    contain the match (extraction falls back to the folded text)."""
    docs = spark.createDataFrame([(0, "İİİ gamma delta")],
                                 "doc_id BIGINT, text STRING")
    res = spark.createDataFrame([(1, 0)], "qid BIGINT, doc_id BIGINT")
    row = snippets(res, docs, [(1, "gamma")], window=0).collect()[0]
    assert "gamma" in row["snippet"], row["snippet"]


def test_snippets_no_python_plan(eng, spark):
    engine, docs = eng
    res = engine.conjunctive([(0, "hash join")], top_k=0)
    out = snippets(res, docs, [(0, "hash join")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_conjunctive_exclude_terms(eng):
    """NOT arm: docs containing any excluded term are banned before
    ranking; survivors keep their exact scores; an index-absent excluded
    term bans nothing."""
    engine, _ = eng
    base = {r["doc_id"]: r["score"]
            for r in engine.conjunctive([(0, "hash join")], top_k=0)
            .collect()}
    # 'spark' appears in docs 0, 2, 3 -> only doc 1 survives
    out = engine.conjunctive([(0, "hash join")], top_k=0,
                             exclude="spark").collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["score"] == base[1]          # score unchanged
    assert out[0]["rank"] == 1                 # ranks re-densify
    # absent excluded term bans nothing
    same = engine.conjunctive([(0, "hash join")], top_k=0,
                              exclude="zzzabsent").collect()
    assert {r["doc_id"] for r in same} == set(base)
