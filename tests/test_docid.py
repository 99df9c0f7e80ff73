"""assign_doc_ids: dense, deterministic, site-contiguous, scale-shaped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_splade_spark.operators.docid import assign_doc_ids, docid_map


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # (orig, url) — three sites, arrival order deliberately interleaved
        (0, "https://b.example.com/p/2"),
        (1, "https://a.example.com/x"),
        (2, "https://c.example.org/1"),
        (3, "https://b.example.com/p/1"),
        (4, "https://a.example.com/y"),
        (5, "https://c.example.org/0"),
    ]
    return spark.createDataFrame(rows, "orig BIGINT, url STRING")


def test_dense_and_deterministic(pages):
    out1 = assign_doc_ids(pages, order_cols=("url", "orig"))
    got1 = sorted(r["ordered_id"] for r in out1.collect())
    assert got1 == list(range(6))  # dense 0..N-1
    # rebuilt DataFrame (Spark 4 caches same-instance results) -> same ids
    out2 = assign_doc_ids(pages, order_cols=("url", "orig"))
    m1 = {r["orig"]: r["ordered_id"] for r in out1.collect()}
    m2 = {r["orig"]: r["ordered_id"] for r in out2.collect()}
    assert m1 == m2


def test_site_contiguity_and_url_order(pages):
    out = {r["orig"]: r["ordered_id"]
           for r in assign_doc_ids(pages, order_cols=("url", "orig")).collect()}
    # within each site, ids are contiguous and url-ascending
    by_site = {"a": [out[1], out[4]], "b": [out[3], out[0]],
               "c": [out[5], out[2]]}
    for ids in by_site.values():
        assert ids[1] == ids[0] + 1  # url-ascending, adjacent
    # sites do not interleave
    spans = sorted((min(v), max(v)) for v in by_site.values())
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert lo == hi + 1


def test_explicit_site_col_and_map(spark):
    df = spark.createDataFrame(
        [(10, "s2", "u1"), (11, "s1", "u9"), (12, "s1", "u0")],
        "orig BIGINT, site STRING, url STRING")
    out = assign_doc_ids(df, order_cols=("url", "orig"), site_col="site")
    got = {r["orig"]: r["ordered_id"] for r in out.collect()}
    assert sorted(got.values()) == [0, 1, 2]
    # within s1: u0 before u9
    assert got[12] + 1 == got[11]
    mp = docid_map(out, "orig")
    assert set(mp.columns) == {"ordered_id", "orig"}
    assert mp.count() == 3


def test_null_site_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "https://a.example.com/x")], "orig BIGINT, url STRING")
    out = assign_doc_ids(df, order_cols=("url",))
    # null url -> bucket '' via coalesce; both rows still get dense ids
    assert sorted(r["ordered_id"] for r in out.collect()) == [0, 1]
    empty = assign_doc_ids(df.where(F.lit(False)), order_cols=("url",))
    assert empty.count() == 0


def test_matches_global_sort_oracle(spark):
    """The distributed bucket construction equals one global window:
    row_number() over (order by substr(md5(site),1,4), site, url) - 1."""
    import duckdb

    rows = [(i, f"https://s{i % 7}.example.com/p/{(i * 13) % 50}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "orig BIGINT, url STRING")
    got = {r["orig"]: r["ordered_id"]
           for r in assign_doc_ids(df, order_cols=("url", "orig")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (orig BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    # registrable_domain of sN.example.com is example.com for every row,
    # so mirror it literally
    want = dict(con.sql("""
        SELECT orig, row_number() OVER (
            ORDER BY substr(md5('example.com'), 1, 4),
                     'example.com', url, orig) - 1
        FROM t""").fetchall())
    assert got == want


def test_single_wide_shuffle(pages):
    """Exactly two hash exchanges, only ONE corpus-wide: the per-bucket
    window sort. The second is the map-side-combined bucket-count
    aggregate (rows bounded by the bucket space, 16^4), whose prefix-sum
    window runs single-partition over that aggregate and whose result is
    broadcast back — never an SMJ, and fully lazy (no job at build)."""
    out = assign_doc_ids(pages, order_cols=("url", "orig"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 2, plan
    assert "BroadcastHashJoin" in plan, plan
    # the count agg is partial+final (map-side combine before its shuffle)
    assert plan.count("HashAggregate") >= 2, plan


def test_reserved_column_collision_raises(spark):
    df = spark.createDataFrame([(1, "u", "x")],
                               "orig BIGINT, url STRING, __site STRING")
    with pytest.raises(ValueError, match="__site"):
        assign_doc_ids(df, order_cols=("url",))


def test_lazy_construction(pages, monkeypatch):
    """Building the remapped DataFrame must trigger NO action (the offsets
    are a lazy prefix-sum subtree, not a driver collect — an eager build
    would execute the caller's whole upstream pipeline twice)."""
    from pyspark.sql import DataFrame as DF

    def boom(self, *a, **k):
        raise AssertionError("eager action during construction")

    monkeypatch.setattr(DF, "collect", boom)
    monkeypatch.setattr(DF, "count", boom)
    monkeypatch.setattr(DF, "toPandas", boom, raising=False)
    assign_doc_ids(pages, order_cols=("url", "orig"))


def test_url_order_compresses_postings(spark, tmp_path):
    """The point of the operator: same corpus, same index params, ids
    assigned by URL order -> strictly fewer compressed posting bytes than
    arrival-order (site-random) ids. Deterministic fixture (seed 42),
    multi-site topical vocabulary."""
    from light_splade_spark.fixtures import make_web_pages
    from light_splade_spark.index.build import build_index, read_postings

    pages = make_web_pages(spark, n_docs=2000, vocab_size=8000, n_sites=25,
                           site_topic_frac=0.8, n_partitions=8) \
        .select("url", "text")
    arrival = pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
    ordered = assign_doc_ids(pages, order_cols=("url",), out_col="doc_id")

    def bytes_per_posting(df, d):
        build_index(spark, df, str(d), n_buckets=4, n_salts=2,
                    n_shard_groups=1, weight_bits=8)
        r = read_postings(spark, str(d)).agg(
            F.sum(F.length("postings")).alias("b"),
            F.sum("df").alias("p")).collect()[0]
        return r["b"] / r["p"], r["p"]

    a, pa = bytes_per_posting(arrival, tmp_path / "a")
    o, po = bytes_per_posting(ordered, tmp_path / "o")
    assert pa == po                      # same corpus, same postings
    assert o < a, (o, a)                 # the compression win is real


def test_multisite_fixture_shape(spark):
    """n_sites>1: urls carry the site host, sites share topical vocab
    (same-site docs overlap more than cross-site docs), and the default
    single-site path is untouched."""
    from light_splade_spark.fixtures import make_web_pages

    pages = make_web_pages(spark, n_docs=300, vocab_size=5000, n_sites=10,
                           site_topic_frac=0.9, n_partitions=4)
    rows = pages.select("url", "text").collect()
    assert all("/p/" in r["url"] and ".example.com" in r["url"] for r in rows)
    by_site: dict[str, list[set]] = {}
    for r in rows:
        site = r["url"].split("/")[2]
        by_site.setdefault(site, []).append(set(r["text"].split()))
    assert len(by_site) == 10
    sites = sorted(by_site)

    def mean_jacc(sets_a, sets_b):
        vals = [len(x & y) / len(x | y)
                for x in sets_a[:10] for y in sets_b[:10] if x is not y]
        return sum(vals) / len(vals)

    within = mean_jacc(by_site[sites[0]], by_site[sites[0]])
    across = mean_jacc(by_site[sites[0]], by_site[sites[1]])
    assert within > 2 * across, (within, across)

    # default path: single site, example.org urls (byte-compat guard)
    old = make_web_pages(spark, n_docs=5, vocab_size=500)
    assert all(r["url"].startswith("https://example.org/p/")
               for r in old.collect())


def test_retrieval_identical_modulo_remap(spark, tmp_path):
    """Building over url-ordered ids changes doc_id VALUES, never results:
    per query, the multiset of scores is identical, and each scored doc
    maps 1:1 through the id map. (Rank ORDER may differ only inside a
    tie group — ties break by doc_id, which the remap permutes.)"""
    from light_splade_spark.engine import Engine
    from light_splade_spark.fixtures import make_web_pages
    from light_splade_spark.operators.docid import docid_map

    pages = make_web_pages(spark, n_docs=400, vocab_size=600, n_sites=8,
                           site_topic_frac=0.6, n_partitions=8) \
        .select("url", "text")
    arrival = pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
    ordered = assign_doc_ids(pages, order_cols=("url",), out_col="doc_id")
    # old->new map via the arrival index embedded in the url
    m = {int(r["arr"]): int(r["doc_id"]) for r in docid_map(
        ordered.withColumn(
            "arr", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")),
        "arr", out_col="doc_id").collect()}

    qs = [(0, "t00000 t00001"), (1, "t00002"), (2, "t00000 t00017 t00050")]
    ea = Engine.build(spark, arrival, str(tmp_path / "a"), n_buckets=4,
                      n_salts=2, n_shard_groups=1, block_size=32)
    eo = Engine.build(spark, ordered, str(tmp_path / "o"), n_buckets=4,
                      n_salts=2, n_shard_groups=1, block_size=32)
    ra = [(r["qid"], r["doc_id"], r["score"])
          for r in ea.retrieve(qs, top_k=0).collect()]
    ro = {(r["qid"], r["doc_id"], r["score"])
          for r in eo.retrieve(qs, top_k=0).collect()}
    assert ro == {(q, m[d], s) for q, d, s in ra}
