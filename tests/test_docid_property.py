"""Property test: assign_doc_ids equals the single ANSI window, always.

Hypothesis drives random (site, key, orig) corpora — duplicate sites,
duplicate keys across sites, unicode-ish keys — and asserts the
distributed bucketed construction matches DuckDB's
``row_number() OVER (ORDER BY substr(md5(site),1,4), site, key, orig)``
exactly. ``site_col`` is passed explicitly so the property isolates the
assignment construction (registrable_domain has its own goldens in
test_urls)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from light_splade_spark.operators.docid import assign_doc_ids

_site = st.sampled_from(["a.com", "b.co.uk", "z.example.org", "м.рф", ""])
_key = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=382),
    min_size=0, max_size=12)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(_site, _key), min_size=1, max_size=60))
def test_assignment_equals_global_window(spark, rows_in):
    rows = [(i, s, k) for i, (s, k) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "orig BIGINT, site STRING, key STRING")
    got = {r["orig"]: r["ordered_id"]
           for r in assign_doc_ids(df, order_cols=("key", "orig"),
                                   site_col="site").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (orig BIGINT, site VARCHAR, key VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(con.sql("""
        SELECT orig, row_number() OVER (
            ORDER BY substr(md5(site), 1, 4), site, key, orig) - 1
        FROM t""").fetchall())
    con.close()
    assert got == want
