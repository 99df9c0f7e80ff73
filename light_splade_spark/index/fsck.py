"""Index integrity verification (fsck) — operational completeness for the
LSM lifecycle.

An index directory mutates over its life (build → appends → deletes →
compactions → GC), each step committing through one atomic manifest
write. ``fsck_index`` verifies, read-only, that the on-disk state a
reader would consume is internally consistent, and reports findings as
structured rows instead of failing at query time with a decode error.

Checks (each a finding with severity ``error`` | ``warn`` and a stable
``check`` key):

* manifest — loads, schema-compatible, status ``complete``;
* liveness — every live group's partition dir exists; no group is both
  live and retired; physical dirs not in live_groups are reported as
  GC backlog (``warn`` — invisible to readers by construction);
* terms dim — the manifest's terms_dir exists, is readable, and holds
  no duplicate term_id / term;
* postings — readable under the pinned schema; every posting term_id
  resolves in the terms dim (anti-join, distributed);
* decode — a deterministic sample of terms is VByte-decoded through the
  real read path: per term (across live groups), decoded postings must
  equal the stored df sum, doc ids must be UNIQUE across groups (a
  doc re-appended without a prior delete shows up here as a duplicate),
  and the decoded max weight must match max_w (exactly at
  weight_bits=32; bounded within one quantum at weight_bits=8);
* doc_stats — readable, doc_id unique;
* tombstones — readable when present, ids well-formed.

Scale: everything distributed except the bounded finding list and the
term sample; nothing materializes corpus-sized data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from light_splade_spark.index.build import read_postings, terms_path
from light_splade_spark.index.manifest import CorruptIndexError, IndexManifest
from light_splade_spark.index.tombstones import tombstones_df


def _finding(sev: str, check: str, detail: str) -> dict:
    return {"severity": sev, "check": check, "detail": detail}


def fsck_index(spark: SparkSession, index_dir: str,
               sample_terms: int = 64) -> dict:
    """-> {"ok": bool, "findings": [...], "stats": {...}}.

    ``ok`` is True iff no ``error``-severity finding. Read-only; safe to
    run concurrently with readers (it sees one manifest snapshot, like
    any reader)."""
    findings: list[dict] = []
    stats: dict = {}

    try:
        man = IndexManifest.load(index_dir)
    except (FileNotFoundError, CorruptIndexError) as e:
        return {"ok": False, "stats": {},
                "findings": [_finding("error", "manifest", str(e))]}
    stats["status"] = man.status
    stats["scoring"] = man.scoring
    if man.status != "complete":
        findings.append(_finding(
            "error", "manifest",
            f"status is {man.status!r} (an interrupted build/append — "
            f"resume it or rebuild)"))

    # -- liveness bookkeeping ------------------------------------------------
    pdir = os.path.join(index_dir, "postings")
    physical = sorted(
        d.split("=", 1)[1] for d in os.listdir(pdir)
        if d.startswith("shard_group=")) if os.path.isdir(pdir) else []
    live = ([str(g) for g in man.live_groups]
            if man.live_groups is not None else physical)
    stats["live_groups"] = len(live)
    stats["physical_groups"] = len(physical)
    for g in live:
        if g not in physical:
            findings.append(_finding(
                "error", "liveness",
                f"live group {g!r} has no partition dir under postings/ "
                f"(lost data or a foreign manifest)"))
    both = sorted(set(live) & {str(g) for g in man.retired_groups})
    if both:
        findings.append(_finding(
            "error", "liveness",
            f"groups both live and retired: {both} (double-count risk)"))
    backlog = sorted(set(physical) - set(live))
    if backlog:
        findings.append(_finding(
            "warn", "liveness",
            f"{len(backlog)} non-live physical group dir(s) (GC backlog; "
            f"invisible to readers): {backlog[:8]}"))

    # -- terms dim -----------------------------------------------------------
    tpath = terms_path(index_dir)
    if not os.path.isdir(tpath):
        findings.append(_finding(
            "error", "terms",
            f"terms dir {man.terms_dir!r} missing at {tpath}"))
        return {"ok": False, "findings": findings, "stats": stats}
    terms = spark.read.parquet(tpath)
    n_terms = terms.count()
    stats["n_terms"] = n_terms
    for col in ("term_id", "term"):
        dups = (terms.groupBy(col).count().where(F.col("count") > 1)
                .limit(1).count())
        if dups:
            findings.append(_finding(
                "error", "terms", f"duplicate {col} values in terms dim"))

    # -- postings ------------------------------------------------------------
    posts = read_postings(spark, index_dir)
    agg = posts.agg(F.count(F.lit(1)).alias("lists"),
                    F.sum("df").alias("postings")).collect()[0]
    stats["posting_lists"] = int(agg["lists"] or 0)
    stats["postings"] = int(agg["postings"] or 0)
    orphan = (posts.select("term_id").distinct()
              .join(terms.select("term_id"), "term_id", "left_anti")
              .limit(1).count())
    if orphan:
        findings.append(_finding(
            "error", "postings",
            "posting term_id(s) missing from the terms dim "
            "(terms/postings committed from different epochs)"))

    # -- decode sample (the real read path) ----------------------------------
    if stats["posting_lists"]:
        sample = [int(r["term_id"]) for r in
                  posts.select("term_id").distinct()
                  .orderBy(F.pmod(F.xxhash64("term_id"), F.lit(10 ** 9)))
                  .limit(sample_terms).collect()]
        from light_splade_spark.index.join_scorer import decode_postings
        # include_tombstoned: stored df counts deleted docs until a
        # compaction purges them, so the raw stream is what must match
        dec = (decode_postings(spark, index_dir, term_ids=sample,
                               include_tombstoned=True)
               .groupBy("term_id")
               .agg(F.count(F.lit(1)).alias("n_dec"),
                    F.max("w").alias("w_max"),
                    (F.count(F.lit(1))
                     == F.count_distinct("doc_id")).alias("ids_unique")))
        meta = (posts.where(F.col("term_id").isin(sample))
                .groupBy("term_id")
                .agg(F.sum("df").alias("df"), F.max("max_w").alias("max_w")))
        # weight_bits=8 stores block-relative quantized weights, so the
        # decoded max only bounds max_w from below within one quantum;
        # exact equality is a weight_bits=32 invariant
        if man.weight_bits == 32:
            w_bad = F.abs(F.col("w_max") - F.col("max_w")) > 1e-6
        else:
            w_bad = F.col("w_max") > F.col("max_w") + F.lit(1e-6)
        bad = (dec.join(meta, "term_id")
               .where((F.col("n_dec") != F.col("df"))
                      | ~F.col("ids_unique")
                      | w_bad)
               .limit(5).collect())
        stats["decoded_sample_terms"] = len(sample)
        for r in bad:
            findings.append(_finding(
                "error", "decode",
                f"term_id {r['term_id']}: decoded {r['n_dec']} vs df "
                f"{r['df']}, max w {r['w_max']} vs stored {r['max_w']}, "
                f"ids_unique={r['ids_unique']}"))

    # -- doc_stats -----------------------------------------------------------
    ds_path = os.path.join(index_dir, "doc_stats")
    if os.path.isdir(ds_path):
        ds = spark.read.parquet(ds_path)
        n_ds = ds.count()
        stats["doc_stats_rows"] = n_ds
        dups = (ds.groupBy("doc_id").count().where(F.col("count") > 1)
                .limit(1).count())
        if dups:
            findings.append(_finding(
                "error", "doc_stats", "duplicate doc_id in doc_stats"))
    else:
        findings.append(_finding(
            "warn", "doc_stats",
            "no doc_stats dir (target-restriction and compaction need it)"))

    # -- tombstones ----------------------------------------------------------
    tombs = tombstones_df(spark, index_dir)
    if tombs is not None:
        stats["tombstoned"] = tombs.count()
        if "doc_id" not in tombs.columns:
            findings.append(_finding(
                "error", "tombstones", "tombstone files lack doc_id"))

    ok = not any(f["severity"] == "error" for f in findings)
    return {"ok": ok, "findings": findings, "stats": stats}
