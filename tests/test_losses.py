"""Eval-time loss aggregations vs a numpy mirror of the reference formulas.

The mirrors below transcribe the reference's tensor reductions
(losses/pairwise_contrastive.py:38-59, distil_margin_mse.py:42-61,
distil_kl_div.py:41-56, in_batch_negatives.py:37-62,
regularizer/flops.py:34-44, trainer/splade_trainer.py:347-365) in plain
numpy; the Spark operators must reproduce them to 4 decimals on arbitrary
scores (hypothesis) and on a structured batch fixture.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from light_splade_spark.operators import losses as L

SCORES = st.lists(
    st.tuples(st.floats(-30, 60), st.floats(-30, 60),
              st.floats(0, 12), st.floats(0, 12)),
    min_size=1, max_size=24)


def _np_pairwise(ps, ns):
    x = np.asarray(ns) - np.asarray(ps)
    return float(np.mean(np.maximum(x, 0) + np.log1p(np.exp(-np.abs(x)))))


def _np_margin_mse(ps, ns, tp, tn):
    m = (np.asarray(ps) - np.asarray(ns)) - (np.asarray(tp) - np.asarray(tn))
    return float(np.mean(m * m))


def _np_log_softmax2(a, b):
    m = np.maximum(a, b)
    lse = m + np.log(np.exp(a - m) + np.exp(b - m))
    return a - lse


def _np_kldiv(ps, ns, tp, tn):
    ps, ns, tp, tn = map(np.asarray, (ps, ns, tp, tn))
    sp, sn = _np_log_softmax2(ps, ns), _np_log_softmax2(ns, ps)
    tpl, tnl = _np_log_softmax2(tp, tn), _np_log_softmax2(tn, tp)
    return float(np.mean(np.exp(tpl) * (tpl - sp) + np.exp(tnl) * (tnl - sn)))


def _scored_df(spark, rows):
    return spark.createDataFrame(
        [(i, float(p), float(n), float(a), float(b))
         for i, (p, n, a, b) in enumerate(rows)],
        "qid BIGINT, pos_score DOUBLE, neg_score DOUBLE, "
        "teacher_pos_score DOUBLE, teacher_neg_score DOUBLE")


@pytest.fixture(scope="module")
def spark_local(spark):
    return spark


@settings(max_examples=6, deadline=None)
@given(SCORES)
def test_rowwise_losses_match_numpy(spark_local, rows):
    df = _scored_df(spark_local, rows)
    ps, ns, tp, tn = (list(x) for x in zip(*rows))
    got = (L.pairwise_contrastive_loss(df)
           .select(F.col("loss").alias("pw"))
           .crossJoin(L.margin_mse_loss(df)
                      .select(F.col("loss").alias("mm")))
           .crossJoin(L.kldiv_loss(df)
                      .select(F.col("loss").alias("kl")))
           .collect()[0])
    got_pw, got_mm, got_kl = got["pw"], got["mm"], got["kl"]
    assert got_pw == pytest.approx(round(_np_pairwise(ps, ns), 4), abs=1e-4)
    assert got_mm == pytest.approx(round(_np_margin_mse(ps, ns, tp, tn), 4),
                                   abs=1e-4)
    assert got_kl == pytest.approx(round(_np_kldiv(ps, ns, tp, tn), 4),
                                   abs=1e-4)


def test_in_batch_negatives_matches_numpy(spark_local):
    """Structured fixture: 2 batches of bs=4, dense cross matrices, the
    off-diagonal trick verified against the literal tensor construction."""
    rng = np.random.default_rng(7)
    bs, n_batches = 4, 2
    total = 0.0
    cross_rows, neg_rows = [], []
    for b in range(n_batches):
        cross = rng.uniform(-5, 15, size=(bs, bs))
        neg = rng.uniform(-5, 15, size=bs)
        # literal reference construction (in_batch_negatives.py:57-60):
        # logits_i = [cross_ii, neg_i, off-diagonal row i]
        batch_loss = 0.0
        for i in range(bs):
            off = np.delete(cross[i], i)
            logits = np.concatenate(([cross[i, i]], [neg[i]], off))
            m = logits.max()
            lse = m + np.log(np.exp(logits - m).sum())
            batch_loss += lse - cross[i, i]
        total += batch_loss / bs
        for i in range(bs):
            qid = b * bs + i
            neg_rows.append((b, qid, float(neg[i])))
            for j in range(bs):
                cross_rows.append((b, qid, b * bs + j, float(cross[i, j])))
    want = round(total / n_batches, 4)

    cross_df = spark_local.createDataFrame(
        cross_rows, "batch_id BIGINT, qid BIGINT, j BIGINT, score DOUBLE")
    neg_df = spark_local.createDataFrame(
        neg_rows, "batch_id BIGINT, qid BIGINT, neg_score DOUBLE")
    got = L.in_batch_negatives_loss(cross_df, neg_df).collect()[0]["loss"]
    assert got == pytest.approx(want, abs=1e-4)


def test_flops_and_combined(spark_local):
    """FLOPS divides by the BATCH size (absent terms count as 0 in the
    batch mean — regularizer/flops.py:34-44), and combined applies the
    trainer's lambda weighting (splade_trainer.py:347-365)."""
    rows = [(0, "a", 1.0), (0, "b", -2.0), (1, "a", 3.0)]
    df = spark_local.createDataFrame(
        rows, "doc_id BIGINT, term STRING, weight DOUBLE")
    n = 4  # batch larger than the docs present: zeros still dilute means
    got = L.flops_regularizer(df, n_batch=n).collect()[0]["flops"]
    want = round((4.0 / n) ** 2 + (2.0 / n) ** 2, 4)
    assert got == pytest.approx(want, abs=1e-4)

    got_l1 = L.l1_regularizer(df, n_batch=n).collect()[0]["l1"]
    assert got_l1 == pytest.approx(round((1.0 + 2.0 + 3.0) / n, 4), abs=1e-6)

    # quadratic warmup: ramps as (step/T)^2, capped at initial_lambda
    # (regularizer_scheduler.py:44-75)
    assert L.quadratic_lambda(0, 3e-4, 100) == 0.0
    assert L.quadratic_lambda(50, 3e-4, 100) == pytest.approx(3e-4 * 0.25)
    assert L.quadratic_lambda(100, 3e-4, 100) == pytest.approx(3e-4)
    assert L.quadratic_lambda(250, 3e-4, 100) == pytest.approx(3e-4)

    one = spark_local.createDataFrame([(1.5,)], "loss DOUBLE")
    two = spark_local.createDataFrame([(0.5,)], "loss DOUBLE")
    fl = spark_local.createDataFrame([(2.0,)], "flops DOUBLE")
    got_c = L.combined_loss([one, two], fl, fl, fl,
                            lambda_q=0.1, lambda_d=0.01) \
        .collect()[0]["loss"]
    assert got_c == pytest.approx(
        round(1.5 + 0.5 + 0.1 * 2.0 + 0.01 * (2.0 + 2.0) / 2, 4), abs=1e-6)

    # empty losses list (regularizers only) is valid — ADVICE r4
    got_e = L.combined_loss([], fl, fl, fl, lambda_q=0.1, lambda_d=0.01) \
        .collect()[0]["loss"]
    assert got_e == pytest.approx(
        round(0.1 * 2.0 + 0.01 * (2.0 + 2.0) / 2, 4), abs=1e-6)
