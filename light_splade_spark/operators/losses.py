"""Eval-time loss / regularizer aggregations (reference §2.9, A7).

The reference's losses are batch reductions over ALREADY-COMPUTED score
tensors (each ``forward`` takes ``pos_score`` / ``neg_score`` maps); its
trainer's "mean eval loss" (A7) is the mean of those batch losses over an
eval set (``trainer/splade_trainer.py:269-277``). That makes them plain
relational aggregations — given a DataFrame of scored (query, pos, neg)
rows, each loss is a partial+final hash aggregate that scales to any
triplet-set size. No gradients here: these are the *evaluation* values of
the training objectives, useful for monitoring a corpus/model offline at
scale.

Formulas reproduced (file:line = reference):

* pairwise contrastive (``losses/pairwise_contrastive.py:38-59``):
  ``mean(-log_softmax([pos, neg])[0]) = mean(softplus(neg - pos))``.
* margin MSE (``losses/distil_margin_mse.py:42-61``):
  ``mean(((pos - neg) - (t_pos - t_neg))^2)``.
* 2-way KL divergence, batchmean, log_target
  (``losses/distil_kl_div.py:41-56``): per row with student log-softmax
  ``p`` and teacher log-softmax ``t`` over [pos, neg]:
  ``sum_k exp(t_k) * (t_k - p_k)``, averaged over rows.
* in-batch negatives (``losses/in_batch_negatives.py:37-62``): per query
  i in a batch, logits = [pos_ii, neg_i, pos_ij for j != i] (the
  off-diagonal trick on the (bs, bs) query x positive matrix);
  ``mean(logsumexp(logits) - pos_ii)``; batches averaged (A7).
* FLOPS regularizer (``regularizer/flops.py:34-44``, Eq 4 of the FLOPS
  paper): ``sum_term (mean_batch |w|)^2`` — the batch mean counts EVERY
  row (docs without the term contribute 0), so it is sum(|w|)/N.
* combined (``trainer/splade_trainer.py:347-365``):
  ``sum(losses) + lambda_q * flops(q) + lambda_d * (flops(pos) +
  flops(neg)) / 2``.

Numerics: softplus/logsumexp use the max-shifted stable forms; outputs are
rounded to 4 decimals like the reference's sparse-weight display rounding
(``models/splade.py:174``) so cross-engine (Spark vs DuckDB oracle)
hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND = 4


def _softplus(x):
    # ln(1 + exp(x)) without overflow: max(x, 0) + log1p(exp(-|x|))
    return F.greatest(x, F.lit(0.0)) + F.log1p(F.exp(-F.abs(x)))


def pairwise_contrastive_loss(scored: DataFrame) -> DataFrame:
    """scored(pos_score, neg_score) -> 1 row (loss DOUBLE).

    mean over rows of -log_softmax([pos, neg])[0]
    (reference losses/pairwise_contrastive.py:38-59).
    """
    x = F.col("neg_score") - F.col("pos_score")
    return scored.agg(
        F.round(F.avg(_softplus(x)), ROUND).alias("loss"))


def margin_mse_loss(scored: DataFrame) -> DataFrame:
    """scored(pos_score, neg_score, teacher_pos_score, teacher_neg_score)
    -> 1 row (loss). mean((student_margin - teacher_margin)^2)
    (reference losses/distil_margin_mse.py:42-61)."""
    m = (F.col("pos_score") - F.col("neg_score")) \
        - (F.col("teacher_pos_score") - F.col("teacher_neg_score"))
    return scored.agg(F.round(F.avg(m * m), ROUND).alias("loss"))


def kldiv_loss(scored: DataFrame) -> DataFrame:
    """2-way KLDivLoss(batchmean, log_target=True) over [pos, neg]
    (reference losses/distil_kl_div.py:41-56)."""

    def log_softmax2(a, b):
        # log_softmax of a within the pair (a, b), max-shifted
        m = F.greatest(a, b)
        lse = m + F.log(F.exp(a - m) + F.exp(b - m))
        return a - lse

    sp = log_softmax2(F.col("pos_score"), F.col("neg_score"))
    sn = log_softmax2(F.col("neg_score"), F.col("pos_score"))
    tp = log_softmax2(F.col("teacher_pos_score"), F.col("teacher_neg_score"))
    tn = log_softmax2(F.col("teacher_neg_score"), F.col("teacher_pos_score"))
    row_kl = F.exp(tp) * (tp - sp) + F.exp(tn) * (tn - sn)
    return scored.agg(F.round(F.avg(row_kl), ROUND).alias("loss"))


def in_batch_negatives_loss(cross: DataFrame, scored: DataFrame) -> DataFrame:
    """In-batch-negatives loss with the reference's off-diagonal semantics
    (losses/in_batch_negatives.py:37-62), distributed by batch.

    ``cross``: (batch_id, qid, j, score) — the dense (bs, bs) query x
    positive score matrix of each batch as rows (``j`` = the qid whose
    positive doc was scored; the diagonal ``j == qid`` is pos_ii; pairs
    with no term overlap must be present with score 0, as a dense tensor
    would have them).
    ``scored``: (batch_id, qid, neg_score) — each query's own negative.

    Per query: logsumexp over [pos_ii, neg_i, all pos_ij (j != i)] minus
    pos_ii; per batch: mean over queries; overall: mean over batches (the
    trainer's A7 mean-of-batch-losses, trainer/splade_trainer.py:269-277).
    Every stage is a hash aggregate keyed by (batch_id, qid) then batch_id
    — scales to any number of batches; bs itself is the training-config
    constant (24 in the reference), so the per-batch cross matrix is tiny.
    """
    logits = cross.select("batch_id", "qid", "score").unionByName(
        scored.select("batch_id", "qid",
                      F.col("neg_score").alias("score")))
    # two-pass stable logsumexp: max per (batch, qid), then sum of shifted
    # exps — expressed as two aggregations to stay in whole-stage codegen
    mx = logits.groupBy("batch_id", "qid").agg(F.max("score").alias("m"))
    lse = (logits.join(mx, ["batch_id", "qid"])
           .groupBy("batch_id", "qid", "m")
           .agg(F.log(F.sum(F.exp(F.col("score") - F.col("m")))).alias("l"))
           .select("batch_id", "qid",
                   (F.col("m") + F.col("l")).alias("lse")))
    diag = cross.where(F.col("j") == F.col("qid")) \
        .select("batch_id", "qid", F.col("score").alias("pos_ii"))
    per_query = lse.join(diag, ["batch_id", "qid"]).select(
        "batch_id", (F.col("lse") - F.col("pos_ii")).alias("q_loss"))
    per_batch = per_query.groupBy("batch_id").agg(
        F.avg("q_loss").alias("b_loss"))
    return per_batch.agg(F.round(F.avg("b_loss"), ROUND).alias("loss"))


def flops_regularizer(expansion: DataFrame, n_batch: int,
                      weight_col: str = "weight") -> DataFrame:
    """FLOPS penalty over a batch of N sparse vectors given their exploded
    (id, term, weight) rows: sum_term (sum(|w|) / N)^2 — rows absent from
    a vector contribute 0 to the batch mean, so the mean divides by the
    BATCH size, not the term's df (reference regularizer/flops.py:34-44).
    """
    per_term = expansion.groupBy("term").agg(
        F.pow(F.sum(F.abs(F.col(weight_col))) / F.lit(float(n_batch)),
              F.lit(2.0)).alias("sq"))
    return per_term.agg(F.round(F.sum("sq"), ROUND).alias("flops"))


def l1_regularizer(expansion: DataFrame, n_batch: int,
                   weight_col: str = "weight") -> DataFrame:
    """Mean L1 norm across the batch: mean_rows(sum_term |w|) =
    sum(|w|) / N over the exploded rows (reference regularizer/l1.py:28-38
    — rows are dense (bs, V), so vectors with no terms still count in the
    denominator)."""
    return expansion.agg(
        F.round(F.sum(F.abs(F.col(weight_col))) / F.lit(float(n_batch)),
                ROUND).alias("l1"))


def quadratic_lambda(step: int, initial_lambda: float,
                     warmup_steps: int) -> float:
    """The quadratic lambda warmup schedule (reference
    regularizer/regularizer_scheduler.py:44-75): lambda ramps as
    (step / T)^2, capped at initial_lambda once step >= T. A pure scalar —
    exposed so combined_loss callers can weight regularizers per step the
    way the trainer does. ``warmup_steps <= 0`` means no warmup: lambda is
    at full strength from step 0 (the cap semantics, without the division
    the naive formula would attempt)."""
    if warmup_steps <= 0 or step >= warmup_steps:
        return initial_lambda
    return initial_lambda * ((step / warmup_steps) ** 2)


def combined_loss(losses: list[DataFrame], flops_q: DataFrame,
                  flops_pos: DataFrame, flops_neg: DataFrame,
                  lambda_q: float = 3e-4,
                  lambda_d: float = 1e-4) -> DataFrame:
    """total = sum(losses) + lambda_q * flops(q) + lambda_d *
    (flops(pos) + flops(neg)) / 2 (reference trainer/splade_trainer.py:
    347-365, lambdas from config/training/splade_training_distill.yaml).
    Inputs are the 1-row outputs of the functions above; the combination
    is a driver-free crossJoin of scalars. An empty ``losses`` list is
    valid (regularizers only): the fold seeds from the first flops side."""
    out = flops_q.select(F.col("flops").alias("_fq"))
    for i, df in enumerate(losses):
        out = out.crossJoin(df.select(F.col("loss").alias(f"_l{i}")))
    out = (out
           .crossJoin(flops_pos.select(F.col("flops").alias("_fp")))
           .crossJoin(flops_neg.select(F.col("flops").alias("_fn"))))
    total = sum((F.col(f"_l{i}") for i in range(len(losses))),
                F.lit(0.0)) \
        + F.lit(lambda_q) * F.col("_fq") \
        + F.lit(lambda_d) * (F.col("_fp") + F.col("_fn")) / 2.0
    return out.select(F.round(total, ROUND).alias("loss"))
