"""Round-14 second wave: the learned gate ensemble gets the full
trained-asset lifecycle its inputs already have —

- ``gate_ensemble_heldout_eval`` — the no-leakage evaluation every
  deployed filter needs before its threshold is trusted (the
  ``embedding_probe_heldout_eval`` convention): train the 4-weight
  combiner on the 80% id-hash slice of the shared gated population,
  gate each split at its OWN top-10% percentile, report the
  (split, y, kept) contingency in exact integers.
- ``gate_ensemble_unlearn`` — exact machine unlearning for the
  combiner (the ``embedding_probe_unlearn`` result, d=4): the Gram /
  moment statistics are int64 SUMS over population rows, so erased
  docs' contributions subtract out exactly and the re-fit weights are
  BIT-FOR-BIT the survivors-only retrain — which is what the oracle
  computes from scratch.  The served view is the survivors'
  calibration ladder under the corrected weights.

Both share :func:`~ffiec_pq_spark.queries.round14._ens_population`
(the resident gated population + quantized features), so the whole
ensemble family — calibration, eval, erasure — scores one relation
and cannot drift."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.resident import register_clear_hook
from ffiec_pq_spark.session import load_table
from ffiec_pq_spark.queries.round14 import (
    _ENS_DIM,
    _ENS_PCTS,
    _ens_ladder,
    _ens_population,
    _ens_score_col,
    _ens_stats,
    _ens_xq_sql,
)

_ENS_HELDOUT_PRED = "doc_id % 5 <> 0"  # the probe family's 80% slice
_ENS_FORGET_MOD = 9
_ENS_FORGET_SLOT = 4  # the shared unlearn slot


def _ens_gd_ctes(train_pred: str = "") -> list:
    """The ensemble's unrolled integer-GD CTE chain over the shared
    population (``_pop_ctes`` + quantized features), parameterized by
    a BARE training predicate — shared by the three family oracles so
    the recursion is written once.  Returns the CTE list through
    ``escored`` (doc_id, y, ens_micro over the FULL population)."""
    from ffiec_pq_spark.operators.linear_probe import (
        PROBE_D_PER_N,
        PROBE_ITERS,
        PROBE_SW,
        PROBE_SX,
    )
    from ffiec_pq_spark.queries.round13c import _pop_ctes

    ctes = _pop_ctes()
    idx = ", ".join(str(i) for i in range(_ENS_DIM))
    feats = ", ".join(_ens_xq_sql())
    ctes.append(
        """lab AS (
      SELECT vec_id AS doc_id,
             CASE WHEN coalesce(label, 0) = 0 THEN 1 ELSE 0 END AS y
      FROM embeddings
    )"""
    )
    # MATERIALIZED: every reference would otherwise re-inline the full
    # pop chain (probe GD + KN3 estimation) — the round-14 lesson
    ctes.append(
        f"""fx AS MATERIALIZED (
      SELECT doc_id, unnest([{idx}]) AS i, unnest([{feats}]) AS xq
      FROM pop
    )"""
    )
    tr_where = f" WHERE {train_pred}" if train_pred else ""
    ctes.append(f"trf AS (SELECT * FROM fx{tr_where})")
    ctes.append(
        f"nn2 AS (SELECT count(*) // {_ENS_DIM} AS n FROM trf)"
    )
    ctes.append(
        """gram2 AS (
      SELECT a.i AS i, b.i AS j, sum(a.xq * b.xq) AS aa
      FROM trf a JOIN trf b USING (doc_id) GROUP BY 1, 2
    )"""
    )
    ctes.append(
        f"""bv2 AS (
      SELECT f.i, sum(f.xq * l.y) * {PROBE_SX * PROBE_SW} AS bs
      FROM trf f JOIN lab l USING (doc_id) GROUP BY f.i
    )"""
    )
    ctes.append("ew0 AS (SELECT i, CAST(0 AS BIGINT) AS v FROM bv2)")
    dd = f"(nn2.n * {PROBE_D_PER_N})"
    for t in range(PROBE_ITERS):
        ctes.append(
            f"""eg{t} AS (
      SELECT gr.i AS i, sum(gr.aa * w.v) - bv2.bs AS gg
      FROM gram2 gr JOIN ew{t} w ON w.i = gr.j JOIN bv2 ON bv2.i = gr.i
      GROUP BY gr.i, bv2.bs
    )"""
        )
        ctes.append(
            f"""ew{t + 1} AS (
      SELECT g.i,
             w.v - (CASE WHEN g.gg < 0 THEN -((-g.gg) // {dd})
                         ELSE g.gg // {dd} END) AS v
      FROM eg{t} g JOIN ew{t} w USING (i) CROSS JOIN nn2
    )"""
        )
    ctes.append(
        f"""escored AS (
      SELECT f.doc_id, l.y,
             CAST(sum(f.xq * w.v) AS BIGINT) AS ens_micro
      FROM fx f JOIN ew{PROBE_ITERS} w USING (i)
      JOIN lab l USING (doc_id)
      GROUP BY f.doc_id, l.y
    )"""
    )
    return ctes


def _ens_heldout_sql() -> str:
    ctes = _ens_gd_ctes(train_pred=_ENS_HELDOUT_PRED)
    ctes.append(
        f"""eranked AS (
      SELECT CASE WHEN {_ENS_HELDOUT_PRED} THEN 'train'
                  ELSE 'heldout' END AS split,
             y, ens_micro,
             row_number() OVER (
               PARTITION BY CASE WHEN {_ENS_HELDOUT_PRED} THEN 'train'
                                 ELSE 'heldout' END
               ORDER BY ens_micro DESC, doc_id ASC
             ) AS rank,
             count(*) OVER (
               PARTITION BY CASE WHEN {_ENS_HELDOUT_PRED} THEN 'train'
                                 ELSE 'heldout' END
             ) AS n_split
      FROM escored
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT split, y,
           (rank <= greatest(n_split // 10, 1)) AS kept,
           CAST(count(*) AS BIGINT) AS n
    FROM eranked
    GROUP BY split, y, kept
    """
    )


@register(
    "gate_ensemble_heldout_eval",
    _ens_heldout_sql(),
    tags=["quality", "curation", "iterative", "eval"],
)
def gate_ensemble_heldout_eval(spark, sf_dir):
    """No-leakage evaluation of the learned gate ensemble: train the
    4-weight integer combiner on the 80% id-hash slice of the shared
    gated population, score BOTH splits, gate each at its own top-10%
    percentile, and report the (split, y, kept) contingency — whether
    the learned combination's precision survives off the training
    slice is the number that decides if it ships (the
    ``embedding_probe_heldout_eval`` discipline, one model up).

    Cross-engine exactness: the probe-family integer recursion over
    the pinned quantized features (the oracle replays it as unrolled
    CTEs, trained on the filtered slice); ranks are total orders with
    id tiebreaks per split; cutoffs are integer floor division.

    Plan: one 4-row Gram aggregation over the TRAIN slice of the
    resident gated population + driver GD; one shuffle-free scoring
    projection over the full population; a split-keyed
    :func:`distributed_rank` (never one reducer); a 2-row split-size
    broadcast; a <= 8-group contingency rollup."""
    from ffiec_pq_spark.operators.linear_probe import probe_fit_int
    from ffiec_pq_spark.operators.windows import distributed_rank

    base = _ens_population(spark, sf_dir)
    is_train = F.col("doc_id") % 5 != 0
    key = os.path.abspath(sf_dir) + "#train80"
    if key not in _ENS_SPLIT_MODELS:
        _ENS_SPLIT_MODELS[key] = probe_fit_int(
            *_ens_stats(base.filter(is_train))
        )
    scored = base.select(
        "doc_id",
        "y",
        _ens_score_col(_ENS_SPLIT_MODELS[key]).alias("ens_micro"),
        F.when(is_train, F.lit("train"))
        .otherwise(F.lit("heldout"))
        .alias("split"),
    )
    n_split = scored.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_split")
    )
    ranked = distributed_rank(
        scored,
        [F.col("ens_micro").desc(), F.col("doc_id").asc()],
        part_cols=("split",),
        rank_col="rank",
    )
    return (
        ranked.join(F.broadcast(n_split), "split")
        .select(
            "split",
            "y",
            (
                F.col("rank")
                <= F.greatest(
                    F.expr("n_split div 10"), F.lit(1).cast("long")
                )
            ).alias("kept"),
        )
        .groupBy("split", "y", "kept")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# Trained 80%-slice combiners per dataset (the _PROBE_MODELS "#train80"
# convention) and the full-population sufficient statistics the
# unlearn path subtracts from.
_ENS_SPLIT_MODELS: dict = {}
_ENS_STATS_MEMO: dict = {}


def clear_ensemble_lifecycle_state() -> None:
    _ENS_SPLIT_MODELS.clear()
    _ENS_STATS_MEMO.clear()


register_clear_hook(
    "ensemble_lifecycle_state",
    clear_ensemble_lifecycle_state,
    state=_ENS_STATS_MEMO,
)


def _ens_unlearn_sql() -> str:
    """Ground truth: from-scratch training AND scoring on the
    SURVIVORS only, swept through the standard ladder."""
    surv = f"NOT (doc_id % {_ENS_FORGET_MOD} = {_ENS_FORGET_SLOT})"
    ctes = _ens_gd_ctes(train_pred=surv)
    ctes.append(
        f"""sscored AS (
      SELECT doc_id, y, ens_micro FROM escored WHERE {surv}
    )"""
    )
    ctes.append(
        """sranked AS (
      SELECT doc_id, y, ens_micro,
             row_number() OVER (
               ORDER BY ens_micro DESC, doc_id ASC
             ) AS rank
      FROM sscored
    )"""
    )
    pcts = ", ".join(str(p) for p in _ENS_PCTS)
    ctes.append(
        f"erung AS (SELECT unnest(CAST([{pcts}] AS BIGINT[])) AS thr_pct)"
    )
    ctes.append(
        r"""etok AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tok
      FROM documents
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT thr_pct,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(sum(CASE WHEN kept THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS keep_rate,
           CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST(sum(CASE WHEN kept AND y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS pos_kept,
           CASE WHEN sum(CASE WHEN kept THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE round(
                  sum(CASE WHEN kept AND y = 1 THEN 1 ELSE 0 END)
                  / CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END)
                         AS DOUBLE), 6)
           END AS pos_precision
    FROM (
      SELECT r.thr_pct, ra.y, t.n_tok,
             ra.rank <= greatest((cnt.n * r.thr_pct) // 100, 1) AS kept
      FROM sranked ra CROSS JOIN erung r
      CROSS JOIN (SELECT count(*) AS n FROM sscored) cnt
      LEFT JOIN etok t ON t.doc_id = ra.doc_id
    )
    GROUP BY thr_pct
    """
    )


@register(
    "gate_ensemble_unlearn",
    _ens_unlearn_sql(),
    tags=["quality", "curation", "iterative", "privacy"],
)
def gate_ensemble_unlearn(spark, sf_dir):
    """EXACT machine unlearning for the learned gate ensemble — the
    newest trained asset joins the lifecycle every other one has
    (probe / KN / scorecard / fused-retrieval erasure): when documents
    are erased, the combiner must forget them EXACTLY.

    Linear models admit exact unlearning through sufficient statistics
    (Guo et al. 2020, "Certified Data Removal", and this engine's
    integer-GD refinement: bit-for-bit, not up-to-float-error): the
    4x4 Gram and moment sums subtract the erased docs' contributions —

        A' = A − Σ_del xq xqᵀ,  B' = B − Σ_del xq·y,  n' = n − |del|

    — the GD re-fit on 128 bytes of corrected state is driver-side,
    and the served view is the SURVIVORS' calibration ladder under the
    corrected weights.  The oracle trains and scores from scratch on
    the survivors; the hash must match.

    Plan: the resident full-population statistics (one 4-row Gram
    aggregation, memoized) minus one Gram aggregation over the ERASED
    slice only (cost ∝ deletion, never the population); scoring and
    the ladder are the shared :func:`_ens_ladder` construction over
    the survivor slice."""
    from ffiec_pq_spark.operators.linear_probe import probe_fit_int

    base = _ens_population(spark, sf_dir)
    erased = F.col("doc_id") % _ENS_FORGET_MOD == _ENS_FORGET_SLOT
    key = os.path.abspath(sf_dir)
    if key not in _ENS_STATS_MEMO:
        _ENS_STATS_MEMO[key] = _ens_stats(base)
    a, b, n = _ENS_STATS_MEMO[key]
    da, db, dn = _ens_stats(base.filter(erased))
    a2 = [
        [a[i][j] - da[i][j] for j in range(_ENS_DIM)]
        for i in range(_ENS_DIM)
    ]
    b2 = [b[i] - db[i] for i in range(_ENS_DIM)]
    w2 = probe_fit_int(a2, b2, n - dn)
    scored = base.filter(~erased).select(
        "doc_id", "y", _ens_score_col(w2).alias("ens_micro")
    )
    return _ens_ladder(spark, sf_dir, scored)
