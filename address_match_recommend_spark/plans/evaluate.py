"""Evaluation — pairwise F1 on labeled pairs at the shared blocking key.

The north rule's correctness gate: the engine must reproduce the
reference's matcher outcomes with pairwise F1 ≥ 0.99 on labeled pairs
evaluated at the same blocking key. A pair is predicted "match" iff both
conversations land in the same entity cluster (transitive closure), the
graft analog of the reference's decision "is this address the same place"
(top-match with similarity > 0, /root/reference/models/query.go:13-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def predict_pairs(labeled_pairs: DataFrame, clusters: DataFrame) -> DataFrame:
    """labeled_pairs + (entity_a, entity_b, predicted boolean)."""
    ca = clusters.select(
        F.col("conv_id").alias("conv_id_a"), F.col("entity_id").alias("entity_a")
    )
    cb = clusters.select(
        F.col("conv_id").alias("conv_id_b"), F.col("entity_id").alias("entity_b")
    )
    return (
        labeled_pairs.join(ca, "conv_id_a", "left")
        .join(cb, "conv_id_b", "left")
        .withColumn(
            "predicted",
            (F.col("entity_a").isNotNull())
            & (F.col("entity_a") == F.col("entity_b")),
        )
    )


def pairwise_f1(
    labeled_pairs: DataFrame,
    clusters: DataFrame,
    by_blocking_key: bool = False,
    max_keys: int = 100,
) -> dict:
    """{'tp','fp','fn','tn','precision','recall','f1'} (plus per-key rows
    under 'by_key' when by_blocking_key).

    ``by_key`` returns the ``max_keys`` WORST keys by per-key F1 (ties by
    key), each row carrying (blocking_key, tp, fp, fn, f1). The per-key
    aggregate, F1, sort, and limit all run distributed — the driver
    collects at most ``max_keys`` rows, so a corpus with 10^9 blocking
    keys never collects one row per key (VERDICT r4 nit (b)). The
    worst-key view is the diagnostic one: a healthy run's tail is where
    blocking or scoring regressions surface first."""
    pred = predict_pairs(labeled_pairs, clusters)
    agg = pred.agg(
        F.sum((F.col("label") & F.col("predicted")).cast("long")).alias("tp"),
        F.sum((~F.col("label") & F.col("predicted")).cast("long")).alias("fp"),
        F.sum((F.col("label") & ~F.col("predicted")).cast("long")).alias("fn"),
        F.sum((~F.col("label") & ~F.col("predicted")).cast("long")).alias("tn"),
    ).collect()[0]
    tp, fp, fn, tn = (int(agg[k] or 0) for k in ("tp", "fp", "fn", "tn"))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    out = {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }
    if by_blocking_key:
        per_key = (
            pred.groupBy("blocking_key")
            .agg(
                F.sum((F.col("label") & F.col("predicted")).cast("long")).alias("tp"),
                F.sum((~F.col("label") & F.col("predicted")).cast("long")).alias("fp"),
                F.sum((F.col("label") & ~F.col("predicted")).cast("long")).alias("fn"),
            )
            .withColumn(
                "f1",
                F.when(
                    (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
                    2 * F.col("tp")
                    / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
                ).otherwise(F.lit(1.0)),  # no positives, no predictions
            )
            .orderBy(F.asc("f1"), F.asc("blocking_key"))
            .limit(max_keys)
        )
        out["by_key"] = [r.asDict() for r in per_key.collect()]
    return out
