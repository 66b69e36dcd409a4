"""Stage 3 — corpus statistics: document frequency, IDF, TF-IDF vectors.

Analog of the reference's ``statInverseDocRefers`` (document-frequency
count, /root/reference/core/similarity.go:233-255) and IDF formula
(:342-364). We implement the *documented* math — true float division,
``idf = max(ln(N/(df+1)), 0)`` — not the reference's integer-division quirk
(:355, SURVEY §2.9); numeric/ANSI tokens get the reference's fixed idf=2.0
and unseen tokens MissingIdf=4.0 (:19) via :func:`idf_for_tokens`.

Scale notes:
- df computation is distinct + groupBy — two shuffles on (conv_id, token)
  then (token), both map-side combined.
- The IDF table is O(vocab) rows — broadcast to executors (north rule:
  "broadcast of the IDF dictionary"), never shuffled against the corpus.
- TF-IDF vectors are carried as ``map<token,double>`` per conversation so
  the pair scorer joins once on conv_id instead of re-shuffling exploded
  tokens per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import PipelineConfig

#: reference FixedIdf for pure-ASCII/numeric terms
#: (/root/reference/core/similarity.go:18, utils IsAnsiChars/IsNumericChars)
ANSI_NUMERIC_IDF = 2.0


def document_frequency(tokens: DataFrame) -> DataFrame:
    """(token, df) — number of distinct conversations containing token."""
    return (
        tokens.select("conv_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def idf_table(
    tokens: DataFrame,
    n_docs: int,
    cfg: PipelineConfig | None = None,
    reference_parity: bool = False,
) -> DataFrame:
    """(token, df, idf).

    ``reference_parity=True`` reproduces the reference's fixed idf=2.0 for
    pure-alpha/numeric tokens (/root/reference/core/similarity.go:356-360);
    the default keeps the pure corpus statistic, which is strictly more
    faithful to the documented TF-IDF semantics (README.md:77-83).
    """
    cfg = cfg or PipelineConfig()
    idf = F.greatest(
        F.log(F.lit(float(n_docs)) / (F.col("df") + F.lit(1.0))),
        F.lit(float(cfg.min_idf)),
    )
    if reference_parity:
        idf = F.when(
            F.col("token").rlike(r"^[0-9]+$|^[a-z]+$"), F.lit(ANSI_NUMERIC_IDF)
        ).otherwise(idf)
    return document_frequency(tokens).withColumn("idf", idf)


def tfidf_vectors(
    tokens: DataFrame,
    idf: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """(conv_id, vec map<string,double>, norm double, n_tokens int).

    Weight = tf · idf with tf = count/doc_len (cfg.use_tf), or idf-only
    (reference parity: the reference never computes true TF — SURVEY §2.4
    A6, /root/reference/core/similarity.go:494). ``norm`` is the L2 norm,
    precomputed once so the pair scorer's cosine is a pure map-merge.

    The idf join is an equi-join against an O(vocab)-row table →
    broadcast hash join (north rule).

    If ``tokens`` carries a ``boost`` column (structure-aware mode,
    operators/structure.boost_weights — the reference's C14: weight =
    idf·boost, /root/reference/core/similarity.go:494,513-516), the
    weight is further multiplied by it. The boost is constant per
    (conv_id, token) so max() under the groupBy is exact.
    """
    cfg = cfg or PipelineConfig()
    has_boost = "boost" in tokens.columns
    aggs = [F.count(F.lit(1)).alias("tf_raw")]
    if has_boost:
        aggs.append(F.max("boost").alias("boost"))
    # ONE shuffle for the whole stage: hash-partitioning by conv_id
    # satisfies the clustering requirements of every downstream operator
    # — the (conv_id, token) aggregate (conv_id is a subset of its keys),
    # the doc_len window, and the final per-conversation map build — so
    # Catalyst plans a single exchange and fuses the rest partition-
    # local. Without it the token stream (the largest intermediate at
    # production scale: ~10² tokens per turn) shuffles twice: once on
    # (conv_id, token) for the count, once on conv_id for the window.
    # The trade: this exchange moves raw token rows without map-side
    # combine, but tf is ≈1 for almost all (conv, token) pairs, so the
    # combined and raw volumes are nearly identical.
    counts = tokens.repartition("conv_id").groupBy("conv_id", "token").agg(*aggs)
    # The IDF broadcast is a north-rule mandate ("broadcast of the IDF
    # dictionary"). Its size is O(vocab) — bounded in practice by the
    # token pattern (words, not ids) and by min-df pruning upstream; on a
    # corpus whose raw vocabulary outgrows executor memory, set
    # cfg.broadcast_idf=False and the hint is dropped — AQE then picks
    # broadcast vs shuffled join from runtime stats (VERDICT r4 #3).
    idf_side = idf.select("token", "idf")
    if cfg.broadcast_idf:
        idf_side = F.broadcast(idf_side)
    weighted = counts.join(idf_side, "token", "left")
    # unseen tokens (scoring a corpus against a previously-fit IDF table)
    weighted = weighted.withColumn(
        "idf", F.coalesce(F.col("idf"), F.lit(float(cfg.missing_idf)))
    )
    if cfg.use_tf:
        doc_len = F.sum("tf_raw").over(Window.partitionBy("conv_id"))
        weight = (F.col("tf_raw") / doc_len) * F.col("idf")
    else:
        weight = F.col("idf")
    if has_boost:
        weight = weight * F.col("boost")
    weighted = weighted.withColumn("w", weight.cast("double"))
    return weighted.groupBy("conv_id").agg(
        F.map_from_entries(F.collect_list(F.struct("token", "w"))).alias("vec"),
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"),
        F.sum("tf_raw").cast("int").alias("n_tokens"),
    )
