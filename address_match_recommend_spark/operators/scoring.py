"""Stage 7 — pairwise scoring: cosine over TF-IDF maps + Jaro-Winkler.

Analog of the reference's ``computeDocSimilarity``
(/root/reference/core/similarity.go:432-549): accumulate ΣqW·dW, ΣqW², ΣdW²
over matched terms and take cosine = sumQD/√(sumQQ·sumDD) (:540). There it
is a per-pair Go loop with a lazy TermsMap hash probe
(/root/reference/models/document.go:26-39); here the whole computation is a
single JVM expression — ``map_zip_with`` merges the two token→weight maps
and ``aggregate`` folds the products — inside whole-stage codegen. No
Python touches the hot path; norms were precomputed in the vectors stage so
score(x, x) = 1 exactly (the reference's own README admits its scores
don't reach 1.0 on identical strings, README.md:141-142 — a quirk we fix,
SURVEY §2.9).

Jaro-Winkler (the north rule's tie-break) runs as an Arrow-batched pandas
UDF on ONLY the borderline band tau_lo ≤ cos < tau_hi — at well-separated
thresholds that band is a small fraction of pairs, so the O(len²) Python
cost is off the critical path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..functions.jaro_winkler import make_jw_udf


def cosine_expr(va, vb, norm_a, norm_b):
    """Column: cosine similarity of two map<string,double> TF-IDF vectors.

    NOTE: kept for API/testing convenience. Catalyst's MapData is an
    unsorted array — ``map_zip_with`` probes it linearly per key, making
    this O((n+m)²) string comparisons per pair (measured ~40 core-ms on
    ~110-token conversations). The hot path uses the exploded-join dot
    product in :func:`score_pairs` instead."""
    prods = F.map_zip_with(
        va, vb, lambda _, x, y: F.coalesce(x, F.lit(0.0)) * F.coalesce(y, F.lit(0.0))
    )
    dot = F.aggregate(F.map_values(prods), F.lit(0.0), lambda acc, v: acc + v)
    denom = norm_a * norm_b
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def score_pairs(
    pairs: DataFrame,
    vectors: DataFrame,
    conversations: DataFrame | None = None,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """(conv_id_a, conv_id_b, cosine[, jw], is_match).

    Joins the candidate pairs with the per-conversation vector table twice
    (equi-joins on conv_id — sized by |pairs|, AQE picks the strategy), then
    evaluates cosine JVM-side. If ``conversations`` is given, borderline
    pairs additionally fetch canonical_text and get a Jaro-Winkler score.

    The scoring stage is repartitioned explicitly when
    cfg.score_partitions is set (north rule: explicit repartitioning) —
    otherwise AQE's coalescing decides.
    """
    cfg = cfg or PipelineConfig()
    if cfg.score_partitions:
        pairs = pairs.repartition(cfg.score_partitions, "conv_id_a")

    # Sparse dot product by join (the sparse-matrix-product pattern):
    # explode each side's weight map to (conv_id, token, w), equi-join on
    # (pair, token), sum w_a·w_b per pair. Every step is a codegen'd hash
    # join / partial agg — measured ~50× faster than per-pair map merging
    # (map_zip_with linearly probes Catalyst's array-backed maps, giving
    # O((n+m)²) per pair). Pairs sharing no weighted token drop out of the
    # inner join — their cosine is 0 < tau_lo by definition.
    wa = vectors.select(
        F.col("conv_id").alias("conv_id_a"), F.explode("vec").alias("token", "w_a")
    )
    wb = vectors.select(
        F.col("conv_id").alias("conv_id_b"), F.explode("vec").alias("token", "w_b")
    )
    dots = (
        pairs.join(wa, "conv_id_a")
        .join(wb, ["conv_id_b", "token"])
        .groupBy("conv_id_a", "conv_id_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"))
    )
    na = vectors.select(F.col("conv_id").alias("conv_id_a"), F.col("norm").alias("norm_a"))
    nb = vectors.select(F.col("conv_id").alias("conv_id_b"), F.col("norm").alias("norm_b"))
    scored = (
        dots.join(na, "conv_id_a")
        .join(nb, "conv_id_b")
        .withColumn(
            "cosine",
            F.when(
                (F.col("norm_a") > 0) & (F.col("norm_b") > 0),
                F.col("dot") / (F.col("norm_a") * F.col("norm_b")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("dot", "norm_a", "norm_b")
        .filter(F.col("cosine") >= cfg.tau_lo)
    )

    if conversations is None:
        return scored.withColumn("is_match", F.col("cosine") >= cfg.tau_hi)

    # The confident/borderline split below reads `scored` twice — persist
    # (and populate) so the pair join runs once, not once per branch.
    scored = scored.persist()
    scored.count()

    # Jaro-Winkler tie-break for the borderline band only. The prefix
    # truncation happens HERE, JVM-side, so only jw_prefix_chars (not the
    # full multi-KB canonical text) is shuffled and Arrow-shipped into the
    # Python workers.
    jw_udf = make_jw_udf(cfg.jw_prefix_chars)
    prefix = F.substring(F.col("canonical_text"), 1, cfg.jw_prefix_chars)
    texts_a = conversations.select(
        F.col("conv_id").alias("conv_id_a"), prefix.alias("text_a")
    )
    texts_b = conversations.select(
        F.col("conv_id").alias("conv_id_b"), prefix.alias("text_b")
    )
    borderline = scored.filter(F.col("cosine") < cfg.tau_hi)
    confident = scored.filter(F.col("cosine") >= cfg.tau_hi).withColumn(
        "jw", F.lit(None).cast("double")
    )
    borderline = (
        borderline.join(texts_a, "conv_id_a")
        .join(texts_b, "conv_id_b")
        .withColumn("jw", jw_udf("text_a", "text_b"))
        .drop("text_a", "text_b")
    )
    scored_all = confident.unionByName(borderline)
    return scored_all.withColumn(
        "is_match",
        (F.col("cosine") >= cfg.tau_hi)
        | ((F.col("cosine") >= cfg.tau_lo) & (F.col("jw") >= cfg.jw_threshold)),
    )


def coord_density(
    pairs: DataFrame,
    tokens: DataFrame,
) -> DataFrame:
    """Reference-parity coord/density per pair (A4/A5).

    The reference computes, over the query doc's text terms
    (/root/reference/core/similarity.go:435-483):
      coord   = √(matched / n_query_text_terms)·0.5 + 0.5   (:466)
      density = √(matched / (matchEnd − matchStart + 1))·0.5 + 0.5 (:482)
    where matchStart/End are positions of matched terms in the query's
    term order. Here "query" is side a of each pair; ``tokens`` is the
    exploded (conv_id, pos, token) table, positions from posexplode
    (SURVEY §2.5). Uses true float division, not the reference's
    integer-division quantization (SURVEY §2.9).

    All relational: token-intersection join + one aggregation per pair.
    """
    ta = tokens.select(
        F.col("conv_id").alias("conv_id_a"), F.col("pos").alias("pos_a"), "token"
    )
    tb = tokens.select(F.col("conv_id").alias("conv_id_b"), "token").distinct()
    n_terms = tokens.groupBy(F.col("conv_id").alias("conv_id_a")).agg(
        F.count(F.lit(1)).alias("n_terms_a")
    )
    matched = (
        pairs.join(ta, "conv_id_a")
        .join(tb, ["conv_id_b", "token"], "left_semi")
        .groupBy("conv_id_a", "conv_id_b")
        .agg(
            F.count(F.lit(1)).alias("matched"),
            F.min("pos_a").alias("match_start"),
            F.max("pos_a").alias("match_end"),
        )
    )
    half = F.lit(0.5)
    return (
        matched.join(F.broadcast(n_terms), "conv_id_a")
        .withColumn(
            "coord", F.sqrt(F.col("matched") / F.col("n_terms_a")) * half + half
        )
        .withColumn(
            "density",
            F.sqrt(
                F.col("matched")
                / (F.col("match_end") - F.col("match_start") + F.lit(1))
            )
            * half
            + half,
        )
        .select("conv_id_a", "conv_id_b", "matched", "coord", "density")
    )


def top_k_matches(scored: DataFrame, k: int = 1) -> DataFrame:
    """Reference semantics: greedy top-N similar docs per query
    (``Query.AddSimiDoc`` /root/reference/models/query.go:12-33, descending
    sort :88-106). Emits both directions so every conversation gets its
    best neighbors; Spark prunes with WindowGroupLimit.

    Output: (conv_id, match_id, cosine, rank).
    """
    from pyspark.sql import Window

    sym = scored.select(
        F.col("conv_id_a").alias("conv_id"),
        F.col("conv_id_b").alias("match_id"),
        "cosine",
    ).unionByName(
        scored.select(
            F.col("conv_id_b").alias("conv_id"),
            F.col("conv_id_a").alias("match_id"),
            "cosine",
        )
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
