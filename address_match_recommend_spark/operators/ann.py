"""Similarity search over embedding columns (array<float>).

Two paths, per the scale ladder:
- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus; dot products via ``zip_with``+``aggregate``
  (JVM-side, codegen). The baseline and the oracle-checkable path.
- ``lsh_topk`` — random-hyperplane LSH (Charikar): sign-bit signatures
  against a fixed seeded hyperplane matrix, candidates from band-equality
  buckets, exact cosine re-rank within buckets. The 100 TB path: the
  quadratic step is confined to buckets exactly like token blocking.

Hyperplanes are generated driver-side from a seeded numpy RNG and shipped
as literal arrays — deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine_sim(a, b):
    """Column: cosine between two array<float/double> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, match_id, cosine, rank) — exact top-k by cosine.

    ``queries`` is broadcast (the expected shape: few queries × huge
    corpus), so the scan parallelizes over corpus partitions with no
    shuffle until the final per-query top-k (WindowGroupLimit prunes
    map-side)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", cosine_sim(F.col("qvec"), F.col("cvec")))
        .select("query_id", "match_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Column: array<int> of sign bits (one per hyperplane)."""
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, 1).otherwise(0))
    return F.array(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates = same (band, band-signature) bucket,
    exact cosine re-rank inside. Recall rises with bands (OR-construction).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    rows_per_band = n_planes // bands

    def with_buckets(df: DataFrame, role: str) -> DataFrame:
        sig = lsh_signature(F.col(vec_col), planes)
        bandcols = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.array_join(
                        F.transform(
                            F.slice(sig, b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        "",
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_vec"),
            F.explode(bandcols).alias("bb"),
        ).select(
            f"{role}_id", f"{role}_vec", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )

    qb = with_buckets(queries, "query")
    cb = with_buckets(corpus, "match")
    cand = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "query_vec", "match_id", "match_vec")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", cosine_sim(F.col("query_vec"), F.col("match_vec"))
    ).select("query_id", "match_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """(id_a, id_b, cosine ≥ threshold) — embedding-cosine near-dup pairs
    via LSH self-bucketing (no broadcast: corpus × corpus within buckets)."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    rows_per_band = n_planes // bands
    sig = lsh_signature(F.col(vec_col), planes)
    bandcols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    "",
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    bucketed = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), F.explode(bandcols).alias("bb")
    ).select("id", "vec", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("cosine", cosine_sim(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_fit(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
) -> tuple[list[list[float]], DataFrame]:
    """Fit an IVF coarse quantizer: k-means centroids (pyspark.ml, one
    distributed Lloyd run) + the assignment table (id, list_id, vec).

    At 100 TB the assignment table is the Iceberg-partitioned index —
    ``PARTITIONED BY list_id`` makes a probe read only n_probe partitions
    (partition pruning does the candidate selection). Returns driver-side
    centroids (n_lists × dim floats — tiny) for query routing.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(feats)
    assigned = model.transform(feats).select(
        "id", "vec", F.col("prediction").alias("list_id")
    )
    centroids = [c.tolist() for c in model.clusterCenters()]
    return centroids, assigned


def ivf_topk(
    centroids: list[list[float]],
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: route each query to its n_probe nearest
    centroids (broadcast join against the tiny centroid table), then exact
    cosine re-rank ONLY within those inverted lists. Recall rises with
    n_probe; n_probe = n_lists degenerates to brute force."""
    spark = assigned.sparkSession
    cent_rows = [(i, c) for i, c in enumerate(centroids)]
    cent = spark.createDataFrame(cent_rows, "list_id int, centroid array<double>")

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    # L2 distance query → centroid; keep n_probe nearest lists per query
    d2 = F.aggregate(
        F.zip_with(
            F.col("qvec"), F.col("centroid"), lambda x, y: (x.cast("double") - y) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    routed = q.crossJoin(F.broadcast(cent)).withColumn("d2", d2)
    wr = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("list_id"))
    probes = (
        routed.withColumn("pr", F.row_number().over(wr))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qvec", "list_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", "qvec", F.col("id").alias("match_id"), "vec")
    )
    scored = cand.withColumn("cosine", cosine_sim(F.col("qvec"), F.col("vec"))).select(
        "query_id", "match_id", "cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
