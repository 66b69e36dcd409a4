"""Near-duplicate detection family — MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup is the exact Bloom path; a training-data
pipeline at 100 TB needs the near-dup ladder too. All three are built
from public algorithms (Broder's MinHash, Charikar's SimHash) with Spark
built-ins only: ``xxhash64`` is the hash family (seeded — one column
expression per permutation), banding/bucketing are plain groupBy joins.
No Python in any hot path.

Scale design:
- MinHash signatures: one narrow aggregate over the exploded token table
  (map-side combined); bands become the shuffle key for bucket joins, so
  the quadratic step is confined to same-bucket groups, the same
  skew-controlled shape as the blocking stage.
- SimHash: 64-bit signature from per-bit weighted majorities; candidate
  pairs via 4×16-bit band equality (Hamming ≤ 3 detection).
- n-gram Jaccard: shingle postings self-join with df cap — exact Jaccard
  on candidates, used to verify MinHash estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenize import tokenize_col


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokenize_col(F.col(text_col)))).alias("token"),
    )


def _seeded_hash(token_col, i: int, hash_algo: str):
    """One member of the hash family. ``xx64`` (default) is the fast
    production path. ``md5`` exists bit-identically in DuckDB too, and a
    fixed-width lowercase-hex prefix compares lexicographically exactly as
    its numeric value — so md5-mode signatures are value-checkable against
    a pure-SQL oracle (CORRECTNESS gate) while exercising the same
    operator code path."""
    if hash_algo == "xx64":
        return F.xxhash64(token_col, F.lit(i))
    if hash_algo == "md5":
        return F.substring(
            F.md5(F.concat_ws("|", F.lit(str(i)), token_col)), 1, 15
        )
    raise ValueError(f"unknown hash_algo {hash_algo!r}")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    n_hashes: int = 32,
    hash_algo: str = "xx64",
) -> DataFrame:
    """(id, h0..h{n-1}) — MinHash over the distinct token set, one seeded
    hash min-aggregate per permutation (all JVM-side)."""
    toks = _tokens(df, text_col, id_col)
    aggs = [
        F.min(_seeded_hash(F.col("token"), i, hash_algo)).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return toks.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    signatures: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    bucket: str = "hash",
) -> DataFrame:
    """(id_a, id_b, n_bands_shared) — pairs hashing to the same LSH bucket
    in ≥1 band. rows_per_band = n_hashes // bands; collision prob for
    Jaccard s is 1-(1-s^r)^b (Broder/LSH standard).

    ``bucket="hash"`` re-hashes the band slice to one 64-bit key (cheapest
    shuffle key); ``bucket="concat"`` joins the slice values verbatim —
    collision-free and SQL-reproducible (used by the oracle query)."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        key = F.xxhash64(*cols) if bucket == "hash" else F.concat_ws("|", *cols)
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("bucket")))
    buckets = (
        signatures.select("id", F.explode(F.array(*band_cols)).alias("bb"))
        .select(
            "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        .persist()  # both sides of the self-join read this
    )
    buckets.count()  # populate before the self-join schedules both sides
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, n_hashes: int = 32
) -> DataFrame:
    """pairs + est_jaccard = fraction of agreeing signature slots."""
    sig_a = signatures.select(
        F.col("id").alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(n_hashes)]
    )
    sig_b = signatures.select(
        F.col("id").alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(n_hashes)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(n_hashes)
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", (agree / F.lit(float(n_hashes))).cast("double"))
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    hash_algo: str = "xx64",
) -> DataFrame:
    """(id, simhash) — 64-bit Charikar signature: bit i of hash(token)
    votes +1/-1; signature bit = sign of the vote sum.

    ``hash_algo="md5"`` derives bit i from hex nibble i//4 of md5(token)
    (bit i%4 within the nibble) — the same bits a DuckDB oracle computes
    via strpos/shift, making the operator value-checkable end to end."""
    toks = _tokens(df, text_col, id_col)
    if hash_algo == "xx64":
        toks = toks.withColumn("h", F.xxhash64("token"))

        def bit(i):
            return F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))

    elif hash_algo == "md5":
        toks = toks.withColumn("h", F.md5("token"))

        def bit(i):
            nibble = F.conv(F.substring(F.col("h"), i // 4 + 1, 1), 16, 10).cast(
                "int"
            )
            return F.shiftright(nibble, i % 4).bitwiseAND(F.lit(1))

    else:
        raise ValueError(f"unknown hash_algo {hash_algo!r}")
    votes = toks.groupBy("id").agg(
        *[
            F.sum((bit(i) * 2 - 1).cast("long")).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select("id", sig.alias("simhash"))


def simhash_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) with hamming ≤ max_hamming, found via 4×16-bit
    band equality (pigeonhole: any pair within Hamming 3 agrees on ≥1 of 4
    bands)."""
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
    ).persist()  # both sides of the self-join read this
    bands.count()  # populate before the self-join schedules both sides
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def word_ngrams(text: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a text column (JVM-side).

    The token array is let-bound as a lambda variable (wrapped in a
    1-element array + ``transform``) so the tokenizer expression is
    evaluated ONCE per row — inlining it into the per-index lambda would
    re-run ``regexp_extract_all`` for every shingle position (measured 4×
    slower on sf0.01 documents)."""

    def ngrams_of(t: F.Column) -> F.Column:
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.expr("array()").cast("array<int>"))
        return F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), "_"))

    return F.array_distinct(
        F.flatten(F.transform(F.array(tokenize_col(text)), ngrams_of))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    n: int = 3,
    max_shingle_df: int = 50,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """(id_a, id_b, jaccard) — exact n-gram Jaccard for every pair sharing
    a non-hot shingle. Shingle df cap plays the same anti-skew role as the
    blocking df cap."""
    shingles = (
        df.select(
            F.col(id_col).alias("id"),
            word_ngrams(F.col(text_col), n).alias("shingles"),
        )
        .select(
            "id",
            F.size("shingles").alias("n_shingles"),
            F.explode("shingles").alias("shingle"),
        )
    )
    df_counts = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    # materialized: referenced by BOTH sides of the self-join below — without
    # persist each side re-executes the whole shingle scan (self-joins never
    # share an unmaterialized upstream). At pipeline scale this table is
    # checkpointed instead (sources/checkpoint.py); persist spills to disk.
    # no forced broadcast: the df-capped shingle table is O(unique
    # shingles) — AQE picks broadcast while it fits, shuffle join beyond
    usable = shingles.join(
        df_counts.filter(F.col("sdf") <= max_shingle_df), "shingle"
    ).persist()
    usable.count()  # populate before the self-join schedules both sides
    a, b = usable.alias("a"), usable.alias("b")
    common = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.withColumn("jaccard", jac.cast("double"))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )
