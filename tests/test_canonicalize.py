"""Canonicalization goldens — the per-row invariant (input_hint): per-turn
text equality under stable turn ordering, verified against hand-computable
golden_canonical (FIXTURES.md §4), including under shuffled input order."""

from pyspark.sql import functions as F

from address_match_recommend_spark.operators.canonicalize import canonicalize


def test_matches_golden(spark, tiny_tables):
    got = canonicalize(tiny_tables["transcripts"]).select(
        "conv_id",
        F.col("canonical_text").alias("got_text"),
        F.col("n_turns").alias("got_n"),
        F.col("text_hash").alias("got_hash"),
    )
    golden = tiny_tables["golden_canonical"]
    n = golden.count()
    assert got.count() == n
    joined = got.join(golden, "conv_id", "full")
    mismatches = joined.filter(
        (F.col("got_text") != F.col("canonical_text"))
        | (F.col("got_n") != F.col("n_turns"))
        | (F.col("got_hash") != F.col("text_hash"))
        | F.col("got_text").isNull()
        | F.col("canonical_text").isNull()
    )
    assert mismatches.count() == 0


def test_stable_under_shuffled_input(spark, tiny_tables):
    """Reversing and repartitioning the turn rows must not change a single
    hash — ordering comes from turn_idx, not partition order."""
    t = tiny_tables["transcripts"]
    shuffled = t.orderBy(F.desc("turn_idx"), F.desc("conv_id")).repartition(13)
    a = canonicalize(t).select("conv_id", "text_hash")
    b = canonicalize(shuffled).select("conv_id", "text_hash")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_roles_tools_and_ts(spark, tiny_tables):
    got = canonicalize(tiny_tables["transcripts"])
    row = got.orderBy("conv_id").first()
    src = (
        tiny_tables["transcripts"]
        .filter(F.col("conv_id") == row["conv_id"])
        .orderBy("turn_idx")
        .collect()
    )
    assert row["roles"] == [r["role"] for r in src]
    assert row["tools"] == [r["tool"] for r in src if r["tool"]]
    assert row["first_ts"] == src[0]["ts"] and row["last_ts"] == src[-1]["ts"]
    assert row["n_turns"] == len(src)
