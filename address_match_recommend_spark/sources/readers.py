"""Sources — readers for the transcripts input table and fixtures.

The reference's sources are Postgres full scans / point lookups / blocked
scans (/root/reference/models/persister.go:18-127) and a line-by-line text
import (/root/reference/sh/import_base_addrs.go:13-68). Here every source
is a DataFrame reader:

- parquet (default in the sandbox — /root/testdata layout),
- Iceberg (production target per BASELINE.json; gated behind catalog
  availability, same schema),
- text files (one line = one single-turn transcript — the bulk-import
  path S5).

All readers emit the canonical transcripts schema from the input_hint:
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

#: BASELINE.json input_hint schema, verbatim.
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def conform_transcripts(df: DataFrame) -> DataFrame:
    """Cast/reorder arbitrary input to the canonical transcripts schema.

    Fails fast (AnalysisException) if a required column is missing — the
    schema is fixed, never inferred (the reference likewise fixes its
    schema via GORM struct tags + DDL, SURVEY §1.2).
    """
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan. Filters/projections later in the plan reach the scan
    via Catalyst pushdown (verify: .explain shows PushedFilters/ReadSchema)."""
    return conform_transcripts(spark.read.parquet(path))


def read_transcripts_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table scan (production path; needs the Iceberg runtime jar
    + catalog conf on the cluster — unavailable in the sandbox, so tests
    use parquet). Partition pruning on Iceberg partition columns (e.g.
    bucket(conv_id) / days(ts)) is automatic for pushed-down predicates.
    """
    try:
        return conform_transcripts(spark.read.format("iceberg").load(table))
    except Exception as exc:  # pragma: no cover - sandbox has no Iceberg jar
        raise NotImplementedError(
            "Iceberg runtime not available in this environment; "
            "use read_transcripts_parquet or add the iceberg-spark-runtime "
            "jar + catalog config to spark-submit"
        ) from exc


def read_transcripts_text(
    spark: SparkSession, path: str, default_role: str = "user"
) -> DataFrame:
    """Bulk-import path (reference S5: one line = one record,
    /root/reference/sh/import_base_addrs.go:13-68). Each line becomes a
    single-turn conversation.

    conv_id is **deterministic across re-imports** (round-2 fix: it used
    to mix in monotonically_increasing_id, which varies with partitioning
    and task retries, so replaying the same file produced fresh conv_ids
    and defeated the incremental plan's anti-join replay guard). Key =
    sha256(file-path \\x00 line-content \\x00 occurrence-index), where
    the occurrence index disambiguates identical lines within one file —
    any assignment of 1..k to k identical lines yields the same SET of
    conv_ids, so two identical imports dedupe exactly.

    The path component is the FULL file URI (round-3 fix, ADVICE r2: the
    basename alone made two part-00000 files under different
    subdirectories of one import glob collide, silently merging identical
    lines across distinct files as replays). Re-importing the same files
    from the same location still dedupes exactly; moving the files is a
    new import by design — the incremental anti-join guard operates on
    content hashes downstream.
    """
    from pyspark.sql import Window

    lines = spark.read.text(path).withColumn(
        "fname", F.input_file_name()
    )
    occ = F.row_number().over(
        Window.partitionBy("fname", "value").orderBy(F.lit(1))
    )
    return conform_transcripts(
        lines.select(
            F.sha2(
                F.concat_ws(
                    "\x00", F.col("fname"), F.col("value"), occ.cast("string")
                ),
                256,
            ).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit(default_role).alias("role"),
            F.col("value").alias("text"),
            F.lit("").alias("tool"),
            F.current_timestamp().alias("ts"),
        )
    )


def append_transcripts(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Incremental import sink (reference S6 ``ImportAddr``,
    /root/reference/core/similarity.go:551-581). Parquet append in the
    sandbox; on Iceberg, ``df.writeTo(table).append()`` gives ACID appends
    and snapshot isolation for the incremental re-run (anti-join on
    checkpointed conv_ids finds the new work)."""
    out = conform_transcripts(df)
    if fmt == "iceberg":
        # DataFrameWriterV2: ACID append into a catalog table
        out.writeTo(path).append()
    else:
        out.write.mode("append").format(fmt).save(path)
