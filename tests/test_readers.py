"""Sources: text bulk-import determinism (reference S5,
/root/reference/sh/import_base_addrs.go:13-68)."""

from __future__ import annotations

from address_match_recommend_spark.sources.readers import read_transcripts_text


def test_text_import_ids_deterministic(spark, tmp_path):
    """Two imports of the same file yield the SAME conv_id set (round-1
    fix: monotonically_increasing_id made replays produce fresh ids,
    defeating the incremental anti-join replay guard)."""
    p = tmp_path / "addrs.txt"
    p.write_text("alpha street 1\nbeta road 2\nalpha street 1\ngamma lane 3\n")
    ids1 = {r["conv_id"] for r in read_transcripts_text(spark, str(p)).collect()}
    ids2 = {r["conv_id"] for r in read_transcripts_text(spark, str(p)).collect()}
    assert ids1 == ids2
    # duplicate lines still get distinct ids (occurrence index)
    assert len(ids1) == 4


def test_text_import_schema(spark, tmp_path):
    p = tmp_path / "one.txt"
    p.write_text("hello world\n")
    df = read_transcripts_text(spark, str(p))
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    row = df.collect()[0]
    assert row["text"] == "hello world" and row["turn_idx"] == 0
