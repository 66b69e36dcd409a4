"""Decompose the scored_pairs stage — the whole-job dominant cost.

After the int64 token-feature fix (runs 4-5), scored_pairs is ~72-74%
of the 8-core whole-job wall and sets the scaling number. This probe
reproduces the stage on the scaling corpus and times its internal
phases separately:

  1. dot-join  — pairs ⋈ exploded vectors ⋈ exploded vectors + groupBy
     (the sparse-matrix-product, codegen) + norms join + tau filter +
     the eager materialization (score_pairs' first checkpoint)
  2. jw-band   — borderline split + canonical-text prefix joins +
     Arrow JW UDF + union + second materialization

Also reports the band split (confident vs borderline pair counts) so
the JW fraction can be judged against its cost.

Usage: SPARK_GRAFT_CPUS=8 python scripts/scoring_probe.py [variant]
Variants: base (default: hashed tokens, pipeline defaults),
cidhash (additionally xxhash64 the conv ids inside the scoring joins,
mapping back to strings at the end — measures whether conv-id string
keys are worth encoding).
Env: SPARK_GRAFT_ER_CORPUS (default /tmp/amr_scaling_corpus_50000),
SPARK_GRAFT_SHUFFLE_PARTITIONS (64 in the recordings).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from address_match_recommend_spark.config import PipelineConfig
from address_match_recommend_spark.plans.pipeline import run_pipeline
from address_match_recommend_spark.operators.scoring import score_pairs
from address_match_recommend_spark.session import get_spark

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
corpus = os.environ.get("SPARK_GRAFT_ER_CORPUS", "/tmp/amr_scaling_corpus_50000")
spark = get_spark(f"scoring_probe_{variant}")
cfg = PipelineConfig()

from pyspark.sql import functions as F

tr = spark.read.parquet(f"{corpus}/transcripts.parquet")
# warm the Arrow workers like bench.py does
from address_match_recommend_spark.functions.jaro_winkler import make_jw_udf

spark.range(64).select(make_jw_udf(8)(F.lit("ab"), F.lit("ac"))).count()

res = run_pipeline(tr, cfg, until="candidate_pairs")
pairs = res.pairs
vectors = res.vectors
reps = res.representatives
pairs.count(), vectors.count()  # ensure upstream fully materialized

t = {}

if variant == "cidhash":
    # encode conv ids as int64 for every scoring-internal join; map back
    # at the end through the pairs frame (collision odds |pairs|²/2⁶⁴)
    pairs_h = pairs.select(
        F.xxhash64("conv_id_a").alias("conv_id_a"),
        F.xxhash64("conv_id_b").alias("conv_id_b"),
    ).localCheckpoint()
    vec_h = vectors.withColumn("conv_id", F.xxhash64("conv_id")).localCheckpoint()
    reps_h = reps.withColumn("conv_id", F.xxhash64("conv_id")).localCheckpoint()
    t0 = time.monotonic()
    scored = score_pairs(pairs_h, vec_h, reps_h, cfg)
    n = scored.count()
    t["score_total"] = round(time.monotonic() - t0, 3)
    t["n_scored"] = n
else:
    t0 = time.monotonic()
    # phase 1: everything up to (and incl.) the tau_lo filter + first
    # materialization — conversations=None skips the JW branch entirely
    dot_only = score_pairs(pairs, vectors, None, cfg)
    from address_match_recommend_spark.materialize import materialize

    dot_only = materialize(dot_only, cfg, eager=True)
    t["dot_join"] = round(time.monotonic() - t0, 3)
    t["n_scored"] = dot_only.count()
    t["n_borderline"] = dot_only.filter(
        (F.col("cosine") < cfg.tau_hi)
    ).count()

    # phase 2: the full stage (dot join runs again + JW band) — jw cost
    # = full - dot_join, measured on a fresh plan so caching can't help
    t1 = time.monotonic()
    full = score_pairs(pairs, vectors, reps, cfg)
    t["full_stage"] = round(time.monotonic() - t1, 3)
    t["jw_band_derived"] = round(t["full_stage"] - t["dot_join"], 3)

t["variant"] = variant
t["cores"] = os.environ.get("SPARK_GRAFT_CPUS", "?")
print(json.dumps(t))
spark.stop()
