"""Probe the idf stage's core scaling on the 50k scaling corpus.

The r5 calm-gated 50k whole-job recording decomposed its sub-0.8
efficiency to the idf stage (28.7 s @ 2 cores -> 20.9 s @ 8, stage
efficiency 0.34) and candidate_pairs (0.69).  This probe reproduces the
idf stage in isolation at one core count (fresh JVM per invocation, like
the recording) and times each sub-step so the non-scaling component can
be named: token explode recompute, the (conv_id, token) distinct
shuffle, the groupBy(token) aggregate, or the eager localCheckpoint.

Usage: SPARK_GRAFT_CPUS=2 python scripts/idf_probe.py [variant]
Variants: base (default), nodistinct (fuse distinct into the groupBy via
two-level agg), wide (shuffle_partitions=2x), noaqe (AQE coalesce off).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from address_match_recommend_spark.config import PipelineConfig
from address_match_recommend_spark.functions.tokenize import explode_tokens
from address_match_recommend_spark.operators.canonicalize import canonicalize
from address_match_recommend_spark.operators.dedup import dedup_exact
from address_match_recommend_spark.session import get_spark

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
corpus = os.environ.get("SPARK_GRAFT_ER_CORPUS", "/tmp/amr_scaling_corpus_50000")
extra = {}
if variant == "noaqe":
    extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
sp = None
if variant == "wide":
    sp = 64
spark = get_spark("idf_probe", shuffle_partitions=sp, extra_conf=extra)
cfg = PipelineConfig()

t = {}


def step(name, thunk):
    t0 = time.monotonic()
    out = thunk()
    t[name] = round(time.monotonic() - t0, 3)
    return out


tr = spark.read.parquet(f"{corpus}/transcripts.parquet")
conv = step("conversations", lambda: canonicalize(tr, cfg).localCheckpoint())
reps = step(
    "representatives",
    lambda: dedup_exact(conv).repartition(cfg.shuffle_partitions).localCheckpoint(),
)
n = step("ndocs", reps.count)
tokens = explode_tokens(reps, cfg)

from pyspark.sql import functions as F

if variant == "mat":
    # split the explode recompute out of the idf stage: materialize the
    # token stream first (timed), then the distinct+groupBy runs over
    # LogicalRDD blocks
    tokens = step("tokens_mat", tokens.localCheckpoint)

if variant == "cache":
    # serialization-free variant: MEMORY_ONLY persist + count instead of
    # localCheckpoint's block write
    from pyspark import StorageLevel

    tokens = tokens.persist(StorageLevel.MEMORY_ONLY)
    step("tokens_cache", tokens.count)

if variant == "nodistinct":
    # fuse the distinct into the df aggregate: one shuffle on token with
    # map-side combine over (conv_id, token) partial sets is impossible
    # without distinct, so instead aggregate count(distinct conv_id) --
    # Spark plans this as a two-level expand-free aggregate
    def idf_plan():
        df = tokens.select("conv_id", "token").groupBy("token").agg(
            F.countDistinct("conv_id").alias("df")
        )
        idf_col = F.greatest(
            F.log(F.lit(float(n)) / (F.col("df") + F.lit(1.0))),
            F.lit(float(cfg.min_idf)),
        )
        return df.withColumn("idf", idf_col)

    idf = step("idf", lambda: idf_plan().localCheckpoint())
else:
    from address_match_recommend_spark.operators.tfidf import idf_table

    idf = step("idf", lambda: idf_table(tokens, n, cfg).localCheckpoint())

t["n_docs"] = n
t["n_vocab"] = idf.count()
t["variant"] = variant
t["cores"] = os.environ.get("SPARK_GRAFT_CPUS", "?")
t["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
print(json.dumps(t))
spark.stop()
