"""Probe shuffle-byte reduction levers on the token-stream stages.

The r5 calm-gated 100k whole-job recording named the ceiling: the three
token-shuffle stages (idf 0.40, vectors 0.66, candidate_pairs 0.64
stage efficiency 2->8 cores) are bounded by single-box memory bandwidth
(scripts/membw_probe.py measured 0.68 at 2->8 wide). Shuffled BYTES are
also what a real cluster pays network for, so shrinking the payload is a
genuine 100 TB lever, not a sandbox trick. Two levers probed here:

- ``hash``  -- replace the token string with xxhash64(token) (int64
  feature ids) right after tokenize, before every shuffle that carries
  the ~200x-exploded token stream. Feature-identity collisions at 2^-64
  per pair of vocab entries are immaterial for weights/blocking.
- ``zstd``  -- spark.io.compression.codec zstd instead of lz4 (higher
  ratio on text-heavy shuffle blocks, more CPU per byte).

Usage: SPARK_GRAFT_CPUS=8 python scripts/shuffle_probe.py [variant]
Variants: base (default), hash, zstd, hashzstd.
Env: SPARK_GRAFT_ER_CORPUS (default /tmp/amr_scaling_corpus_50000),
SPARK_GRAFT_SHUFFLE_PARTITIONS (set 64 to match the recordings).

Prints one JSON line: stage walls + total shuffle write/read bytes from
the Spark REST API (UI enabled on an ephemeral port just for this).
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from address_match_recommend_spark.config import PipelineConfig
from address_match_recommend_spark.functions.tokenize import explode_tokens
from address_match_recommend_spark.operators.blocking import candidate_pairs, postings
from address_match_recommend_spark.operators.canonicalize import canonicalize
from address_match_recommend_spark.operators.dedup import dedup_exact
from address_match_recommend_spark.operators.tfidf import idf_table, tfidf_vectors
from address_match_recommend_spark.session import get_spark

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
corpus = os.environ.get("SPARK_GRAFT_ER_CORPUS", "/tmp/amr_scaling_corpus_50000")
ui_port = int(os.environ.get("PROBE_UI_PORT", "4049"))

extra = {"spark.ui.enabled": "true", "spark.ui.port": str(ui_port)}
if "zstd" in variant:
    extra["spark.io.compression.codec"] = "zstd"
spark = get_spark(f"shuffle_probe_{variant}", extra_conf=extra)
cfg = PipelineConfig()

t = {}


def step(name, thunk):
    t0 = time.monotonic()
    out = thunk()
    t[name] = round(time.monotonic() - t0, 3)
    return out


from pyspark.sql import functions as F

tr = spark.read.parquet(f"{corpus}/transcripts.parquet")
conv = step("conversations", lambda: canonicalize(tr, cfg).localCheckpoint())
reps = step(
    "representatives",
    lambda: dedup_exact(conv).repartition(cfg.shuffle_partitions).localCheckpoint(),
)
n = step("ndocs", reps.count)
tokens = explode_tokens(reps, cfg)
if "hash" in variant:
    tokens = tokens.withColumn("token", F.xxhash64("token"))

idf = step("idf", lambda: idf_table(tokens, n, cfg).localCheckpoint())
vectors = step("vectors", lambda: tfidf_vectors(tokens, idf, cfg).localCheckpoint())
post = postings(tokens, idf, cfg)
pairs = step("candidate_pairs", lambda: candidate_pairs(post, cfg).localCheckpoint())
t["n_pairs"] = pairs.count()
t["front_half_sec"] = round(t["idf"] + t["vectors"] + t["candidate_pairs"], 3)

# shuffle bytes from the REST API (sum over all completed stages)
try:
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=30)
    )
    t["shuffle_write_mb"] = round(
        sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
    )
    t["shuffle_read_mb"] = round(
        sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
    )
    t["input_mb"] = round(sum(s.get("inputBytes", 0) for s in stages) / 1e6, 1)
except Exception as e:  # pragma: no cover
    t["shuffle_bytes_err"] = str(e)

t["variant"] = variant
t["cores"] = os.environ.get("SPARK_GRAFT_CPUS", "?")
t["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
print(json.dumps(t))
spark.stop()
