#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints exactly ONE JSON line.

Headline metric (BASELINE.json): candidate-pairs-scored/sec through the
full record-linkage pipeline (canonicalize → dedup → TF-IDF → blocked
pair-gen → cosine+JW scoring → connected components), measured over a
deterministic synthetic transcript corpus sized to the SF tier, plus the
driver-contract queries over the /root/testdata tables.

Scaling-efficiency evidence (north rule, sandbox proxy for N vs 4N
executors): run with SPARK_GRAFT_CPUS=8 then 32 and compare pairs/sec —
see BENCH/BASELINE.md; `python bench.py --scaling` automates both runs in
separate JVMs via subprocess.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: synthetic-entity count per SF tier (pipeline input ≈ 4.5 convs/entity)
ER_ENTITIES = {"sf0.001": 60, "sf0.01": 150, "sf0.1": 400}

BENCH_QUERIES = [
    "tfidf_top1_similar",
    "candidate_pairs",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash",
    "ann_cosine_topk",
    "token_counts",
    "text_quality",
    "pruned_agg",
    "broadcast_dim_join",
    "topk_orders",
    "sessionize_events",
]


def ensure_corpus_parquet(n_entities: int, out_dir: str) -> str:
    """Generate the deterministic corpus ONCE to parquet (pandas-side, no
    Spark) so repeated scaling runs read identical bytes with zero
    generation cost inside the measured window."""
    from address_match_recommend_spark.datagen import generate_corpus, write_corpus

    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        write_corpus(generate_corpus(n_entities=n_entities, seed=7), out_dir)
        open(marker, "w").close()
    return out_dir


def run_er_pipeline(spark, n_entities: int) -> dict:
    """Full pipeline on the synthetic corpus; returns timings + pair count.

    If SPARK_GRAFT_ER_CORPUS points at a pre-generated corpus dir
    (ensure_corpus_parquet), transcripts are read from parquet —
    the scaling-evidence path."""
    from address_match_recommend_spark.plans.pipeline import run_pipeline
    from address_match_recommend_spark.plans.evaluate import pairwise_f1

    corpus_dir = os.environ.get("SPARK_GRAFT_ER_CORPUS")
    if corpus_dir:
        transcripts = spark.read.parquet(f"{corpus_dir}/transcripts.parquet")
        labeled_pairs = spark.read.parquet(f"{corpus_dir}/labeled_pairs.parquet")
    else:
        from address_match_recommend_spark.datagen import corpus_to_spark, generate_corpus

        tables = corpus_to_spark(spark, generate_corpus(n_entities=n_entities, seed=7))
        transcripts = tables["transcripts"].localCheckpoint()  # exclude gen cost
        labeled_pairs = tables["labeled_pairs"]
    n_turns = transcripts.count()

    t0 = time.monotonic()
    result = run_pipeline(transcripts)
    n_pairs_scored = result.scored.count()
    n_clusters = result.clusters.select("entity_id").distinct().count()
    wall = time.monotonic() - t0

    f1 = pairwise_f1(labeled_pairs, result.clusters)["f1"]
    return {
        "sec": wall,
        "n_turns": n_turns,
        "pairs_scored": n_pairs_scored,
        "pairs_per_sec": n_pairs_scored / wall if wall > 0 else 0.0,
        "turns_per_sec": n_turns / wall if wall > 0 else 0.0,
        "n_clusters": n_clusters,
        "f1": round(f1, 4),
    }


def main(er_only: bool = False) -> None:
    from pyspark.sql import SparkSession  # noqa: F401
    from address_match_recommend_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    spark = get_spark(app_name=f"bench-{sf_name}", cores=CPUS)

    queries: dict[str, float] = {}

    # 1. headline: ER pipeline throughput
    n_entities = int(
        os.environ.get("SPARK_GRAFT_ER_ENTITIES", ER_ENTITIES.get(sf_name, 150))
    )
    er = run_er_pipeline(spark, n_entities)
    queries["er_pipeline"] = round(er["sec"], 3)

    # 2. driver-contract queries against the SF tables
    if not er_only:
        qmap = entrymod.queries()
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            queries[name] = round(time.monotonic() - t0, 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_name,
        "cpus": CPUS,
        "er_pairs_scored": er["pairs_scored"],
        "er_pairs_per_sec": round(er["pairs_per_sec"], 1),
        "er_turns_per_sec": round(er["turns_per_sec"], 1),
        "er_f1": er["f1"],
    }
    print(json.dumps(out))
    spark.stop()


def scaling(n_entities: int = 1200, repeats: int = 2) -> None:
    """Scaling-efficiency evidence (north rule, sandbox proxy for N vs 4N
    executors): the SAME ER job on the SAME input at local[8] and
    local[32], fresh JVM each, best-of-``repeats`` per parallelism level
    (the sandbox host is noisy — a shared box showed ~3× run-to-run
    variance; min is the standard noise-robust estimator).

    efficiency = (throughput_32 / throughput_8) / (32/8).
    """
    import subprocess

    corpus_dir = ensure_corpus_parquet(
        n_entities, f"/tmp/amr_scaling_corpus_{n_entities}"
    )
    results: dict[int, dict] = {}
    for cores in (8, 32):
        best = None
        for _ in range(repeats):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cores),
                SPARK_GRAFT_ER_ENTITIES=str(n_entities),
                SPARK_GRAFT_ER_CORPUS=corpus_dir,
                # identical job config at both parallelism levels; only the
                # core count differs (the N vs 4N executor proxy)
                SPARK_GRAFT_SHUFFLE_PARTITIONS="64",
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--er-only"],
                env=env, capture_output=True, text=True, check=True,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            run = json.loads(line)
            if best is None or run["value"] < best["value"]:
                best = run
        results[cores] = best
    r8, r32 = results[8], results[32]
    t8, t32 = r8["queries"]["er_pipeline"], r32["queries"]["er_pipeline"]
    eff = (t8 / t32) / (32 / 8) if t32 else 0.0
    pair_eff = (
        (r32["er_pairs_per_sec"] / r8["er_pairs_per_sec"]) / (32 / 8)
        if r8["er_pairs_per_sec"]
        else 0.0
    )
    print(json.dumps({
        "scaling": {
            "cores": [8, 32],
            "n_entities": n_entities,
            "er_sec": [t8, t32],
            "er_pairs_per_sec": [r8["er_pairs_per_sec"], r32["er_pairs_per_sec"]],
            "efficiency_wall": round(eff, 3),
            "efficiency_er_pairs": round(pair_eff, 3),
        },
        "runs": {str(k): v for k, v in results.items()},
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        ents = [a for a in sys.argv if a.startswith("--entities=")]
        scaling(int(ents[0].split("=")[1]) if ents else 1200)
    else:
        main(er_only="--er-only" in sys.argv)
