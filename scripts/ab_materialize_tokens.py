#!/usr/bin/env python
"""A/B the cfg.materialize_tokens default at one core level (diagnostic
for the 20k whole-job scaling anomaly: 8-core wall moved 88.9 s
[recording A, materialize ON] -> 131.1 s [HEAD, OFF] while the 2-core
level got FASTER — is that the engine trade or host throttle?).

Child mode (AB_MATERIALIZE set): one fresh-JVM whole-job run, prints
one JSON line. Parent mode: interleaves ON/OFF children and reports
per-arm walls + mins.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child() -> None:
    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.plans.pipeline import run_pipeline
    from address_match_recommend_spark.session import get_spark

    mat = os.environ["AB_MATERIALIZE"] == "1"
    cores = int(os.environ.get("AB_CORES", "8"))
    spark = get_spark(cores=cores, shuffle_partitions=64, driver_memory="16g")
    tr = spark.read.parquet(
        os.environ["AB_CORPUS"] + "/transcripts.parquet"
    )
    cfg = PipelineConfig(materialize_tokens=mat)
    t0 = time.monotonic()
    res = run_pipeline(tr, cfg)
    res.clusters.select("entity_id").distinct().count()
    wall = round(time.monotonic() - t0, 3)
    print(json.dumps({
        "materialize_tokens": mat, "cores": cores, "wall": wall,
        "stage_sec": res.metrics["stage_sec"],
        "loadavg": round(os.getloadavg()[0], 2),
    }))


def parent(repeats: int = 2) -> None:
    corpus = os.environ.get(
        "AB_CORPUS", "/tmp/amr_scaling_corpus_20000"
    )
    runs: dict[str, list] = {"1": [], "0": []}
    for _ in range(repeats):
        for arm in ("1", "0"):
            # settle between fresh JVMs like bench.py's scaling loop
            waited = 0
            while os.getloadavg()[0] > 1.0 and waited < 240:
                time.sleep(10)
                waited += 10
            env = dict(os.environ, AB_MATERIALIZE=arm, AB_CORPUS=corpus)
            if "SPARK_LOCAL_DIRS" not in env and os.access("/dev/shm", os.W_OK):
                os.makedirs("/dev/shm/amr_shuffle", exist_ok=True)
                env["SPARK_LOCAL_DIRS"] = "/dev/shm/amr_shuffle"
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env, capture_output=True, text=True, check=True,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            runs[arm].append(json.loads(line))
    out = {
        arm: {
            "walls": [r["wall"] for r in rs],
            "min": min(r["wall"] for r in rs),
            "best_stages": min(rs, key=lambda r: r["wall"])["stage_sec"],
        }
        for arm, rs in runs.items()
    }
    print(json.dumps({"on": out["1"], "off": out["0"]}))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        parent(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
