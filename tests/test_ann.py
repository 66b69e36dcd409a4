"""ANN: brute-force cosine top-k (exact) and LSH-bucketed variant."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from address_match_recommend_spark.operators.ann import (
    brute_force_topk,
    cosine_sim,
    embedding_neardup_pairs,
    lsh_topk,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(20, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # 20..23: tiny perturbations of vec 0 (a near-dup cluster)
    for j in range(4):
        v = base[0] + 0.01 * rng.randn(16)
        rows.append((20 + j, [float(x) for x in v / np.linalg.norm(v)]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_cosine_sim_identity(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 1.0])],
                               "id int, a array<double>, b array<double>")
    got = {r["id"]: r["c"] for r in df.select("id", cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)


def test_brute_force_topk(spark, vecs):
    queries = vecs.filter(F.col("vec_id") == 0)
    top = brute_force_topk(vecs, queries, k=4).collect()
    ids = [r["match_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert set(ids) == {20, 21, 22, 23}  # the planted near-dups of vec 0
    scores = [r["cosine"] for r in sorted(top, key=lambda r: r["rank"])]
    assert all(s > 0.99 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_lsh_topk_finds_neardups(spark, vecs):
    queries = vecs.filter(F.col("vec_id") == 0)
    top = lsh_topk(vecs, queries, k=4, n_planes=16, bands=8).collect()
    ids = {r["match_id"] for r in top}
    # high-cosine items collide in ≥1 band w.h.p.
    assert len(ids & {20, 21, 22, 23}) >= 3


def test_embedding_neardup_pairs(spark, vecs):
    pairs = embedding_neardup_pairs(vecs, threshold=0.99, bands=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # all planted pairs among {0,20,21,22,23} found
    planted = {(a, b) for a in [0, 20, 21, 22, 23] for b in [0, 20, 21, 22, 23] if a < b}
    assert planted <= got


def test_ivf_topk_recall(spark):
    """IVF with n_probe=all lists must equal brute force; with fewer
    probes it must still find planted near-duplicates (same list)."""
    import numpy as np
    from address_match_recommend_spark.operators.ann import (
        brute_force_topk,
        ivf_fit,
        ivf_topk,
    )

    rng = np.random.RandomState(5)
    base = rng.randn(40, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        # planted near-duplicate of each base vector
        rows.append((1000 + i, [float(x) for x in v + rng.randn(16) * 0.01], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    centroids, assigned = ivf_fit(emb, n_lists=4, seed=7)
    queries = emb.filter(F.col("vec_id") < 5)

    # full probe ≡ brute force
    full = ivf_topk(centroids, assigned, queries, k=3, n_probe=4)
    brute = brute_force_topk(emb, queries, k=3)
    got = {(r["query_id"], r["rank"]): r["match_id"] for r in full.collect()}
    want = {(r["query_id"], r["rank"]): r["match_id"] for r in brute.collect()}
    assert got == want

    # 1-probe still finds the planted near-dup (it shares the list)
    one = ivf_topk(centroids, assigned, queries, k=1, n_probe=1)
    top1 = {r["query_id"]: r["match_id"] for r in one.collect()}
    assert all(top1[q] == 1000 + q for q in top1)
