"""Connected components on known graphs (chain, star, two components)."""

from address_match_recommend_spark.operators.clustering import (
    assign_entities,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "conv_id_a string, conv_id_b string")
    return {
        r["conv_id"]: r["entity_id"] for r in connected_components(df).collect()
    }


def test_chain(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert got == {x: "a" for x in "abcde"}


def test_star(spark):
    got = _cc(spark, [("m", x) for x in ["n", "o", "p", "q"]])
    assert got == {x: "m" for x in "mnopq"}


def test_two_components_and_cycle(spark):
    got = _cc(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z")],
    )
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_long_path_converges(spark):
    """Path of 33 nodes — needs multiple large/small-star rounds."""
    nodes = [f"n{i:02d}" for i in range(33)]
    got = _cc(spark, list(zip(nodes, nodes[1:])))
    assert set(got.values()) == {"n00"}
    assert len(got) == 33


def test_assign_entities_singletons(spark):
    conv = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("lone",)], "conv_id string"
    )
    comps = connected_components(
        spark.createDataFrame([("a", "b")], "conv_id_a string, conv_id_b string")
    )
    got = {r["conv_id"]: r["entity_id"] for r in assign_entities(conv, comps).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "lone": "lone"}
