"""Connected components vs a pure-python union-find oracle: hand-built graphs
(chain, star, two components, singleton — SURVEY.md §5) + randomized graphs."""

from __future__ import annotations

import numpy as np
import pytest

from dedup.components import connected_components
from dedup.reference_impl import UnionFind


def _run(spark, edges: list[tuple[str, str]], vertices: list[str], threshold: int = 0) -> dict[str, str]:
    """threshold=0 forces the distributed star loop (the scale path)."""
    e = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    if not edges:
        e = e.where("1=0")
    v = spark.createDataFrame([(x,) for x in vertices], "image_id string")
    return {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(e, v, driver_edge_threshold=threshold).collect()
    }


def _oracle(edges, vertices):
    uf = UnionFind()
    for x in vertices:
        uf.find(x)
    for a, b in edges:
        uf.union(a, b)
    return {x: uf.find(x) for x in vertices}


@pytest.mark.parametrize(
    "name,edges,vertices",
    [
        ("chain", [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], list("abcde")),
        ("star", [("m", x) for x in "bcdefg"], list("mbcdefg")),
        ("two", [("a", "b"), ("c", "d")], list("abcdx")),
        ("singletons", [], list("abc")),
        ("cycle", [("a", "b"), ("b", "c"), ("c", "a")], list("abc")),
        ("dup-edges", [("a", "b"), ("b", "a"), ("a", "b")], list("ab")),
        ("self-loop", [("a", "a"), ("a", "b")], list("ab")),
    ],
)
def test_cc_golden(spark, name, edges, vertices):
    assert _run(spark, edges, vertices) == _oracle(edges, vertices)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_random_graph(spark, seed):
    rng = np.random.default_rng(seed)
    n = 200
    vertices = [f"v{i:04d}" for i in range(n)]
    m = int(rng.integers(50, 300))
    edges = [
        (vertices[int(rng.integers(n))], vertices[int(rng.integers(n))]) for _ in range(m)
    ]
    assert _run(spark, edges, vertices) == _oracle(edges, vertices)


@pytest.mark.parametrize("seed", [0, 1])
def test_cc_driver_fast_path_matches_distributed(spark, seed):
    """The size-adaptive driver union-find path must emit exactly the same
    assignments as the distributed star loop."""
    rng = np.random.default_rng(seed)
    n = 150
    vertices = [f"v{i:04d}" for i in range(n)]
    edges = [
        (vertices[int(rng.integers(n))], vertices[int(rng.integers(n))])
        for _ in range(int(rng.integers(40, 200)))
    ]
    distributed = _run(spark, edges, vertices, threshold=0)
    driver = _run(spark, edges, vertices, threshold=10_000_000)
    assert distributed == driver == _oracle(edges, vertices)


def test_cc_giant_component(spark):
    """Path graph of 300 nodes — worst case for naive label propagation;
    large-star/small-star must converge well under the iteration cap."""
    n = 300
    vertices = [f"v{i:04d}" for i in range(n)]
    edges = [(vertices[i], vertices[i + 1]) for i in range(n - 1)]
    res = _run(spark, edges, vertices)
    assert set(res.values()) == {"v0000"}


def test_cc_byte_gate_forces_distributed(spark, monkeypatch):
    """Long-URI ids must push CC off the driver fast path even when the edge
    COUNT is tiny: the gate is byte-estimated (cfg.cc_driver_max_bytes), not
    row-count-only. Both paths must agree with the oracle either way."""
    import dataclasses

    from dedup import components
    from dedup.config import DEFAULT

    calls = []
    orig = components._driver_union_find
    monkeypatch.setattr(
        components, "_driver_union_find", lambda e: calls.append(1) or orig(e)
    )
    long_a, long_b = "u" * 400 + "a", "u" * 400 + "b"
    e = spark.createDataFrame([(long_a, long_b)], "src string, dst string")
    v = spark.createDataFrame([(long_a,), (long_b,)], "image_id string")
    tiny = dataclasses.replace(DEFAULT, cc_driver_max_bytes=100)
    res = {
        r["image_id"]: r["cluster_id"]
        for r in components.connected_components(e, v, cfg=tiny).collect()
    }
    assert not calls, "driver path must be skipped when bytes exceed the cap"
    assert res == {long_a: long_a, long_b: long_a}
    # under the default cap the same graph takes the driver fast path
    res2 = {
        r["image_id"]: r["cluster_id"]
        for r in components.connected_components(e, v).collect()
    }
    assert calls and res2 == res
