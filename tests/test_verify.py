"""Verify-stage unit tests: suffix-array substring pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup.verify import _suffix_array, substring_edges, substring_hits_in_container


def test_suffix_array_sorted():
    s = "banana"
    sa = _suffix_array(s)
    suf = [s[i:] for i in sa]
    assert suf == sorted(suf)


def test_substring_hits_golden():
    container = "the harbor crane overlooks the winter canal at dusk"
    needles = [
        "overlooks the winter canal",  # present
        "the winter canal",            # present
        "harbor crane x",              # absent
        "dusk",                        # present (suffix)
        "the harbor",                  # present (prefix)
        "zzz",                         # absent
    ]
    assert substring_hits_in_container(container, needles) == [
        True, True, False, True, True, False,
    ]


def test_substring_edges_spark(spark):
    rows = [
        ("a", "the harbor crane overlooks the winter canal at dusk"),
        ("b", "overlooks the winter canal"),          # fragment of a (26 chars)
        ("c", "entirely different caption here ok"),
        ("d", "the winter canal"),                    # 16 chars — below min_len
        ("e", "The Harbor Crane Overlooks the winter canal at dusk"),  # case-equal to a
    ]
    df = spark.createDataFrame(rows, "rep_id string, caption string")
    out = substring_edges(df).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert ("a", "b") in pairs
    assert ("a", "e") in pairs  # case-insensitive equality
    assert ("b", "e") in pairs  # b is a fragment of e too
    assert all(r["match_type"] == "substring" and r["score"] == 1.0 for r in out)
    assert not any("d" in p or "c" in p for p in pairs)
