"""Verify-stage unit tests: suffix-array substring pass golden cases."""

from __future__ import annotations

from dedup.verify import substring_pairs_in_group, _suffix_array


def test_suffix_array_sorted():
    s = "banana"
    sa = _suffix_array(s)
    suf = [s[i:] for i in sa]
    assert suf == sorted(suf)


def test_substring_pairs_golden():
    ids = ["a", "b", "c", "d"]
    caps = [
        "the harbor crane overlooks the winter canal at dusk",
        "overlooks the winter canal",  # 26-char fragment of a
        "entirely different caption here",
        "the winter canal",  # only 16 chars — below min_len
    ]
    pairs = substring_pairs_in_group(ids, caps, 20)
    assert pairs == [("a", "b")]


def test_substring_case_insensitive_and_multi():
    ids = ["x", "y", "z"]
    caps = [
        "The Lantern Festival Crosses A Gravel Path Before Sunrise",
        "lantern festival crosses a gravel",
        "crosses a gravel path before sunrise",
    ]
    pairs = substring_pairs_in_group(ids, caps, 20)
    assert ("x", "y") in pairs and ("x", "z") in pairs


def test_substring_identical_captions():
    # identical captions contain each other; pair emitted once, ordered
    pairs = substring_pairs_in_group(["b", "a"], ["same caption twenty chars!"] * 2, 20)
    assert pairs == [("a", "b")]
