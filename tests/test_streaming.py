"""Structured Streaming incremental dedup: drain a landing dir in micro
batches; later arrivals of known captions/bytes join existing clusters."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from dedup import synth
from dedup.streaming import incremental_dedup_stream


def test_incremental_dedup(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = synth.generate(120, seed=5)
    # batch 1: first 60 rows; batch 2: last 60 + exact copies of 5 early rows
    copies = []
    for i, r in enumerate(rows[:5]):
        c = dict(r)
        c["image_id"] = f"late{i:07d}"
        copies.append(c)
    pq.write_table(synth.to_arrow(rows[:60]), str(landing / "a.parquet"))

    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    # blocking waits: an availableNow query always terminates, and a timed
    # wait that expires would leave two queries sharing one checkpoint
    q = incremental_dedup_stream(spark, str(landing), wh, ckpt)
    q.awaitTermination()

    pq.write_table(synth.to_arrow(rows[60:] + copies), str(landing / "b.parquet"))
    q2 = incremental_dedup_stream(spark, str(landing), wh, ckpt)
    q2.awaitTermination()

    asg = spark.read.parquet(os.path.join(wh, "stream_assignments"))
    got = {r["image_id"]: r["cluster_id"] for r in asg.collect()}
    assert len(got) == 125
    # late exact copies joined the ORIGINAL rows' clusters
    for i, r in enumerate(rows[:5]):
        assert got[f"late{i:07d}"] == got[r["image_id"]]
    # viral caption rows share one cluster even across batches
    viral = [r["image_id"] for r in rows if r["_family"] == "viral"]
    assert len({got[v] for v in viral}) == 1


def test_untouched_buckets_survive_micro_batch(spark, tmp_path):
    """State I/O is O(touched buckets), not O(|state|): a second micro-batch
    adding ONE row must leave every untouched bucket's parquet files at their
    original paths with their original mtimes."""
    import json

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = synth.generate(200, seed=11)
    pq.write_table(synth.to_arrow(rows), str(landing / "a.parquet"))
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    incremental_dedup_stream(spark, str(landing), wh, ckpt).awaitTermination()

    man_path = os.path.join(wh, "stream_state", "_state_manifest.json")
    with open(man_path) as f:
        man1 = json.load(f)
    mtimes1 = {
        b: {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
        for b, d in man1["buckets"].items()
    }
    assert len(man1["buckets"]) > 4  # state actually spread over buckets

    one = dict(rows[0])
    one["image_id"] = "zlate000001"
    pq.write_table(synth.to_arrow([one]), str(landing / "b.parquet"))
    incremental_dedup_stream(spark, str(landing), wh, ckpt).awaitTermination()

    with open(man_path) as f:
        man2 = json.load(f)
    changed = [b for b in man1["buckets"] if man1["buckets"][b] != man2["buckets"].get(b)]
    # one row -> two keys -> at most 2 buckets rewritten
    assert 1 <= len(changed) <= 2
    for b, d in man1["buckets"].items():
        if b in changed:
            continue
        assert man2["buckets"][b] == d
        for f, m in mtimes1[b].items():
            assert os.path.getmtime(os.path.join(d, f)) == m, (b, f)
    # and the late copy joined the original row's cluster
    asg = spark.read.parquet(os.path.join(wh, "stream_assignments"))
    got = {r["image_id"]: r["cluster_id"] for r in asg.collect()}
    assert got["zlate000001"] == got[rows[0]["image_id"]]


def test_corrupt_state_raises_not_resets(spark, tmp_path):
    """A state dir the manifest references that cannot be read must RAISE —
    treating it as empty would silently re-root every known cluster."""
    import shutil

    import pytest

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = synth.generate(50, seed=13)
    pq.write_table(synth.to_arrow(rows), str(landing / "a.parquet"))
    wh = str(tmp_path / "wh")
    incremental_dedup_stream(spark, str(landing), wh, str(tmp_path / "c1")).awaitTermination()

    import json

    with open(os.path.join(wh, "stream_state", "_state_manifest.json")) as f:
        man = json.load(f)
    # destroy one referenced bucket dir
    victim = next(iter(man["buckets"].values()))
    shutil.rmtree(victim)

    pq.write_table(synth.to_arrow(rows), str(landing / "b.parquet"))
    q = incremental_dedup_stream(spark, str(landing), wh, str(tmp_path / "c2"))
    with pytest.raises(Exception, match="PATH_NOT_FOUND|StreamingQueryException|does not exist"):
        q.awaitTermination()
