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
