"""End-to-end curation job (jobs/curate.py): quality filter ->
decontamination -> semantic dedup, run as a real subprocess (own
SparkSession, the spark-submit code path minus the JVM re-ship that
tests/test_spark_submit.py already covers)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write(tmp_path):
    docs, emb = [], []
    for i in range(10):  # 10 clean docs, every word unique per doc (so the
        # benchmark fragment cut from doc 3 flags doc 3 only); doc 5 carries
        # a planted email for the --redact-pii stage
        extra = " mail w5pii@example.com end" if i == 5 else ""
        docs.append((i, " ".join(f"w{i}t{j}" for j in range(13)) + extra))
        v = [0.0] * 8
        v[i % 8] = 1.0
        v[(i + 3) % 8] = 0.5 if i >= 8 else 0.0  # ids 8,9 distinct from 0,1
        emb.append((i, [float(x) for x in v]))
    # docs 1 and 2: byte-different text, IDENTICAL embedding -> semantic
    # dups (e_1-based so neither collides with doc 0's e_0 or doc 9's
    # e_1 + 0.5*e_4: cos(doc1, doc9) = 1/(sqrt(1.01)*sqrt(1.25)) ~ 0.89)
    emb[1] = (1, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1])
    emb[2] = (2, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1])
    for i in range(10, 15):  # repetition spam: dup_word_frac ~0.95
        docs.append((i, " ".join(["spam"] * 20)))
    # doc 15: clean text, embedding IDENTICAL to doc 4's -> semantic dup
    # cluster {4, 15} spans id digit lengths: STRING-min is "15" but the
    # numeric min is 4 — regression pin for the zero-padding in curate.py
    # (unpadded ids would keep 15 and drop 4)
    docs.append((15, " ".join(f"w15t{j}" for j in range(13))))
    v15 = [0.0] * 8
    v15[4 % 8] = 1.0
    emb.append((15, [float(x) for x in v15]))
    d = str(tmp_path / "docs.parquet")
    e = str(tmp_path / "emb.parquet")
    b = str(tmp_path / "bench.parquet")
    pq.write_table(pa.table({"doc_id": [x[0] for x in docs],
                             "text": [x[1] for x in docs]}), d)
    pq.write_table(pa.table({"vec_id": [x[0] for x in emb],
                             "embedding": pa.array([x[1] for x in emb],
                                                   pa.list_(pa.float32()))}), e)
    # benchmark fragment = words 2-11 of doc 3 -> shares 8-grams with it
    frag = " ".join(docs[3][1].split(" ")[1:11])
    pq.write_table(pa.table({"bench_id": ["b1"], "fragment": [frag]}), b)
    return d, e, b


def test_curate_job_end_to_end(tmp_path):
    d, e, b = _write(tmp_path)
    out = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--documents", d, "--output", out, "--benchmark", b,
         "--embeddings", e, "--cores", "4",
         "--cosine-threshold", "0.95", "--nprobe", "auto", "--redact-pii"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    m = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert m["rows_in"] == 16
    assert m["after_quality"] == 11            # 5 spam docs dropped
    assert m["after_decontamination"] == 10    # doc 3 contaminated
    assert m["after_semantic_dedup"] == 8      # dups of docs 1 and 4 dropped
    assert m["rows_out"] == 8
    got = pq.read_table(out).to_pydict()
    kept = sorted(got["doc_id"])
    # min-NUMERIC-id exemplars kept: 1 (not 2) and 4 (not 15 — the {4, 15}
    # cluster is the digit-length trap: string-min would keep "15")
    assert kept == [0, 1, 4, 5, 6, 7, 8, 9]
    # quality stats ride along; every kept exemplar carries its cluster id
    assert "dup_word_frac" in got and "cluster_id" in got
    by_cluster = dict(zip(got["doc_id"], got["cluster_id"]))
    assert by_cluster[4] == 4 and by_cluster[1] == 1  # numeric, not padded
    # --redact-pii: doc 5's planted email is a placeholder in the output
    by_id = dict(zip(got["doc_id"], got["text"]))
    assert "<EMAIL>" in by_id[5] and "@example.com" not in by_id[5]
    assert dict(zip(got["doc_id"], got["n_emails"]))[5] == 1
