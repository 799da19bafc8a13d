"""Viral-family skew bench for the reps stage (r03 judge item 1 'Done').

Builds a 360k-row keys-shaped table where ONE caption covers 5% of rows
(the viral family the pipeline is designed around — at 100 TB that key is
terabytes in one group), then times the exact-collapse member-edge build in
both shapes:

  window   min().over(Window.partitionBy(kind, k)) — the pre-r04 shape:
           each key group materializes in ONE task, so the viral key is a
           single-task straggler;
  groupby  groupBy(kind, k).agg(min) + join-back with deterministic
           hot-key broadcast routing (exact_member_edges) — AQE's skew
           split was MEASURED unable to fire on this plan family (see the
           exact_member_edges docstring / PLANS.md round-4 notes), hence
           the explicit routing.

The bench emulates the at-scale regime, where median shuffle partitions are
small but a hot key cannot be split: shuffle partitions are set high
(cores*16) so a median task holds ~rows/(cores*16) rows while the window's
hot (kind, k) partition holds all viral rows in ONE task; the AQE byte
knobs are scaled down to bench bytes so coalescing behaves as the defaults
would against 100 TB partitions. Captions carry a ~200 B payload so
partition weight is bytes, not just row count.

Task-time spread comes from the Spark UI REST API (enabled just for this
bench): for each run we report the stage with the LONGEST single task —
that is where a straggler lives. A straggler shows up as max >> median
under `window` and gone under `groupby`. Usage:

    python bench/reps_skew.py [rows] [viral_share] [cores]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def task_spread(ui_port: int, app_id: str, min_submit_ms: float) -> dict:
    """Across all stages completed since min_submit_ms, find the one holding
    the LONGEST single task (a straggler, if any) and report its spread."""
    base = f"http://127.0.0.1:{ui_port}/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=COMPLETE"))
    recent = [
        s for s in stages
        if s.get("firstTaskLaunchedTime")
        and _ms(s["firstTaskLaunchedTime"]) >= min_submit_ms
        and s.get("numCompleteTasks", 0) >= 2
    ]
    worst = {}
    for s in recent:
        q = json.load(urllib.request.urlopen(
            f"{base}/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
            "?quantiles=0.5,0.95,1.0"
        ))
        med, p95, mx = (round(v / 1000.0, 2) for v in q["executorRunTime"])
        if mx > worst.get("task_sec_max", -1.0):
            worst = {
                "stage_id": s["stageId"],
                "num_tasks": s["numCompleteTasks"],
                "task_sec_median": med,
                "task_sec_p95": p95,
                "task_sec_max": mx,
                "straggler_ratio": round(mx / med, 1) if med else None,
            }
    return worst


def _ms(iso: str) -> float:
    from datetime import datetime, timezone

    return datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%f%Z").replace(
        tzinfo=timezone.utc
    ).timestamp() * 1000


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 360_000
    shares = (
        [float(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [0.05, 0.25, 0.5]
    )
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import Window, functions as F

    from dedup.pipeline import exact_member_edges
    from dedup.session import get_spark

    spark = get_spark(
        "reps-skew",
        cores=cores,
        # at-scale regime: median shuffle partition is SMALL next to the hot
        # key's group; AQE byte knobs scaled to bench bytes so coalescing /
        # skew split behave as the defaults would against 100 TB partitions
        shuffle_partitions=cores * 16,
        extra={
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "4m",
            "spark.sql.autoBroadcastJoinThreshold": "4m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    # actual bound UI port — 4040 may be taken by another driver on this
    # shared host, in which case Spark binds 4041+ and a hardcoded port
    # would query a different application's REST API
    ui_port = int((spark.sparkContext.uiWebUrl or "http://x:4040").rsplit(":", 1)[1])

    def make_keys(share: float):
        # keys-shaped table, generated JVM-side: `share` of rows carry ONE
        # viral caption (padded to ~200 B so partition weight is bytes, like
        # the real caption column); the rest are near-unique captions +
        # phash families.  repartition before checkpoint: the pipeline reads
        # `keys` from a committed parquet stage with data-sized splits.
        viral_n = int(rows * share)
        pad = "repeat(' filler', 28)"
        k = spark.range(rows).selectExpr(
            "concat('img', lpad(cast(id as string), 10, '0')) AS image_id",
            "md5(cast(id as string)) AS sha",
            f"CASE WHEN id < {viral_n} THEN concat('one viral caption', {pad}) "
            f"ELSE concat('caption ', cast(id % 200000 as string), {pad}) END AS caption",
            "cast(pmod(id, 90000) as long) AS phash",
        ).repartition(cores * 4).localCheckpoint()
        k.count()
        return k

    def window_shape(k):
        exploded = k.select(
            "image_id",
            F.expr(
                "explode(array("
                "struct('exact' AS kind, concat_ws('|', sha, caption) AS k), "
                "struct('minhash' AS kind, caption AS k), "
                "struct('simhash' AS kind, CAST(phash AS STRING) AS k)))"
            ).alias("e"),
        ).select("image_id", F.col("e.kind").alias("kind"), F.col("e.k").alias("k"))
        w = Window.partitionBy("kind", "k")
        return (
            exploded.select(
                F.min("image_id").over(w).alias("id_a"),
                F.col("image_id").alias("id_b"),
                F.col("kind").alias("match_type"),
                F.lit(1.0).alias("score"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
        )

    # Sweep the viral share: the straggler LAW, not one noisy sample.  The
    # window shape's longest task owns the whole hot key, so its max task
    # time grows ~linearly with the share; the groupby shape has no task
    # whose size depends on the share (partial agg map-side, skew-split
    # join), so its max task stays flat.
    out = {"rows": rows, "cores": cores, "legs": []}
    for share in shares:
        keys = make_keys(share)
        leg = {"viral_share": share, "shapes": {}}
        # hot_key_rows scaled to bench size (production default 1M tracks a
        # ~250 MB single-task group; here the viral families are 100k-1M
        # rows, so the demo dial sits at 100k to exercise the routing)
        def routed(k):
            return exact_member_edges(k, hot_key_rows=100_000)

        for name, builder in (("window", window_shape), ("groupby", routed)):
            t_mark = time.time() * 1000
            t0 = time.time()
            n = builder(keys).count()
            wall = round(time.time() - t0, 2)
            spread = task_spread(ui_port, app_id, t_mark)
            leg["shapes"][name] = {"wall_sec": wall, "edges": n, **spread}
            print(f"# share={share} {name}: {wall}s ({n} edges) {spread}", file=sys.stderr)
        a, b = leg["shapes"]["window"], leg["shapes"]["groupby"]
        assert a["edges"] == b["edges"], "shape parity broken"
        out["legs"].append(leg)
        keys.unpersist()
    lo, hi = out["legs"][0], out["legs"][-1]
    out["max_task_growth"] = {
        name: round(
            hi["shapes"][name]["task_sec_max"] / lo["shapes"][name]["task_sec_max"], 2
        )
        for name in ("window", "groupby")
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
