"""Scaling-efficiency evidence: run the SAME dedup job at local[N] and
local[4N] on the SAME synthetic input (sandbox proxy for N vs 4N executors,
per BASELINE.json / SURVEY.md §6) and report throughput at both plus
efficiency = (T_N / T_4N) / 4.

Each run is a fresh subprocess (fresh JVM) so the two measurements don't
share executors, caches, or JIT state. Default N=2 (vs 8): this box reports
32 vCPUs but saturates at ~16 physical cores' throughput (see the cpu_probe
in the output — pure-CPU multiprocessing tops out ~6M hashes/s from 16
workers up), so 8->32 measures hyperthread contention, not cluster scaling;
2->8 is the hardware-linear region. The 8->32 leg is still REPORTED (pass a
comma list of Ns) so the high-parallelism shuffle/skew behavior is
quantified next to the hardware ceiling that bounds it. Usage:

    python bench/scaling.py [rows] [N[,N2,...]] [min_px] [max_px]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SNIPPET = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from dedup.session import get_spark
from dedup.pipeline import Pipeline
spark = get_spark("scale-{cores}", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
images = spark.read.parquet({img!r})
images.count()  # warm the input file cache out of the timed region
wh = "/tmp/scale_wh_{cores}"
shutil.rmtree(wh, ignore_errors=True)
t0 = time.time()
n = Pipeline(wh).run(spark, images).count()
wall = time.time() - t0
print(json.dumps({{"cores": {cores}, "wall_sec": round(wall, 2),
                   "rows": n, "images_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def cpu_probe() -> dict:
    """Hardware ceiling: pure-CPU multiprocessing throughput at each level."""
    import hashlib
    import multiprocessing as mp
    import time

    def burn(n):
        h = b"x" * 1024
        for _ in range(n):
            h = hashlib.sha256(h).digest() + b"y" * 992
        return 1

    out = {}
    for workers, per in [(2, 200000), (8, 50000), (32, 12500)]:
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_BURN, [per] * workers)
        out[f"hashes_per_sec_{workers}w"] = round(workers * per / (time.time() - t0))
    return out


def _BURN(n):
    import hashlib

    h = b"x" * 1024
    for _ in range(n):
        h = hashlib.sha256(h).digest() + b"y" * 992
    return 1


def run_at(cores: int, img: str) -> dict:
    code = _RUN_SNIPPET.format(repo=REPO, cores=cores, img=img)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"run at {cores} cores failed:\n{out.stderr[-2000:]}")


def run_leg(n_cores: int, img: str, rows: int, repeats: int) -> dict:
    """One N -> 4N leg: interleaved repeats, per-leg minimum wall."""
    lo_runs, hi_runs = [], []
    for r in range(repeats):
        lo_runs.append(run_at(n_cores, img))
        hi_runs.append(run_at(n_cores * 4, img))
        print(
            f"# leg {n_cores}->{n_cores * 4} round {r}: "
            f"N={lo_runs[-1]['wall_sec']}s 4N={hi_runs[-1]['wall_sec']}s",
            file=sys.stderr,
        )
    lo = min(lo_runs, key=lambda d: d["wall_sec"])
    hi = min(hi_runs, key=lambda d: d["wall_sec"])
    eff = (lo["wall_sec"] / hi["wall_sec"]) / 4
    return {
        "repeats": repeats,
        "N": lo,
        "fourN": hi,
        "all_walls": {
            "N": [d["wall_sec"] for d in lo_runs],
            "fourN": [d["wall_sec"] for d in hi_runs],
        },
        "speedup": round(lo["wall_sec"] / hi["wall_sec"], 2),
        "efficiency": round(eff, 3),
    }


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 240000
    n_list = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "2").split(",")]
    min_px = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    max_px = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    img = f"/tmp/bench_images_{rows}_{min_px}x{max_px}"
    if not os.path.exists(img):
        sys.path.insert(0, REPO)
        from dedup import synth

        print(f"# generating {rows} synthetic rows ({min_px}-{max_px}px)...", file=sys.stderr)
        synth.write_parquet_dir(img, rows, seed=42, min_px=min_px, max_px=max_px)

    # the sandbox host is SHARED (cpu steal fluctuates run to run), so legs
    # are interleaved and repeated; the per-leg minimum wall is the measure —
    # standard practice for noisy-host benchmarking
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    legs = {
        f"{n}to{n * 4}": run_leg(n, img, rows, repeats) for n in n_list
    }
    first = legs[f"{n_list[0]}to{n_list[0] * 4}"]
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_NtoFourN",
                "rows": rows,
                "px": [min_px, max_px],
                # top-level fields mirror the FIRST leg (the hardware-linear
                # region that evidences the gate); extra legs quantify the
                # high-parallelism regime against the cpu_probe ceiling
                **{k: first[k] for k in ("repeats", "N", "fourN", "all_walls", "speedup", "efficiency")},
                "gate": 0.8,
                "pass": first["efficiency"] >= 0.8,
                "legs": legs,
                "cpu_probe": cpu_probe(),
            }
        )
    )


if __name__ == "__main__":
    main()
