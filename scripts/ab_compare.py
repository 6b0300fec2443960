"""Paired same-epoch A/B bench: two source trees, one workload.

    python scripts/ab_compare.py --tree-a /tmp/r3tree --tree-b /root/repo \
        --queries knn,pip_join,ann_bruteforce --cycles 6

Why this exists: this host's multi-minute ±30-40% multiplicative noise
epochs make pooled round-over-round comparisons meaningless (the
round-2..4 verdicts each flagged phantom regressions).  The only
trustworthy estimator here is the PAIRED one bench.py already uses for
scaling legs: both legs of a cycle run back-to-back (so they share the
epoch), leg order alternates across cycles (so a slow epoch cannot hit
one leg systematically), and the reported number is the median of the
per-cycle wall ratios.  A real regression shows up as a ratio
consistently away from 1.0; epoch noise cancels in the ratio.

Each leg is a fresh subprocess (own JVM) whose sys.path[0] is the leg's
source tree; inside the leg every query runs REPS times and the min is
taken (drops one-time Janino codegen, symmetric across legs).  Both
legs read the same cached parquet inputs, so only the code differs.

Prints ONE JSON line:
  {"queries": {q: {"ratio_median_a_over_b": r, "cycle_ratios": [...],
                   "walls_a": [...], "walls_b": [...]}}, ...}
ratio > 1 means tree B is faster.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

LEG_SCRIPT = r"""
import json, os, sys, time
tree = sys.argv[1]
queries = sys.argv[2].split(",")
reps = int(sys.argv[3])
sys.path.insert(0, tree)
from pyspark.sql import functions as F
from zellige_spark.session import get_spark
from zellige_spark import synth
from zellige_spark.operators import knn as KNN
from zellige_spark.operators import pip as PIP
from zellige_spark.operators import tiles as T
from zellige_spark.operators import encode as E
from zellige_spark import queries as Q

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "300000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/zellige_bench")

spark = get_spark(app="ab-leg", master=f"local[{CPUS}]")
spark.sparkContext.setLogLevel("ERROR")
images = spark.read.parquet(
    os.path.join(CACHE_DIR, f"images_n{N_IMAGES}_seed42.parquet"))
pts = images.select("image_id", "lon", "lat")
pts.count()
polys = synth.coverage_polygons_df(spark, 2000).cache(); polys.count()
centers = synth.cluster_centers()
knn_q = spark.createDataFrame(
    [(f"q{i}", float(centers[i % len(centers)][0] + 0.001 * i),
      float(centers[i % len(centers)][1])) for i in range(100)],
    "query_id string, lon double, lat double")

WORK = {
    "knn": lambda: KNN.knn_kring(knn_q, pts, k=10, index_zoom=6,
                                 max_ring=2, data_id="image_id").count(),
    "pip_join": lambda: PIP.pip_join_broadcast(pts, polys).count(),
    "ann_bruteforce": lambda: Q.QUERIES["ann_bruteforce"](spark, SF_DIR).count(),
    "assign_z0_14": lambda: T.assign_tiles(pts, range(0, 15)).count(),
    "encode_z0_14": lambda: E.assemble_point_tiles_streaming(
        T.assign_tiles_buffered(pts, zooms=range(0, 15))).agg(
            F.count(F.lit(1))).collect(),
}
out = {}
for q in queries:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        WORK[q]()
        walls.append(round(time.perf_counter() - t0, 3))
    out[q] = walls
print("LEGJSON " + json.dumps(out))
spark.stop()
"""


def run_leg(tree: str, queries: str, reps: int, script_path: str) -> dict:
    # cwd AND PYTHONPATH point at the leg's tree so the driver and the
    # pickled-by-reference UDF imports on Spark's python workers both
    # resolve the SAME source tree (workers do not see driver sys.path)
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    res = subprocess.run([sys.executable, script_path, tree, queries, str(reps)],
                         capture_output=True, text=True, timeout=1800,
                         cwd=tree, env=env)
    for line in res.stdout.splitlines():
        if line.startswith("LEGJSON "):
            return json.loads(line[len("LEGJSON "):])
    raise RuntimeError(f"leg failed for {tree}:\n{res.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True, help="source tree A (e.g. the old round)")
    ap.add_argument("--tree-b", required=True, help="source tree B (e.g. HEAD)")
    ap.add_argument("--queries", default="knn,pip_join,ann_bruteforce")
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(LEG_SCRIPT)
        script_path = f.name
    try:
        walls = {"a": {}, "b": {}}
        cycle_ratios: dict[str, list] = {}
        for cycle in range(args.cycles):
            order = ["a", "b"] if cycle % 2 == 0 else ["b", "a"]
            cycle_min = {}
            for leg in order:
                tree = args.tree_a if leg == "a" else args.tree_b
                res = run_leg(tree, args.queries, args.reps, script_path)
                cycle_min[leg] = {q: min(w) for q, w in res.items()}
                for q, w in res.items():
                    walls[leg].setdefault(q, []).extend(w)
            for q in cycle_min["a"]:
                cycle_ratios.setdefault(q, []).append(
                    round(cycle_min["a"][q] / cycle_min["b"][q], 3))
            print(f"cycle {cycle}: " + json.dumps(
                {q: cycle_ratios[q][-1] for q in cycle_ratios}), file=sys.stderr)
        summary = {}
        for q, ratios in cycle_ratios.items():
            summary[q] = {
                "ratio_median_a_over_b": round(statistics.median(ratios), 3),
                "cycle_ratios": ratios,
                "walls_a": walls["a"][q],
                "walls_b": walls["b"][q],
            }
        print(json.dumps({"queries": summary,
                          "tree_a": args.tree_a, "tree_b": args.tree_b,
                          "cycles": args.cycles, "reps": args.reps}))
    finally:
        os.unlink(script_path)


if __name__ == "__main__":
    main()
