"""One cold-JVM run of the full flagship pipeline at a given
parallelism — the measurement unit for the scaling protocol
(BASELINE.md: same job, same input, local[8] vs local[32]).

Pipeline: read cached image table -> tile assignment zooms 0-14
(Column math) -> PIP join vs 2000 coverage polygons -> buffered
assignment + streaming MVT encode across zooms 0-14.

Prints one JSON line with phase walls and totals.  Table generation is
cached on disk and excluded from timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zellige_spark import synth  # noqa: E402
from zellige_spark.operators import encode as E  # noqa: E402
from zellige_spark.operators import pip as PIP  # noqa: E402
from zellige_spark.operators import tiles as T  # noqa: E402
from zellige_spark.session import get_spark  # noqa: E402

CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/zellige_bench")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--repeat", type=int, default=1,
                    help="in-JVM repetitions; first is cold, min is steady-state")
    ap.add_argument("--warmup-rows", type=int, default=0,
                    help="if >0, run the full pipeline once UNTIMED on a "
                         "table of this size first: compiles every codegen "
                         "stage + JIT so all timed reps are warm")
    ap.add_argument("--wall-phases", default="pip,encode",
                    help="comma list of phases included in the measured "
                         "wall (and executed per rep).  'encode' alone is "
                         "the BASELINE.json metric workload (buffered tile "
                         "assignment + streaming MVT encode); 'pip,encode' "
                         "adds the broadcast PIP join for the full-pipeline "
                         "view")
    args = ap.parse_args()
    phases = [p.strip() for p in args.wall_phases.split(",") if p.strip()]

    # fixed partitioning across core counts (as on a real cluster: the
    # layout stays, executor count varies) so the scaling measurement
    # compares compute, not plan shape
    spark = get_spark(app=f"scaling-{args.cores}", master=f"local[{args.cores}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(CACHE_DIR, f"images_n{args.rows}_seed42.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth.images_df(spark, args.rows).write.mode("overwrite").parquet(path)
    pts = spark.read.parquet(path).select("image_id", "lon", "lat")
    pts.count()  # warm file listing; JVM still cold for the measured work
    polys = synth.coverage_polygons_df(spark, 2000).cache()
    polys.count()
    # assignment-only throughput, measured ONCE as setup: its work is
    # re-executed inside the encode action (buffered assignment), so a
    # standalone per-rep count action would only add per-action fixed
    # cost — pure Amdahl serial term — to every measured repetition
    ta = time.perf_counter()
    n_assigned = T.assign_tiles(pts, range(0, 15)).count()
    assign_sec = round(time.perf_counter() - ta, 3)

    if args.warmup_rows:
        wpath = os.path.join(CACHE_DIR, f"images_n{args.warmup_rows}_seed42.parquet")
        if not os.path.exists(os.path.join(wpath, "_SUCCESS")):
            synth.images_df(spark, args.warmup_rows).write.mode("overwrite").parquet(wpath)
        wpts = spark.read.parquet(wpath).select("image_id", "lon", "lat")
        if "pip" in phases:
            PIP.pip_join_broadcast(wpts, polys).count()
        (E.assemble_point_tiles_streaming(
            T.assign_tiles_buffered(wpts, zooms=range(0, 15)))
         .agg(F.count(F.lit(1)), F.sum("feature_count"), F.sum("bytes_len")).collect())

    runs = []
    n_pip = None
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        if "pip" in phases:
            n_pip = PIP.pip_join_broadcast(pts, polys).count()
        t1 = time.perf_counter()
        assigned = T.assign_tiles_buffered(pts, zooms=range(0, 15))
        row = (E.assemble_point_tiles_streaming(assigned)
               .agg(F.count(F.lit(1)), F.sum("feature_count"), F.sum("bytes_len")).collect()[0])
        t2 = time.perf_counter()
        runs.append({"wall_sec": round(t2 - t0, 3),
                     "phases": {"pip": round(t1 - t0, 3),
                                "encode": round(t2 - t1, 3)}})

    best = min(r["wall_sec"] for r in runs)
    print(json.dumps({
        "cores": args.cores,
        "rows": args.rows,
        "wall_phases": phases,
        "wall_sec": best,
        "wall_cold_sec": runs[0]["wall_sec"],
        "runs": runs,
        "images_assigned": n_assigned,
        "assign_sec_cold": assign_sec,
        "pip_matches": n_pip,
        "tiles_encoded": int(row[0]),
        "tile_features": int(row[1]),
        "mvt_bytes": int(row[2]),
        "tiles_per_sec": round(row[0] / min(r["phases"]["encode"] for r in runs)),
        "rows_per_sec": round(args.rows / best),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
