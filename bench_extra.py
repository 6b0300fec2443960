"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Times every registered query against $SPARK_GRAFT_SF_DIR with the noop
sink (guide §1.4: forces every column of every row, no sink cost, full
plan in the SQL tab) and optionally dumps .explain("formatted") per
query to plans/r06/.

Usage:
  python bench_extra.py [--sf-dir DIR] [--reps N] [--plans DIR]
                        [--only q1,q2,...] [--skip q1,...]
Prints one JSON line: {"sf_dir":..., "reps":N, "queries": {name: min_sec}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zellige_spark.session import get_spark  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>.txt formatted plans")
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip", default=None)
    args = ap.parse_args()

    spark = get_spark(app="zellige-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    from zellige_spark import queries as Q

    names = list(Q.QUERIES)
    if args.only:
        keep = args.only.split(",")
        unknown = set(keep) - set(names)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        names = keep
    if args.skip:
        drop = set(args.skip.split(","))
        names = [n for n in names if n not in drop]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    for name in names:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls = []
        try:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                df = fn(spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 3))
            timings[name] = min(walls)
            if args.plans:
                df = fn(spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                    fh.write(plan)
        except Exception as exc:  # keep surveying
            errors[name] = f"{type(exc).__name__}: {exc}"
            traceback.print_exc(file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)
        print(f"{name:28s} {timings.get(name, 'ERR')}", file=sys.stderr)

    out = {"sf_dir": args.sf_dir, "reps": args.reps,
           "total": round(sum(timings.values()), 3), "queries": timings}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
