"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Times individual queries()/operator entries with the same methodology as
bench.py (ISS_BENCH_CACHE=1 pins base tables, warmup pass, min-of-N of
``df.count()``), optionally at a different data directory, and can dump
``explain("formatted")`` plans to plans/r06/.

Usage:
  python bench_extra.py --sf DIR --reps 3 q1 q2 ...      # time queries
  python bench_extra.py --sf DIR --explain OUTDIR q1 ... # dump plans only
  python bench_extra.py --sf DIR --noop q1 ...           # noop sink timing
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    explain_dir = None
    noop = False
    suffix = ""
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--noop":
            noop = True; i += 1
        else:
            names.append(a); i += 1

    os.environ["ISS_BENCH_CACHE"] = "1"
    from incubator_sedona_spark.session import get_spark

    spark = get_spark(
        app_name="iss-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    import __spark_entry__ as E
    from incubator_sedona_spark.pipeline import dedup as _DD

    qs = E.queries()
    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(explain_dir, f"{name}{suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"wrote {out}")
            _DD.release_cached()
        spark.stop()
        return

    def run(name: str) -> None:
        df = qs[name](spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        _DD.release_cached()

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        t0 = time.time()
        run(name)
        warm = time.time() - t0
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{r}")
            t0 = time.time()
            run(name)
            samples.append(round(time.time() - t0, 3))
        results[name] = {
            "min": min(samples),
            "samples": samples,
            "warmup": round(warm, 3),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf": sf_dir, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
