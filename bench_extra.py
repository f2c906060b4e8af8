"""Round-6 optimization measurement harness (bench.py stays frozen).

Times individual headline queries with the noop sink (guide §1.4), with
the same median-of-interleaved-passes discipline as bench.py, and dumps
``explain("formatted")`` for each query to plans/r06/.

Usage:
  python bench_extra.py [--sf-dir DIR] [--reps N] [--plans SUFFIX] [q ...]

With ``--plans before`` it writes plans/r06/<query>_before.txt for each
selected query (no timing).  Without it, prints one JSON line of medians.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, _force, _median  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="write plans/r06/<q>_<SUFFIX>.txt instead of timing")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from warcit_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("warcit-spark-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = args.names or HEADLINE

    if args.plans:
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(outdir, f"{name}_{args.plans}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
        spark.stop()
        return

    # untimed warmup (JIT/codegen) on the first selected query
    spark.sparkContext.setJobDescription(f"warmup:{names[0]}")
    _force(qs[names[0]](spark, args.sf_dir))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(max(1, args.reps)):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.perf_counter()
            _force(qs[name](spark, args.sf_dir))
            samples[name].append(round(time.perf_counter() - t0, 3))
    med = {n: round(_median(v), 3) for n, v in samples.items()}
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "total_median_sum": round(sum(med.values()), 3),
        "medians": med,
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
