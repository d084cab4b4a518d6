"""Per-query measurement harness for the optimization round (guide §1).

NOT the frozen driver bench (`bench.py`). This tool:
  - times any subset of declared queries at any SF with the same
    collect() methodology as bench.py (default), or with a noop sink
    (`--noop`) to isolate computation from result transfer (guide §1.4);
  - captures `.explain("formatted")` per query into plans/r06/ when asked
    (`--explain before|after`);
  - labels every job (`setJobDescription`) so the UI/event log is readable.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --n 1 q1 q2 ...
  python bench_extra.py --explain before embedding_neardup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_DIR)

import __spark_entry__ as entrymod  # noqa: E402
from fairtracks_validator_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3, help="best-of-N repeats")
    ap.add_argument("--noop", action="store_true",
                    help="noop sink instead of collect()")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--explain", choices=["before", "after"], default=None,
                    help="write plans/r06/<name>_<phase>.txt")
    args = ap.parse_args()

    spark = get_spark(app_name="ftval-bench-extra")
    qs = entrymod.queries()
    names = args.names or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf
    if not args.no_warmup:
        spark.range(100000).selectExpr("sum(id)").collect()
        for name in names:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            qs[name](spark, warm_dir).collect()

    if args.explain:
        os.makedirs(os.path.join(REPO_DIR, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            p = os.path.join(REPO_DIR, "plans", "r06",
                             f"{name}_{args.explain}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            print(f"wrote {p}")

    if args.n <= 0:
        return
    times: dict[str, float] = {}
    for name in names:
        best = None
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
        times[name] = round(best, 3)
        print(f"{best:8.3f}  {name}", flush=True)

    print(json.dumps({"sf": args.sf, "n": args.n,
                      "noop": args.noop, "queries": times,
                      "total": round(sum(times.values()), 3)}))


if __name__ == "__main__":
    main()
