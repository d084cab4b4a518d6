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
    ap.add_argument("--skew", action="store_true",
                    help="run the Zipfian skew probes instead of queries")
    args = ap.parse_args()

    spark = get_spark(app_name="ftval-bench-extra")
    if args.skew:
        print(json.dumps(skew_probe(spark)))
        return
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




def skew_probe(spark, rows: int = 4_000_000) -> dict:
    """VERDICT r5 #3: Zipfian stress for the shuffle-keyed paths.

    - ``pages_validation_skewed``: 30% of rows share ~100 hot uniqueness
      keys (hot-domain re-uploads), the rest keep their unique url — the
      first-writer-wins shuffle sees 12k-row hot keys instead of ~1-row
      keys.
    - ``line_dedup_skewed``: a 5k-doc corpus where 30% of lines are one of
      8 boilerplate lines (cookie banners) — hot line digests.

    Run via: python bench_extra.py --skew
    """
    import time

    from pyspark.sql import functions as F

    from fairtracks_validator_spark.operators.lines import dedup_lines_text
    from fairtracks_validator_spark.plans.schema_compile import compile_schema
    from fairtracks_validator_spark.runner import sink_observed, validate_corpus
    from fairtracks_validator_spark.sources.pages import pages, pages_schema_dict

    out = {}
    base = pages(spark, rows)
    plan = compile_schema(pages_schema_dict())

    def run_pages(df, tag):
        df = df.withColumn("ord", F.col("page_id"))
        best = None
        for _ in range(3):
            t0 = time.time()
            sink_observed(validate_corpus({"pages/1.0": (plan, df)}))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[tag] = round(best, 3)

    uniform = base.withColumn("source", F.col("url"))
    path_u = os.path.join(REPO_DIR, ".data", f"skew_uniform_{rows}.parquet")
    if not os.path.exists(os.path.join(path_u, "_SUCCESS")):
        uniform.write.mode("overwrite").parquet(path_u)
    run_pages(spark.read.parquet(path_u), "pages_validation_uniform")

    skewed = base.withColumn(
        "source",
        F.when(
            F.col("page_id") % 10 < 3,
            F.concat(F.lit("https://hot.example/"),
                     (F.col("page_id") % 100).cast("string")),
        ).otherwise(F.col("url")),
    )
    path_s = os.path.join(REPO_DIR, ".data", f"skew_skewed_{rows}.parquet")
    if not os.path.exists(os.path.join(path_s, "_SUCCESS")):
        skewed.write.mode("overwrite").parquet(path_s)
    run_pages(spark.read.parquet(path_s), "pages_validation_skewed")

    # line dedup with hot boilerplate lines
    docs = (
        spark.range(50_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.concat(F.lit("unique line a "), F.col("id").cast("string")),
                F.concat(F.lit("cookie banner "),
                         (F.col("id") % 8).cast("string")),
                F.concat(F.lit("unique line b "), F.col("id").cast("string")),
            ).alias("text"),
        )
        .repartition(32)
    )
    best = None
    for _ in range(3):
        t0 = time.time()
        dedup_lines_text(docs, "doc_id", "text").select("doc_id").write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out["line_dedup_skewed"] = round(best, 3)
    return out

if __name__ == "__main__":
    main()
