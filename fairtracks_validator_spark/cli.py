"""spark-submit entry point.

Usage (cluster):
    spark-submit --py-files ftval.zip -m fairtracks_validator_spark.cli ...
Usage (local):
    python -m fairtracks_validator_spark.cli validate \
        --input /data/pages.parquet --schema schemas/pages.json \
        --out /out/run1 --key-col url --partitions 256 [--max-partitions K]

``validate`` is resumable: re-running with the same --out continues from the
per-partition lineage checkpoint (CheckpointedValidation). ≙ the reference
CLI ``fairGTrackJsonValidate <schema-dir> <json>...``
(``FairGTrackValidatorCli.java:364-385``) with directories replaced by
tables and exit-code semantics preserved (non-zero when violations exist).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from .checkpoint import CheckpointedValidation
from .plans.schema_compile import Dims, compile_schema
from .session import get_spark
from .sources.dims import NAMESPACES_SNAPSHOT, namespace_mir_ids


def _numeric_cols(df, columns: list[str]) -> list[str]:
    from pyspark.sql import types as T

    numeric = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType, T.DecimalType)
    kinds = {f.name: f.dataType for f in df.schema.fields}
    return [c for c in columns if isinstance(kinds.get(c), numeric)]


def _cmd_decontam(spark, args) -> int:
    """Benchmark decontamination as a job: flag + drop contaminated docs.

    The kept corpus and (optionally) the contamination report are written;
    the summary counts reuse the report aggregates, never a second corpus
    scan beyond the write itself."""
    from pyspark.sql import functions as F

    from .operators.decontam import (
        benchmark_ngrams,
        contamination_report,
        remove_contaminated,
    )
    from .sources.tables import read_table, write_table

    docs = read_table(spark, args.input)
    bench = read_table(spark, args.bench)
    bg = benchmark_ngrams(
        bench, args.bench_text_col or args.text_col, n=args.ngram
    )
    report = contamination_report(
        docs, bg, args.id_col, args.text_col, n=args.ngram
    ).persist()
    try:
        if args.report:
            write_table(report, args.report, mode="overwrite")
        # threshold predicate + anti-join live in remove_contaminated —
        # the CLI only supplies its persisted report (code-review r5)
        kept = remove_contaminated(
            docs, id_col=args.id_col,
            max_overlap_frac=args.max_overlap_frac, report=report,
        )
        write_table(kept, args.out, mode="overwrite")
        counts = report.agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.sum(
                (F.col("overlap_frac") > args.max_overlap_frac).cast("long")
            ).alias("n_flagged"),
        ).first()
        print(json.dumps({
            "docs_with_overlap": counts["n_overlap"],
            "dropped": int(counts["n_flagged"] or 0),
            "out": args.out,
        }))
    finally:
        report.unpersist()
    return 0


def _cmd_passages(spark, args) -> int:
    """Shared-passage pair detection as a job: winnowing fingerprints →
    fingerprint-keyed buckets → bounded pair expansion → one write."""
    from .operators.winnow import shared_passage_pairs
    from .sources.tables import read_table, write_table

    docs = read_table(spark, args.input)
    pairs = shared_passage_pairs(
        docs, args.id_col, args.text_col,
        k=args.k, w=args.window,
        min_shared=args.min_shared, max_docs_per_fp=args.max_docs_per_fp,
    )
    write_table(pairs, args.out, mode="overwrite")
    n = read_table(spark, args.out).count()
    print(json.dumps({"pairs": n, "out": args.out}))
    return 0


def _cmd_profile(spark, args) -> int:
    """Write a drift baseline: column profiles + one-scan histograms.

    Two scans total regardless of column count: the profile aggregation
    (which also yields the numeric min/max that size the histogram grids)
    and the multi-column histogram aggregation."""
    import os as _os

    from .operators.stats import column_profile, multi_histogram
    from .sources.tables import read_table, write_table

    df = read_table(spark, args.input)
    cols = args.columns.split(",") if args.columns else df.columns
    prof = column_profile(df, cols)
    prof_rows = prof.collect()
    write_table(
        spark.createDataFrame(prof_rows, prof.schema),
        _os.path.join(args.out, "profile.parquet"), mode="overwrite",
    )
    by_col = {r["column"]: r for r in prof_rows}
    specs = []
    for c in _numeric_cols(df, cols):
        r = by_col[c]
        if r["min_str"] is None or r["max_str"] is None:
            continue
        lo, hi = float(r["min_str"]), float(r["max_str"])
        if not hi > lo:
            hi = lo + 1.0  # constant column still gets a (degenerate) grid
        specs.append((c, lo, hi, args.buckets))
    n_hist = 0
    if specs:
        hist = multi_histogram(df, specs)
        hist_rows = hist.collect()
        n_hist = len({r["column"] for r in hist_rows})
        write_table(
            spark.createDataFrame(hist_rows, hist.schema),
            _os.path.join(args.out, "histograms.parquet"), mode="overwrite",
        )
    print(json.dumps({"columns": len(cols), "histogram_columns": n_hist,
                      "baseline": args.out}))
    return 0


def _psi_from_cells(base: dict[int, int], cur: dict[int, int],
                    buckets: int, eps: float = 1e-6) -> float:
    """PSI over the completed bucket grid 0..buckets+1 — driver-side math
    on two ALREADY-AGGREGATED cell maps (≤ buckets+2 entries each), same
    smoothing contract as operators.stats.psi."""
    import math

    n_b = sum(base.values()) or 1
    n_c = sum(cur.values()) or 1
    val = 0.0
    for b in range(0, buckets + 2):
        p = max(base.get(b, 0) / n_b, eps)
        q = max(cur.get(b, 0) / n_c, eps)
        val += (q - p) * math.log(q / p)
    return round(val, 6)


def _cmd_drift(spark, args) -> int:
    """Drift report vs a stored baseline. Two scans of the current table
    (profile + histograms on the BASELINE's bucket grids); everything else
    is driver-side arithmetic over aggregate rows."""
    import os as _os

    from .operators.stats import column_profile, multi_histogram
    from .sources.tables import read_table, write_table

    base_prof = {
        r["column"]: r
        for r in spark.read.parquet(
            _os.path.join(args.baseline, "profile.parquet")
        ).collect()
    }
    hist_path = _os.path.join(args.baseline, "histograms.parquet")
    base_hist_rows = (
        spark.read.parquet(hist_path).collect()
        if _os.path.exists(hist_path) else []
    )
    base_cells: dict[str, dict[int, int]] = {}
    base_specs: dict[str, tuple[float, float, int]] = {}
    for r in base_hist_rows:
        base_cells.setdefault(r["column"], {})[r["bucket"]] = r["n"]
        base_specs[r["column"]] = (r["lo"], r["hi"], r["buckets"])

    df = read_table(spark, args.input)
    cols = [c for c in base_prof if c in df.columns]
    dropped = sorted(set(base_prof) - set(cols))
    cur_prof = {r["column"]: r for r in column_profile(df, cols).collect()}
    specs = [
        (c, *base_specs[c]) for c in cols
        if c in base_specs  # SAME grid as the baseline, by construction
    ]
    cur_cells: dict[str, dict[int, int]] = {}
    if specs:
        for r in multi_histogram(df, specs).collect():
            cur_cells.setdefault(r["column"], {})[r["bucket"]] = r["n"]

    report = []
    for c in cols:
        b, cur = base_prof[c], cur_prof[c]
        delta = round(abs(cur["null_rate"] - b["null_rate"]), 6)
        report.append((c, "null_rate_delta", float(b["null_rate"]),
                       float(cur["null_rate"]), delta,
                       delta > args.null_rate_delta))
        if b["n_distinct"] and cur["n_distinct"]:
            ratio = round(
                max(cur["n_distinct"] / b["n_distinct"],
                    b["n_distinct"] / cur["n_distinct"]), 6)
            report.append((c, "distinct_ratio", float(b["n_distinct"]),
                           float(cur["n_distinct"]), ratio,
                           ratio > args.distinct_ratio))
        if c in base_specs:
            buckets = base_specs[c][2]
            val = _psi_from_cells(base_cells.get(c, {}),
                                  cur_cells.get(c, {}), buckets)
            report.append((c, "psi", None, None, val,
                           val >= args.psi_threshold))
    rep_df = spark.createDataFrame(
        report,
        "column string, metric string, baseline double, current double, "
        "value double, flagged boolean",
    )
    if args.out:
        write_table(rep_df, args.out, mode="overwrite")
    flagged = [
        {"column": c, "metric": m, "value": v}
        for (c, m, _b, _cu, v, fl) in report if fl
    ]
    print(json.dumps({"columns": len(cols), "metrics": len(report),
                      "flagged": flagged, "missing_columns": dropped}))
    return 1 if flagged or dropped else 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fairtracks_validator_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="resumable table validation run")
    v.add_argument("--input", required=True, help="parquet path / table")
    v.add_argument("--schema", required=True, help="JSON-Schema(+extensions) file")
    v.add_argument("--schema-dir", default=None,
                   help="directory of sibling schemas: loaded as the "
                        "cross-document $ref registry")
    v.add_argument("--out", required=True, help="output dir (verdicts/violations/lineage)")
    v.add_argument("--key-col", default="url")
    v.add_argument("--ord-col", default=None, help="total-order column (default: key-col hash)")
    v.add_argument("--partitions", type=int, default=64)
    v.add_argument("--max-partitions", type=int, default=None,
                   help="process at most K incomplete partitions this run")
    v.add_argument("--run-id", default="cli")

    p = sub.add_parser(
        "prepare",
        help="training-corpus prep: quality gate -> dedup -> sample -> split",
    )
    p.add_argument("--input", required=True, help="parquet path / table")
    p.add_argument("--out", required=True, help="output parquet path / table")
    p.add_argument("--id-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-words", type=int, default=50)
    p.add_argument("--min-stop-hits", type=int, default=2,
                   help="Gopher stopword rule; 0 for corpora outside the "
                        "stopword tables (otherwise nothing passes)")
    p.add_argument("--sample-rate", type=float, default=1.0)
    p.add_argument("--val-frac", type=float, default=0.1)
    p.add_argument("--seed", default="pipe")
    p.add_argument("--line-dedup-min-count", type=int, default=None,
                   help="strip corpus-wide duplicated lines (first-writer "
                        "keep) before the quality gate; off by default")
    p.add_argument("--url-col", default=None,
                   help="URL column for --blocklist matching")
    p.add_argument("--blocklist", default=None,
                   help="newline-separated host/registered-domain blocklist "
                        "file (C4/RefinedWeb pre-filter); rows matching by "
                        "exact host or eTLD+1 drop before any content work")
    p.add_argument("--c4-min-sentences", type=int, default=None,
                   help="apply the C4 line filters (terminal punctuation, "
                        ">=5 words, no javascript) and page gates before "
                        "the Gopher gate; pages below this sentence count "
                        "drop; off by default")

    d = sub.add_parser(
        "dedup",
        help="near-dup removal: LSH candidates -> exact verify -> clusters -> keepers",
    )
    d.add_argument("--input", required=True, help="parquet path / table")
    d.add_argument("--out", required=True, help="output parquet path / table")
    d.add_argument("--id-col", default="url")
    d.add_argument("--text-col", default="text")
    d.add_argument("--threshold", type=float, default=0.8, help="Jaccard cutoff")
    d.add_argument("--num-hashes", type=int, default=8)
    d.add_argument("--bands", type=int, default=4)
    d.add_argument("--shingle-n", type=int, default=3)

    sd = sub.add_parser(
        "semdedup",
        help="SemDeDup: k-means cluster embeddings, prune cosine>=t within clusters",
    )
    sd.add_argument("--input", required=True, help="parquet path / table")
    sd.add_argument("--out", required=True, help="output parquet path / table")
    sd.add_argument("--id-col", default="vec_id", help="numeric id column")
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--k", type=int, default=64, help="k-means clusters")
    sd.add_argument("--iters", type=int, default=2, help="Lloyd rounds")
    sd.add_argument("--threshold", type=float, default=0.95, help="cosine cutoff")
    sd.add_argument("--max-cluster-size", type=int, default=100_000)

    x = sub.add_parser(
        "expect",
        help="table expectations: N declarative rules, ONE aggregation pass",
    )
    x.add_argument("--input", required=True, help="parquet path / table")
    x.add_argument("--rules", required=True,
                   help="JSON file: list of rule objects "
                        '({"kind": "null_rate", "column": "text", "hi": 0.05} ...)')
    x.add_argument("--out", default=None,
                   help="optional parquet path / table for the report")
    x.add_argument("--suggest", action="store_true",
                   help="profile the input and WRITE a suggested rule set "
                        "to --rules (two aggregation passes) instead of "
                        "evaluating one")
    x.add_argument("--columns", default=None,
                   help="comma-separated column subset for --suggest")

    dc = sub.add_parser(
        "decontam",
        help="drop documents sharing word n-grams with a benchmark/eval set",
    )
    dc.add_argument("--input", required=True, help="parquet path / table")
    dc.add_argument("--bench", required=True,
                    help="benchmark/eval corpus (parquet path / table)")
    dc.add_argument("--out", required=True, help="output parquet path / table")
    dc.add_argument("--report", default=None,
                    help="optional parquet path / table for the per-doc "
                         "contamination report")
    dc.add_argument("--id-col", default="url")
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--bench-text-col", default=None,
                    help="text column of the benchmark set (default: --text-col)")
    dc.add_argument("--ngram", type=int, default=8)
    dc.add_argument("--max-overlap-frac", type=float, default=0.0,
                    help="0.0 = any shared n-gram disqualifies")

    pg = sub.add_parser(
        "passages",
        help="shared-passage pairs via winnowing fingerprints (MOSS recipe)",
    )
    pg.add_argument("--input", required=True, help="parquet path / table")
    pg.add_argument("--out", required=True,
                    help="output parquet path / table for (id_a, id_b, "
                         "shared_fps) pairs")
    pg.add_argument("--id-col", default="url")
    pg.add_argument("--text-col", default="text")
    pg.add_argument("--k", type=int, default=5, help="gram size (tokens)")
    pg.add_argument("--window", type=int, default=4,
                    help="winnowing window (fingerprint density ~2/(w+1))")
    pg.add_argument("--min-shared", type=int, default=2,
                    help="emit pairs sharing at least this many fingerprints")
    pg.add_argument("--max-docs-per-fp", type=int, default=64,
                    help="drop boilerplate fingerprints present in more docs")

    pr = sub.add_parser(
        "profile",
        help="column profiles + per-column histograms -> a drift baseline",
    )
    pr.add_argument("--input", required=True, help="parquet path / table")
    pr.add_argument("--out", required=True,
                    help="baseline dir (profile.parquet + histograms.parquet)")
    pr.add_argument("--columns", default=None,
                    help="comma-separated subset (default: all columns)")
    pr.add_argument("--buckets", type=int, default=20)

    dr = sub.add_parser(
        "drift",
        help="compare a table against a stored `profile` baseline "
             "(null-rate delta, distinct ratio, per-column PSI)",
    )
    dr.add_argument("--input", required=True, help="parquet path / table")
    dr.add_argument("--baseline", required=True,
                    help="dir written by the profile subcommand")
    dr.add_argument("--out", default=None,
                    help="optional parquet path / table for the report")
    dr.add_argument("--psi-threshold", type=float, default=0.25,
                    help="flag columns at/above this PSI (0.25 = major)")
    dr.add_argument("--null-rate-delta", type=float, default=0.05)
    dr.add_argument("--distinct-ratio", type=float, default=2.0,
                    help="flag when distinct count grows/shrinks by this factor")

    args = ap.parse_args(argv)
    spark = get_spark(app_name="ftval-cli")

    if args.cmd == "profile":
        return _cmd_profile(spark, args)
    if args.cmd == "drift":
        return _cmd_drift(spark, args)
    if args.cmd == "decontam":
        return _cmd_decontam(spark, args)
    if args.cmd == "passages":
        return _cmd_passages(spark, args)

    if args.cmd == "expect":
        from .operators.expectations import (
            rules_from_json,
            rules_to_json,
            run_expectations,
            suggest_rules,
        )
        from .sources.tables import read_table, write_table

        if args.suggest:
            cols = args.columns.split(",") if args.columns else None
            spec = rules_to_json(
                suggest_rules(read_table(spark, args.input), columns=cols)
            )
            with open(args.rules, "w") as f:
                json.dump(spec, f, indent=1)
            print(json.dumps({"suggested": len(spec),
                              "rules_file": args.rules}))
            return 0
        with open(args.rules) as f:
            rules = rules_from_json(json.load(f))
        report = run_expectations(read_table(spark, args.input), rules)
        # the report is one row per rule — collect ONCE, re-wrap for the
        # optional write so a 100 TB input is never scanned a second time
        rows = report.collect()
        if args.out:
            write_table(
                spark.createDataFrame(rows, report.schema), args.out,
                mode="overwrite",
            )
        failed = [r for r in rows if not r["passed"]]
        print(json.dumps({
            "rules": len(rows),
            "failed": len(failed),
            "failures": [
                {"rule_id": r["rule_id"], "metric": r["metric"],
                 "lo": r["lo"], "hi": r["hi"]}
                for r in failed
            ],
        }))
        # exit-code semantics match `validate`: non-zero when anything failed
        return 1 if failed else 0

    if args.cmd == "dedup":
        from .functions.text import quality_score
        from .operators.dedup import (
            dedup_components,
            minhash_lsh_candidates,
            resolve_keepers,
            verify_jaccard,
        )
        from .sources.tables import read_table, write_table

        docs = read_table(spark, args.input)
        # The dedup operators key on a LONG id (their label-propagation sum
        # probe and pair ordering are numeric). String keys (url!) would hit
        # ANSI CAST_INVALID_INPUT — stamp a hash surrogate and verify it is
        # injective on this corpus (an exact distinct-count pair; a silent
        # collision would wrongly merge two documents' identities).
        id_type = dict(docs.dtypes).get(args.id_col)
        numeric = id_type in ("tinyint", "smallint", "int", "bigint")
        if numeric:
            work, wid = docs, args.id_col
            id_map = None
        else:
            work = docs.withColumn("_nid", F.xxhash64(F.col(args.id_col)))
            counts = work.agg(
                F.countDistinct(args.id_col).alias("ids"),
                F.countDistinct("_nid").alias("hashes"),
                F.sum(F.col(args.id_col).isNull().cast("int")).alias("nulls"),
            ).first()
            if counts["nulls"]:
                # null ids all hash to xxhash64's seed constant — they would
                # spuriously trip the injectivity check below with a
                # misleading "collision" message (advice r4)
                print(f"ERROR: {counts['nulls']} null values in --id-col "
                      f"{args.id_col}; filter them out or supply a complete "
                      "id column", file=sys.stderr)
                return 2
            if counts["hashes"] != counts["ids"]:
                print(f"ERROR: xxhash64 collision on --id-col {args.id_col}; "
                      "supply a numeric id column", file=sys.stderr)
                return 2
            wid = "_nid"
            id_map = work.select(
                F.col("_nid"), F.col(args.id_col).alias("_orig")
            ).distinct()
        cands = minhash_lsh_candidates(
            work, wid, args.text_col,
            num_hashes=args.num_hashes, bands=args.bands, shingle_n=args.shingle_n,
        )
        pairs = verify_jaccard(
            cands, work, wid, args.text_col,
            n=args.shingle_n, threshold=args.threshold,
        )
        comps = dedup_components(pairs)
        scores = work.select(
            F.col(wid).alias("id"), quality_score(F.col(args.text_col)).alias("q")
        )
        out = resolve_keepers(comps, scores, id_col="id", score_col="q")
        if id_map is not None:
            # restore the caller's ids for both the member and its rep
            out = (
                out.join(id_map.withColumnRenamed("_nid", "id"), "id")
                .join(
                    id_map.select(
                        F.col("_nid").alias("cluster_rep"),
                        F.col("_orig").alias("_rep_orig"),
                    ),
                    "cluster_rep",
                )
                .select(
                    F.col("_orig").alias(args.id_col),
                    F.col("_rep_orig").alias("cluster_rep"),
                    "keep",
                )
            )
        else:
            out = out.select(
                F.col("id").alias(args.id_col), "cluster_rep", "keep"
            )
        write_table(out, args.out, mode="overwrite")
        # one pass over the WRITTEN table (re-counting `out` would re-run
        # the whole pipeline twice, code-review r3)
        from .sources.tables import is_catalog_table

        written = (
            read_table(spark, args.out)
            if ("/" in args.out or is_catalog_table(spark, args.out))
            else out
        )
        agg = written.agg(
            F.count(F.lit(1)).alias("members"),
            F.sum((~F.col("keep")).cast("long")).alias("dropped"),
        ).first()
        print(json.dumps({
            "cluster_members": agg["members"],
            "dropped": agg["dropped"] or 0,
        }))
        return 0

    if args.cmd == "semdedup":
        from .operators.dedup import semantic_dedup
        from .operators.similarity import kmeans_fit
        from .sources.tables import is_catalog_table, read_table, write_table

        emb = read_table(spark, args.input)
        id_type = dict(emb.dtypes).get(args.id_col)
        if id_type not in ("tinyint", "smallint", "int", "bigint"):
            print(f"ERROR: --id-col {args.id_col} must be numeric "
                  f"(got {id_type}); SemDeDup orders keeps by id",
                  file=sys.stderr)
            return 2
        cents = kmeans_fit(
            emb, args.id_col, args.vec_col, k=args.k, iters=args.iters
        )
        out = semantic_dedup(
            emb, args.id_col, args.vec_col, cents,
            threshold=args.threshold, max_cluster_size=args.max_cluster_size,
        )
        write_table(out, args.out, mode="overwrite")
        written = (
            read_table(spark, args.out)
            if ("/" in args.out or is_catalog_table(spark, args.out))
            else out
        )
        agg = written.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((~F.col("keep")).cast("long")).alias("dropped"),
            F.sum(F.col("capped").cast("long")).alias("capped"),
        ).first()
        print(json.dumps({
            "rows": agg["rows"],
            "dropped": agg["dropped"] or 0,
            "capped_members": agg["capped"] or 0,
        }))
        return 0

    if args.cmd == "prepare":
        from .operators.pipeline import prepare_training_corpus
        from .sources.tables import read_table, write_table

        if (args.blocklist is None) != (args.url_col is None):
            print("--blocklist and --url-col must be given together",
                  file=sys.stderr)
            return 2
        blocked = None
        if args.blocklist is not None:
            with open(args.blocklist) as f:
                entries = [ln.strip().lower() for ln in f if ln.strip()]
            from .operators.urlfilter import URL_BLOCK_FOLD_MAX

            blocked = (
                entries
                if len(entries) <= URL_BLOCK_FOLD_MAX
                else spark.createDataFrame([(e,) for e in entries],
                                           "domain string")
            )
        out = prepare_training_corpus(
            read_table(spark, args.input),
            args.id_col,
            args.text_col,
            min_words=args.min_words,
            min_stop_hits=args.min_stop_hits,
            sample_rate=args.sample_rate,
            val_frac=args.val_frac,
            seed=args.seed,
            line_dedup_min_count=args.line_dedup_min_count,
            url_col=args.url_col,
            url_blocklist=blocked,
            c4_min_sentences=args.c4_min_sentences,
        )
        write_table(out, args.out, mode="overwrite")
        from .sources.tables import is_catalog_table
        written = (
            read_table(spark, args.out)
            if ("/" in args.out or is_catalog_table(spark, args.out))
            else out
        )
        counts = {
            r["split"]: r["n"]
            for r in written.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        if not counts:
            print("WARNING: 0 rows survived the quality gate — for corpora "
                  "outside the stopword tables pass --min-stop-hits 0",
                  file=sys.stderr)
        print(json.dumps({"rows": sum(counts.values()), "splits": counts}))
        return 0

    with open(args.schema) as f:
        schema = json.load(f)
    registry = None
    if args.schema_dir:
        from .sources.catalog import load_schemas

        registry = load_schemas(args.schema_dir)
    plan = compile_schema(
        schema,
        dims=Dims(namespaces=NAMESPACES_SNAPSHOT, namespace_ids=namespace_mir_ids()),
        registry=registry,
    )
    for w in plan.warnings:
        print(f"WARNING: {w}", file=sys.stderr)

    from .sources.tables import is_catalog_table, read_table

    df = read_table(spark, args.input)
    df = df.withColumn("source", F.col(args.key_col).cast("string"))
    if args.ord_col:
        df = df.withColumn("ord", F.col(args.ord_col).cast("long"))
    else:
        # deterministic POSITIONAL total order (file path, then physical
        # position within file) via the same machinery as the JSON catalog.
        # Hash-derived ords are wrong twice over (ADVICE r2): fully-identical
        # duplicate rows — the most common duplicate shape — collapse to one
        # (source, ord) identity that dup detection cannot tell apart, and
        # 64-bit content hashes reintroduce birthday-collision identity
        # merging at 10^12 rows. Pass --ord-col for a domain-meaningful
        # order (ingestion timestamp, sequence number).
        from .sources.catalog import _stamp_ord

        if is_catalog_table(spark, args.input):
            # Iceberg reserved metadata: _file + _pos give the same
            # file-positional order the parquet _metadata struct does
            df = (
                df.withColumn("_srcfile", F.col("_file"))
                .withColumn("_bstart", F.lit(0).cast("long"))
                .withColumn("_mono", F.col("_pos"))
            )
        else:
            df = (
                df.withColumn("_srcfile", F.col("_metadata.file_path"))
                .withColumn("_bstart", F.col("_metadata.file_block_start"))
                .withColumn("_mono", F.monotonically_increasing_id())
            )
        df = _stamp_ord(df, file_col="_srcfile").drop("_srcfile")

    cv = CheckpointedValidation(out_dir=args.out, n_partitions=args.partitions)
    summary = cv.run(
        df, plan, key_col=args.key_col,
        max_partitions=args.max_partitions, run_id=args.run_id,
    )
    print(json.dumps(summary))

    lineage = spark.read.parquet(cv.lineage_dir)
    totals = lineage.agg(
        F.sum("rows_scanned").alias("rows"), F.sum("violations").alias("violations")
    ).collect()[0]
    print(json.dumps({"rows": totals["rows"], "violations": totals["violations"]}))
    return 1 if (totals["violations"] or 0) > 0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
