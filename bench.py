"""Benchmark harness — prints ONE JSON line.

Runs the headline queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a synthetic
pages-validation throughput probe (the BASELINE.json primary metric:
validated docs/sec). Scaling-efficiency evidence (local[8] vs local[32]) is
produced by scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_DIR)

import __spark_entry__ as entrymod  # noqa: E402
from fairtracks_validator_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "validate_documents",
    "validate_documents_draft7",
    "validate_multischema",
    "validate_documents_formats",
    "pk_dup_orders_custkey",
    "fk_missing_events_user",
    "profile_orders",
    "quantile_profile_orders",
    "distinct_users_events",
    "histogram_events_value",
    "psi_events_value",
    "psi_hourly_events",
    "ks_events_value",
    "ks_quantile_events",
    "chi_square_events",
    "events_hourly_window",
    "sessions_events",
    "exact_dedup_documents",
    "minhash_lsh_documents",
    # the scale path for n-gram dedup: LSH candidates -> exact Jaccard verify
    # restricted to those pairs (the standalone self-join stays benched below
    # as the exact-correctness tool, but cannot survive 100 TB alone).
    "minhash_verified_dups",
    "dedup_clusters_documents",
    "ngram_jaccard_documents",
    "simhash_documents",
    "simhash_neardup_documents",
    "cosine_topk_embeddings",
    "ivf_ann_embeddings",
    # the production shape: ivf_index built once per session, probes reuse
    # the persisted (assigned, codebook) pair — probe-only latency
    "ivf_ann_pretrained",
    "langid_documents",
    "quality_documents",
    "gopher_quality_documents",
    "repetition_documents",
    "top_tokens_per_lang",
    "pii_redact_documents",
    "unigram_logprob_documents",
    "training_pipeline_documents",
    "pack_sequences_documents",
    # r5: every oracled query is benched (VERDICT r4 #2 — BENCH queries must
    # be a superset of the CORRECTNESS keys; "how fast is X" has an answer
    # for every X the correctness gate certifies)
    "validate_events_props",
    "profile_documents",
    "hll_cardinality",
    "ks_per_lang_documents",
    "containment_verified_dups",
    "dedup_keep_documents",
    "embedding_neardup",
    "fingerprint_documents",
    "token_counts_documents",
    "url_canonical_documents",
    "stratified_sample_documents",
    "train_val_split_documents",
    "split_balance_documents",
    "warc_pages_documents",
    # r5: benchmark decontamination + CCNet-style line dedup
    "decontam_documents",
    "line_dedup_documents",
    "expectations_documents",
    "multi_histogram_events",
    "trim_contam_documents",
    "winnow_passages_documents",
    "importance_sample_documents",
    # r5b: LM scoring family (stupid-backoff bigram, CCNet terciles,
    # fastText-shaped hashed classifier) + SemDeDup
    "bigram_logprob_documents",
    "ccnet_buckets_documents",
    "classifier_score_documents",
    "semantic_dedup_embeddings",
    "gopher_repetition_documents",
    "cap_per_group_documents",
    "url_blocklist_documents",
    "ccnet_pipeline_documents",
    "pack_bfd_documents",
    "c4_clean_documents",
]

PAGES_BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_PAGES_ROWS", "4000000"))
# the prep pipeline is ~10x more CPU per doc (tokenization + HOF metrics);
# it keeps its own smaller fixture so the probe stays a probe
PREP_BENCH_ROWS = int(
    os.environ.get("SPARK_GRAFT_PREP_ROWS", str(PAGES_BENCH_ROWS // 4))
)


def _pages_table(spark, rows: int):
    """The stored pages table the probes validate. Materialized ONCE
    (untimed) — the BASELINE metric is docs/sec over a stored
    Iceberg/parquet table, so the deterministic generator's CPU must not
    pollute the measurement (same discipline as scripts/bench_scaling.py;
    before this the probe under-reported ~4x: generation cost timed as
    validation)."""
    from fairtracks_validator_spark.sources.pages import pages

    path = os.path.join(REPO_DIR, ".data", f"bench_pages_{rows}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pages(spark, rows).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _pages_throughput(spark) -> tuple[float, float]:
    """Validated docs/sec over the synthetic pages table (north-star metric)."""
    from pyspark.sql import functions as F

    from fairtracks_validator_spark.plans.schema_compile import compile_schema
    from fairtracks_validator_spark.runner import validate_corpus, sink_observed
    from fairtracks_validator_spark.sources.pages import pages_schema_dict

    df = (
        _pages_table(spark, PAGES_BENCH_ROWS)
        .withColumn("source", F.col("url"))
        .withColumn("ord", F.col("page_id"))
    )
    plan = compile_schema(pages_schema_dict())
    # best-of-3: this is a shared-host VM with ±30% CPU-steal noise; the
    # fastest pass is the least-contended measurement of the same fixed work
    best = None
    for _ in range(3):
        t0 = time.time()
        res = validate_corpus({"pages/1.0": (plan, df)})
        # ONE observed write = verdicts + violation rows + all counts in a
        # single Spark action (the BASELINE metric is pass/fail AND
        # violation rows; the old probe materialized only verdicts)
        m = sink_observed(res)
        n = m["docs"]
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    return best, n / best


def _pages_prep_throughput(spark) -> tuple[float, float]:
    """Corpus-prep docs/sec over the same pages table: Gopher gate →
    exact dedup → 50% sample → train/val split (the one-shuffle pipeline).
    Same best-of-3 discipline as the validation probe."""
    from fairtracks_validator_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    df = _pages_table(spark, PREP_BENCH_ROWS)
    best = None
    for _ in range(3):
        t0 = time.time()
        prepare_training_corpus(
            df, "url", "text", min_words=20, sample_rate=0.5, val_frac=0.1,
            min_stop_hits=0,  # pages vocabulary carries no stopwords
        ).count()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    return best, PREP_BENCH_ROWS / best


def _procs_running(samples: int = 10, interval: float = 0.2) -> int | None:
    """Peak count of runnable threads machine-wide (excluding this one)
    over a ~2 s window, from /proc/stat. A single instantaneous sample
    reads low between a co-runner's stages, so take the max of several.
    None when the platform has no procfs."""

    def one() -> int | None:
        try:
            with open("/proc/stat") as f:
                for line in f:
                    if line.startswith("procs_running"):
                        return max(0, int(line.split()[1]) - 1)
        except OSError:
            pass
        return None

    vals = []
    for i in range(samples):
        v = one()
        if v is None:
            return None
        vals.append(v)
        if i + 1 < samples:
            time.sleep(interval)
    return max(vals)


def _burn(n: int = 20_000_000) -> float:
    """Single-thread busy-loop rate (iterations/sec) — the contention probe."""
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i
    return n / (time.time() - t0)


def _stream_validate_throughput(spark) -> tuple[float, float]:
    """Incremental-path docs/sec: the streaming twin of the pages validation
    run as an availableNow catch-up over a parquet file stream (VERDICT r4
    #8). Micro-batched via maxFilesPerTrigger so the cross-batch registry
    path is actually exercised, noDataMicroBatches off so the wall measures
    data batches only."""
    import shutil
    import tempfile

    from fairtracks_validator_spark.plans.schema_compile import compile_schema
    from fairtracks_validator_spark.sources.pages import pages, pages_schema_dict
    from fairtracks_validator_spark.streaming.validate_stream import (
        validate_stream,
    )

    from pyspark.sql import functions as F

    # fixed 200k: the incremental path runs ~15x slower than batch by
    # design (micro-batch scheduling), so this probe must not scale with
    # the batch probe's fixture
    rows = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "200000"))
    scratch = os.path.join(REPO_DIR, ".data")
    os.makedirs(scratch, exist_ok=True)
    work = tempfile.mkdtemp(prefix="ftval-stream-bench-", dir=scratch)
    try:
        src = os.path.join(work, "src")
        (
            pages(spark, rows, partitions=8)
            .withColumn("source", F.col("url"))
            .withColumn("ord", F.col("page_id"))
            .write.mode("overwrite").parquet(src)
        )
        schema = spark.read.parquet(src).schema
        old = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled",
                             "true")
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                       "false")
        try:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "2")
                .parquet(src)
            )
            plan = compile_schema(pages_schema_dict())
            t0 = time.time()
            q = validate_stream(stream, plan, os.path.join(work, "out"))
            q.awaitTermination()
            dt = time.time() - t0
        finally:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", old
            )
        return dt, rows / dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _classifier_throughput(spark) -> tuple[float, float]:
    """Quality-classifier docs/sec over the stored 10^6-page fixture: the
    folded fastText-shaped scorer (zero shuffle, map-only) on the xxhash64
    scale path — the per-doc cost a 10^12-row quality-filter pass pays.
    Best-of-3, same discipline as the other probes."""
    from fairtracks_validator_spark.operators.scoring import (
        hashed_linear_score,
        make_hash_weights,
    )

    df = _pages_table(spark, PREP_BENCH_ROWS)
    w = make_hash_weights(256, "w")
    best = None
    for _ in range(3):
        t0 = time.time()
        n = hashed_linear_score(
            df, "url", "text", w, hash_fn="xxhash64"
        ).count()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    return best, n / best


def _wait_for_quiet(max_wait_s: float = 90.0) -> None:
    """Don't START into a contended window: a co-runner winding down (the
    test suite's JVM exiting seconds earlier) pollutes the BEFORE probe and
    stamps the whole artifact contended even though the timed loop itself
    ran quiet (observed r5). Bounded wait — never blocks a genuinely busy
    host forever; the sentinel still tells the truth afterwards."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        p = _procs_running(samples=3, interval=0.2)
        if p is None or p <= 1:
            return
        time.sleep(5)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    _wait_for_quiet()
    # contention sentinel (VERDICT r4 #3): sample the single-thread CPU rate
    # before and after the timed loop; a busy host shows up as drift between
    # the two samples, and the artifact says so instead of recording phantom
    # regressions (all three r4 "regressions" were host contention).
    cpu_rate_before = _burn()
    # multi-core sentinel: sampled BEFORE Spark exists, so anything already
    # running is a co-running process (see note at the end)
    load1_start = os.getloadavg()[0]
    procs_running = _procs_running()
    spark = get_spark(app_name="ftval-bench")

    qs = entrymod.queries()
    # JVM/codegen warm-up, excluded from timing — the same methodology as
    # scripts/bench_scaling.py: every headline query shape runs once at
    # sf0.001 so the timed walls measure steady-state operator cost, not
    # Janino compilation of each query's generated classes (langid's alone
    # is ~6 s once per session).
    spark.range(100000).selectExpr("sum(id)").collect()
    # warm-up at the smallest fixture when present, else the bench dir
    # itself (a relocated SPARK_GRAFT_SF_DIR must not crash the warm-up —
    # code-review r4)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        qs[name](spark, warm_dir).collect()

    # best-of-3 per query: a single sample on this shared host swings
    # ±30-90% with CPU steal (BENCH/bisect_r4.md — the r3 "regressions"
    # were all single-sample noise); the fastest pass of identical work is
    # the least-contended measurement, same discipline as the pages probe.
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
        times[name] = round(best, 3)

    pages_sec, pages_docs_per_sec = _pages_throughput(spark)
    times["pages_validation"] = round(pages_sec, 3)
    prep_sec, prep_docs_per_sec = _pages_prep_throughput(spark)
    times["pages_corpus_prep"] = round(prep_sec, 3)
    stream_sec, stream_docs_per_sec = _stream_validate_throughput(spark)
    times["stream_validate"] = round(stream_sec, 3)
    clf_sec, clf_docs_per_sec = _classifier_throughput(spark)
    times["pages_classifier"] = round(clf_sec, 3)

    cpu_rate_after = _burn()
    contention = min(cpu_rate_before, cpu_rate_after) / max(
        cpu_rate_before, cpu_rate_after
    )
    # the single-thread probe misses MULTI-CORE contention (a concurrent
    # 8-core JVM steals a quarter of the box without moving one thread's
    # busy-loop rate — observed r5: pages probe 0.5 s quiet vs 3.9 s under
    # a parallel pytest run, probe ratio still 0.98). procs_running from
    # /proc/stat at START is INSTANTANEOUS — unlike load average, whose
    # multi-minute decay tail from recently-finished work false-positives
    # on a genuinely idle box (observed: load1 6.2, zero co-runners).
    # > 3 allows self + interpreter threads + scheduler noise.
    loaded = procs_running is not None and procs_running > 3

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time, JVM warm-up excluded "
                f"(incl. pages validation of {PAGES_BENCH_ROWS} docs; "
                f"docs_per_sec={round(pages_docs_per_sec)})",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pages_docs_per_sec": round(pages_docs_per_sec, 1),
                "pages_prep_docs_per_sec": round(prep_docs_per_sec, 1),
                "stream_docs_per_sec": round(stream_docs_per_sec, 1),
                "classifier_docs_per_sec": round(clf_docs_per_sec, 1),
                # r5 probe change vs r4 (NOT a regression): the docs/sec
                # now measures the full observed sink (verdicts AND
                # violation rows in one action) over a STORED table of
                # 4M rows; r4's probe counted verdicts only over 1M
                # generator-inline rows (generation cost mistimed as
                # validation, job fixed-cost ~80% of the wall)
                "pages_probe": (
                    f"observed sink (verdicts+violations), stored table, "
                    f"{PAGES_BENCH_ROWS} rows"
                ),
                # contention sentinel: single-thread CPU rate sampled before/
                # after the run; ratio < 0.85 means the host was busy while
                # timing and the walls above are suspect — re-run on quiet.
                "cpu_probe_ratio": round(contention, 3),
                "load1_start": round(load1_start, 2),
                "procs_running_start": procs_running,
                "contended": contention < 0.85 or loaded,
            }
        )
    )


if __name__ == "__main__":
    main()
