"""Structured-Streaming incremental validation.

The reference is strictly batch (two passes over a closed corpus,
``FairGTrackValidatorCli.java:236-359``); its PK registry is incremental
*within* a run (``ValidatedJSONSchema.java:373-392``) and seedable across
runs (A4, ``README.md:25-35``). This module generalizes that to an unbounded
stream: per micro-batch, row checks run vectorized, and uniqueness probes an
accumulated registry (parquet dir ≙ the reference's in-memory hash map,
seeded exactly like A4), then appends the batch's first-writer keys.

``foreachBatch`` is the right primitive: uniqueness is a cross-batch global
constraint, not a windowed aggregate, so the state lives in a (at deployment:
Iceberg) table rather than in streaming state-store — which also makes it
inspectable and seedable. Watermarked tumbling-window aggregation is provided
separately for rate-style monitoring (``windowed_event_counts``).

Idempotency: each batch writes its outputs under ``batch_id=<n>`` directories
with overwrite, so foreachBatch retries do not double-count; the registry
append is guarded the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.checks import apply_checks, checks_pass_predicate
from ..operators.uniqueness import _doc_keys
from ..plans.schema_compile import ValidationPlan

REGISTRY_SCHEMA = "check_id string, key_str string, first_source string, first_ord long"


def _registry_path(out_dir: str) -> str:
    return os.path.join(out_dir, "registry")


def _load_registry(spark, out_dir: str, before_batch_id: int) -> DataFrame:
    """Registry accumulated by batches STRICTLY BEFORE ``before_batch_id`` —
    a foreachBatch retry must not see its own previous (partial) attempt.

    Listed through Spark's reader (``batch_id`` is a partition column), NOT
    ``os.listdir`` — the out_dir may be hdfs://, s3a://, or any Hadoop FS
    the driver's local filesystem cannot see; a local listing there would
    silently return an empty registry and disable cross-batch dedup
    (code-review r3). Partition pruning keeps the read to prior batches.
    """
    from pyspark.errors import AnalysisException

    path = _registry_path(out_dir)
    try:
        df = spark.read.option("basePath", path).parquet(path)
    except AnalysisException as e:
        cond = (
            e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
        ) or ""
        if "PATH_NOT_FOUND" not in cond:
            # transient storage/permission/corrupt-footer errors must
            # PROPAGATE so the micro-batch retries — swallowing them would
            # silently validate against an empty registry (advice r4)
            raise
        # no registry yet (first batch): nothing to probe against
        return spark.createDataFrame([], REGISTRY_SCHEMA)
    if "batch_id" not in df.columns:
        return spark.createDataFrame([], REGISTRY_SCHEMA)
    return df.where(F.col("batch_id") < before_batch_id).select(
        "check_id", "key_str", "first_source", "first_ord"
    )


def process_batch(
    batch_df: DataFrame,
    batch_id: int,
    plan: ValidationPlan,
    out_dir: str,
    source_col: str = "source",
    ord_col: str = "ord",
) -> None:
    """One micro-batch of incremental validation (also callable directly for
    tests / backfills)."""
    from ..runner import align_to_plan

    spark = batch_df.sparkSession
    # schema-drift alignment, same as the batch runner (absent column ⇒
    # typed null ⇒ "property absent" semantics instead of UNRESOLVED_COLUMN)
    batch_df = align_to_plan(batch_df, plan)

    # Fast path (r6) for the flat-key, no-join-check shape (the web-scale
    # pages regime): the violations write and the key-registry write are
    # separate ACTIONS, and written independently each re-scans the batch
    # and re-evaluates every check. Compute ONE narrow relation per batch —
    # (source, ord, all-ok verdict, gated fail entries, per-unique key) —
    # lazily checkpointed so whichever action runs first materializes it
    # and the other reads its blocks. Join checks / fan-out keys keep the
    # general path below.
    from ..functions.keys import flat_key_string, has_array_fanout

    _fast = (
        not plan.join_checks
        and plan.uniques
        and all(not has_array_fanout(uq.members) for uq in plan.uniques)
    )
    if _fast:
        from ..operators.checks import check_entries

        all_ok = checks_pass_predicate(plan.checks)
        entries = check_entries(plan.checks)
        _entry_ddl = "array<struct<check_id:string,ok:boolean,message:string>>"
        fails = (
            F.when(~all_ok, F.array(*entries))
            if entries
            else F.lit(None).cast(_entry_ddl)
        )
        narrow = batch_df.select(
            F.col(source_col).alias("source"),
            F.col(ord_col).cast("long").alias("ord"),
            all_ok.alias("_ok"),
            fails.alias("_fails"),
            *[
                flat_key_string(uq.members).alias(f"_key_{i}")
                for i, uq in enumerate(plan.uniques)
            ],
        ).localCheckpoint(eager=False)
        from ..functions.expr import let_

        schema_viol = (
            # let_ identity: a bare-attribute explode would let
            # InferFiltersFromGenerate re-derive a pushable size(_fails)>0
            # filter that alias-inlines every check below the scan
            narrow.select(
                "source", "ord",
                F.explode(let_(F.col("_fails"), lambda x: x)).alias("_f"),
            )
            .where(~F.col("_f.ok"))
            .select(
                "source",
                "ord",
                F.lit(plan.schema_id).alias("schema_id"),
                F.col("_f.check_id").alias("check_id"),
                F.lit(None).cast("string").alias("key_str"),
                F.lit("schema").alias("reason"),
                F.col("_f.message").alias("description"),
            )
        )
    else:
        schema_viol = apply_checks(
            batch_df, plan.checks, plan.join_checks, plan.schema_id,
            source_col, ord_col,
        )
    violations = [schema_viol]
    new_keys_parts = []
    registry = None  # unpersisted after the batch's writes commit

    if plan.uniques:
        survivors = None
        if not _fast:
            survivors = (
                batch_df.where(checks_pass_predicate(plan.checks))
                if not plan.join_checks
                else batch_df.join(
                    schema_viol.select(
                        F.col("source").alias(source_col),
                        F.col("ord").alias(ord_col),
                    ).distinct(),
                    [source_col, ord_col],
                    "left_anti",
                )
            )
        registry = _load_registry(spark, out_dir, batch_id).cache()
        batch_caches: list = []
        for _uq_i, uq in enumerate(plan.uniques):
            if _fast:
                keys = (
                    narrow.where(F.col("_ok"))
                    .select(
                        "source", "ord",
                        F.col(f"_key_{_uq_i}").alias("key_str"),
                    )
                    .where(F.col("key_str").isNotNull())
                )
            else:
                keys = _doc_keys(
                    survivors, uq.check_id, uq.members, source_col, ord_col
                )
            reg = registry.where(F.col("check_id") == uq.check_id)
            reg_sel = reg.select("key_str", F.col("first_source").alias("_reg_fs"))

            from ..functions.keys import has_array_fanout

            if has_array_fanout(uq.members):
                # multi-valued keys take the SAME promotion cascade as the
                # batch path (code-review r4 — the old no-cascade shortcut
                # over-blamed docs the reference promotes): docs colliding
                # against the frozen registry are removed first (their
                # unclaimed keys free up, exactly like the reference's
                # record-nothing rule), then the in-batch fixpoint resolves
                # the remainder.
                from ..operators.uniqueness import _resolve_cascade

                reg_hits = keys.join(reg_sel, "key_str", "inner")
                cross_dup = reg_hits.select(
                    "source", "ord", "key_str",
                    F.col("_reg_fs").alias("first_source"),
                )
                remaining = keys.join(
                    reg_hits.select("source", "ord").distinct(),
                    ["source", "ord"], "left_anti",
                )
                intra_dup, recorded, cached = _resolve_cascade(remaining, 6)
                batch_caches.extend(cached)
                fresh = recorded.select(
                    F.lit(uq.check_id).alias("check_id"),
                    "key_str",
                    F.col("source").alias("first_source"),
                    F.col("ord").cast("long").alias("first_ord"),
                )
            else:
                # single-key path: one window + ONE registry join shared by
                # blame and freshness. Rank-2+ docs whose key already has a
                # registry holder are blamed on THAT holder, not on the
                # in-batch rank-1 row (which held nothing — code-review r4).
                from pyspark.sql import Window

                w = Window.partitionBy("key_str").orderBy("ord", "source")
                ranked = (
                    keys.withColumn("_rn", F.row_number().over(w))
                    .withColumn("_fs", F.first("source").over(w))
                    .join(reg_sel, "key_str", "left")
                    # the violations write AND the fresh-keys write both
                    # consume this relation; lazy-checkpoint so the second
                    # action reads the first's blocks instead of re-running
                    # the batch's window+registry join (r6)
                    .localCheckpoint(eager=False)
                )
                intra_dup = ranked.where(F.col("_rn") > 1).select(
                    "source", "ord", "key_str",
                    F.coalesce(F.col("_reg_fs"), F.col("_fs")).alias("first_source"),
                )
                cross_dup = ranked.where(
                    (F.col("_rn") == 1) & F.col("_reg_fs").isNotNull()
                ).select(
                    "source", "ord", "key_str",
                    F.col("_reg_fs").alias("first_source"),
                )
                fresh = ranked.where(
                    (F.col("_rn") == 1) & F.col("_reg_fs").isNull()
                ).select(
                    F.lit(uq.check_id).alias("check_id"),
                    "key_str",
                    F.col("source").alias("first_source"),
                    F.col("ord").alias("first_ord"),
                )
            dup = intra_dup.unionByName(cross_dup).select(
                "source",
                "ord",
                F.lit(plan.schema_id).alias("schema_id"),
                F.lit(uq.check_id).alias("check_id"),
                "key_str",
                F.lit("dup_pk").alias("reason"),
                F.format_string(
                    "Duplicate PK in %s and %s", F.col("first_source"), F.col("source")
                ).alias("description"),
            )
            violations.append(dup)
            new_keys_parts.append(fresh)

    try:
        out = violations[0]
        for v in violations[1:]:
            out = out.unionByName(v)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, "violations", f"batch_id={batch_id}")
        )
        if new_keys_parts:
            nk = new_keys_parts[0]
            for p in new_keys_parts[1:]:
                nk = nk.unionByName(p)
            nk.write.mode("overwrite").parquet(
                os.path.join(_registry_path(out_dir), f"batch_id={batch_id}")
            )
    finally:
        # one cached (ever-growing) registry per micro-batch otherwise
        # accumulates in executor storage for the stream's lifetime
        if registry is not None:
            registry.unpersist()
        for c in locals().get("batch_caches", []) or []:
            try:
                c.unpersist()
            except Exception:
                pass


def validate_stream(
    stream_df: DataFrame,
    plan: ValidationPlan,
    out_dir: str,
    source_col: str = "source",
    ord_col: str = "ord",
    trigger_available_now: bool = True,
):
    """Attach incremental validation to a streaming DataFrame.

    Returns the started StreamingQuery. Outputs land under
    ``out_dir/violations/batch_id=*`` and ``out_dir/registry/batch_id=*``.
    """
    writer = stream_df.writeStream.foreachBatch(
        lambda bdf, bid: process_batch(bdf, bid, plan, out_dir, source_col, ord_col)
    ).option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def expectations_stream(
    stream_df: DataFrame,
    rules,
    out_dir: str,
    trigger_available_now: bool = True,
):
    """Per-micro-batch table expectations — the streaming twin of
    ``operators.expectations.run_expectations``.

    Each batch's rule report (one row per rule, plus ``batch_id``) appends
    under ``out_dir/reports/batch_id=<n>`` with overwrite-idempotent
    directories, same retry discipline as :func:`process_batch`. This is
    the continuous form of the CI gate: a monitoring job tails the report
    table and alarms on ``passed = false`` rows — per BATCH verdicts (a
    rule like ``row_count`` means "per micro-batch" here, not global).

    Returns the started StreamingQuery."""
    from ..operators.expectations import run_expectations

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        # empty batches report too: row_count 0 / null metrics FAIL their
        # rules, which is exactly the alarm the monitoring contract
        # promises — skipping would permanently hide a no-data condition
        # behind a committed batch id (code-review r5)
        report = run_expectations(bdf, rules).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        report.write.mode("overwrite").parquet(
            os.path.join(out_dir, "reports", f"batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(_one_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_expect_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming twin of the batch
    ``events_hourly_window`` query; late rows beyond the watermark drop."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
        )
    )
