"""Resumable validation runs: per-partition lineage + checkpointed registry.

North rule: validation runs over 10^12 rows must be resumable from
per-partition checkpoints recorded in a lineage/metrics table (rows scanned,
violations, wall-time per partition). Design:

- **Deterministic partitioning**: every row is assigned
  ``part_id = pmod(xxhash64(url), n_partitions)`` — a pure function of the
  data, independent of cluster size or task scheduling, so a resumed run on a
  different cluster processes the same partition sets.
- **Stage checkpoint 1 — the PK registry**: uniqueness is a *global*
  aggregate; it is computed once over the full input and persisted
  (parquet + ``_SUCCESS``). Resumes reuse it instead of re-shuffling 100 TB.
- **Stage checkpoint 2 — per-partition outputs**: verdicts + violations are
  written partitioned by ``part_id`` with dynamic partition overwrite
  (idempotent per partition); a lineage row ``(part_id, rows_scanned,
  violations, wall_time_s, run_id, status)`` is appended only after the
  partition's data is committed. Resume = anti-join the todo set against
  completed lineage rows. A crash between data-write and lineage-append
  re-does that partition; the overwrite makes it exactly-once.

Sinks are plain parquet directories here; on a real deployment the same
layout maps 1:1 onto Iceberg tables (``writeTo(...).overwritePartitions()``)
— the catalog is injectable via ``format``.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.schema_compile import ValidationPlan
from .runner import validate_corpus

LINEAGE_SCHEMA = (
    "part_id int, rows_scanned long, violations long, wall_time_s double, "
    "run_id string, status string"
)


def _exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


@dataclass
class CheckpointedValidation:
    """Orchestrates a resumable single-table validation run."""

    out_dir: str
    n_partitions: int = 64

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.out_dir, "lineage")

    @property
    def registry_dir(self) -> str:
        return os.path.join(self.out_dir, "registry")

    @property
    def verdicts_dir(self) -> str:
        return os.path.join(self.out_dir, "verdicts")

    @property
    def violations_dir(self) -> str:
        return os.path.join(self.out_dir, "violations")

    # ------------------------------------------------------------------ api
    def completed_partitions(self, spark: SparkSession) -> list[int]:
        if not _exists(self.lineage_dir):
            return []
        rows = (
            spark.read.parquet(self.lineage_dir)
            .where(F.col("status") == "ok")
            .select("part_id")
            .distinct()
            .collect()
        )
        return sorted(r["part_id"] for r in rows)

    def run(
        self,
        df: DataFrame,
        plan: ValidationPlan,
        key_col: str = "url",
        source_col: str = "source",
        ord_col: str = "ord",
        max_partitions: int | None = None,
        run_id: str = "run",
        extra_registries: dict[tuple[str, str], DataFrame] | None = None,
    ) -> dict:
        """Validate ``df``; process at most ``max_partitions`` incomplete
        partitions (None = all). Returns a summary dict. Call again to resume.
        """
        spark = df.sparkSession
        work = df.withColumn(
            "part_id", F.pmod(F.xxhash64(key_col), F.lit(self.n_partitions)).cast("int")
        )

        # ---- stage 1: global registry checkpoint (uniqueness is global)
        corpus = {plan.schema_id: (plan, work)}
        if plan.uniques and not _exists(self.registry_dir):
            res = validate_corpus(corpus, source_col, ord_col)
            regs = []
            for (schema_id, check_id), pk in res.pk_registries.items():
                regs.append(pk)
            reg_all = regs[0]
            for r in regs[1:]:
                reg_all = reg_all.unionByName(r)
            reg_all.write.mode("overwrite").parquet(self.registry_dir)
            res.release()  # registry committed; drop the run's caches

        # ---- todo partitions
        done = set(self.completed_partitions(spark))
        todo = [p for p in range(self.n_partitions) if p not in done]
        if max_partitions is not None:
            todo = todo[:max_partitions]
        if not todo:
            return {"processed": [], "skipped": sorted(done)}

        t0 = time.time()
        subset = work.where(F.col("part_id").isin(todo))

        # per-partition-safe checks: schema checks are row-local; uniqueness
        # violations are derived by joining THIS subset's keys against the
        # frozen global registry (blame = registry's first holder); FK probes
        # join the same registry. Semantics equal a fresh global run because
        # the registry is global and frozen.
        res = validate_corpus(
            {plan.schema_id: (_row_checks_only(plan), subset)}, source_col, ord_col
        )
        violations = res.violations
        if plan.uniques and _exists(self.registry_dir):
            reg = spark.read.parquet(self.registry_dir)
            # schema-failed docs never record/probe keys
            # (ValidatedJSONSchema.java:360-392)
            survivors = _anti_on_identity(
                subset, res.violations, source_col, ord_col
            )
            violations = violations.unionByName(
                _dup_violations_vs_registry(survivors, plan, reg, source_col, ord_col)
            )

        # FK probes against frozen external registries (dimension tables or
        # other tables' checkpointed registries) — partition-local, resumable
        if plan.fks:
            from .operators.fk import fk_check

            extra = extra_registries or {}
            masked = _anti_on_identity(subset, violations, source_col, ord_col)
            for fk in plan.fks:
                pk = extra.get((fk.target_schema_id, fk.target_check_id))
                if pk is None and fk.target_schema_id == plan.schema_id:
                    # self-referential FK (parent_url -> own url PK): the
                    # table IS registered — probe its frozen registry, or an
                    # empty one when the plan declares no such constraint
                    # (J3), never "no available schema" (code-review r4)
                    if _exists(self.registry_dir):
                        pk = spark.read.parquet(self.registry_dir).where(
                            (F.col("schema_id") == plan.schema_id)
                            & (F.col("check_id") == fk.target_check_id)
                        )
                    else:
                        pk = spark.createDataFrame(
                            [],
                            "schema_id string, check_id string, key_str "
                            "string, first_source string, first_ord long",
                        )
                violations = violations.unionByName(
                    fk_check(
                        masked, fk.check_id, fk.members, plan.schema_id,
                        fk.target_schema_id, pk, source_col, ord_col,
                    )
                )

        # null-safe joins on source: a null key row (null url) must still
        # pair with its own violations and carry its part_id — plain equi
        # joins drop it, marking the row validated and parking its
        # violations in a part_id=-1 blob that dynamic overwrite clobbers
        # per batch (code-review r3). ord is positionally stamped non-null
        # and unique, so eqNullSafe on source cannot fan out.
        failed = violations.select(
            F.col("source").alias("_fsrc"), F.col("ord").alias("_ford")
        ).distinct().withColumn("_f", F.lit(True))
        base = subset.select(
            F.col(source_col).alias("source"),
            F.col(ord_col).cast("long").alias("ord"),
            F.lit(plan.schema_id).alias("schema_id"),
            F.col("part_id"),
        )
        verdicts = (
            base.join(
                failed,
                base["source"].eqNullSafe(failed["_fsrc"])
                & (base["ord"] == failed["_ford"]),
                "left",
            )
            .select(
                "source", "ord", "schema_id",
                F.coalesce(~F.col("_f"), F.lit(True)).alias("validated"),
                "part_id",
            )
            .withColumn(
                "status", F.when(F.col("validated"), "ok").otherwise("failed")
            )
        )
        # violations are output-sized and feed BOTH writes (verdicts via the
        # failed-join, viol_out directly) — persist once so the two writes
        # do not each re-execute the violation pipeline (code-review r4)
        violations = violations.persist()
        part_of = subset.select(
            F.col(source_col).alias("_psrc"), F.col(ord_col).cast("long").alias("_pord"),
            "part_id",
        )
        viol_out = (
            violations.join(
                part_of,
                violations["source"].eqNullSafe(part_of["_psrc"])
                & (violations["ord"] == part_of["_pord"]),
                "left",
            )
            .drop("_psrc", "_pord")
            .na.fill({"part_id": -1})
        )

        # dynamic overwrite scoped to OUR writes and restored after — this
        # is session-global config, and leaving it flipped silently changes
        # overwrite semantics for unrelated writers (code-review r4)
        prev_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            verdicts.write.mode("overwrite").partitionBy("part_id").parquet(
                self.verdicts_dir
            )
            viol_out.write.mode("overwrite").partitionBy("part_id").parquet(
                self.violations_dir
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )

        # ---- lineage append (only after data committed)
        # stats come from READING BACK the just-committed parquet (output-
        # sized), not from re-running the validation DAG — each write scans
        # the subset once; the violation pipeline ran once (persisted).
        wall = time.time() - t0
        # explicit schemas: a processed batch may legitimately contain zero
        # violations (or zero rows under max_partitions), leaving a dir with
        # no data files — schema inference would fail there
        verdict_ddl = (
            "source string, ord long, schema_id string, validated boolean, "
            "status string, part_id int"
        )
        viol_ddl = (
            "source string, ord long, schema_id string, check_id string, "
            "key_str string, reason string, description string, part_id int"
        )
        done_verdicts = spark.read.schema(verdict_ddl).parquet(
            self.verdicts_dir
        ).where(F.col("part_id").isin(todo))
        done_viol = spark.read.schema(viol_ddl).parquet(
            self.violations_dir
        ).where(F.col("part_id").isin(todo))
        # EVERY todo partition gets a lineage row — a 0-row partition is
        # legitimately complete; deriving lineage from verdict rows alone
        # left empty partitions eternally "incomplete" and livelocked
        # resumable max_partitions runs (code-review r3)
        todo_df = spark.createDataFrame([(int(p),) for p in todo], "part_id int")
        stats = (
            todo_df.join(
                done_verdicts.groupBy("part_id")
                .agg(F.count(F.lit(1)).alias("rows_scanned")),
                "part_id", "left",
            )
            .join(
                done_viol.groupBy("part_id").agg(F.count(F.lit(1)).alias("violations")),
                "part_id", "left",
            )
            .na.fill({"rows_scanned": 0, "violations": 0})
            .select(
                "part_id", "rows_scanned", "violations",
                F.lit(wall / max(len(todo), 1)).alias("wall_time_s"),
                F.lit(run_id).alias("run_id"),
                F.lit("ok").alias("status"),
            )
        )
        stats.write.mode("append").parquet(self.lineage_dir)
        violations.unpersist()
        res.release()  # outputs committed; drop this batch's caches
        return {"processed": todo, "skipped": sorted(done), "wall_time_s": wall}


def _anti_on_identity(
    left: DataFrame, viol: DataFrame, source_col: str, ord_col: str
) -> DataFrame:
    """left_anti on the (source, ord) identity, NULL-SAFE on source: a
    null-source doc's own violation rows must still mask it out of dup/FK
    probing — plain equi-joins never match the null and the doc stays a
    "survivor" (code-review r4; same class as the verdict pairing below)."""
    f = viol.select(
        F.col("source").alias("_asrc"), F.col("ord").alias("_aord")
    ).distinct()
    return left.join(
        f,
        left[source_col].eqNullSafe(f["_asrc"])
        & (left[ord_col].cast("long") == f["_aord"]),
        "left_anti",
    )


def _row_checks_only(plan: ValidationPlan) -> ValidationPlan:
    """Partition-local slice of the plan: row checks only. Uniqueness runs
    against the frozen registry; FK probes against frozen registries are a
    cross-run concern handled by the caller (pages/1.0 declares none)."""
    import copy

    p = copy.copy(plan)
    p.uniques = []
    p.fks = []
    return p


def _dup_violations_vs_registry(
    subset: DataFrame,
    plan: ValidationPlan,
    registry: DataFrame,
    source_col: str,
    ord_col: str,
) -> DataFrame:
    """Duplicate-key violations for a partition subset against the frozen
    global registry (first-writer attribution comes from the registry)."""
    from .operators.uniqueness import _doc_keys

    out = None
    for uq in plan.uniques:
        keys = _doc_keys(subset, uq.check_id, uq.members, source_col, ord_col)
        reg = registry.where(
            (F.col("schema_id") == plan.schema_id) & (F.col("check_id") == uq.check_id)
        ).select("key_str", "first_source", "first_ord")
        # a duplicate is any holder that is NOT the registry's first holder —
        # compared on the FULL identity (source, ord), not source alone:
        # with source==url duplicates share their source value by construction
        # (the reference flags same-file dups too, ValidatedJSONSchema.java:378-383)
        v = (
            keys.join(reg, "key_str", "inner")
            .where(
                (F.col("ord") != F.col("first_ord"))
                | (F.col("source") != F.col("first_source"))
            )
            .select(
                "source", "ord",
                F.lit(plan.schema_id).alias("schema_id"),
                F.lit(uq.check_id).alias("check_id"),
                "key_str",
                F.lit("dup_pk").alias("reason"),
                F.format_string(
                    "Duplicate PK in %s and %s", F.col("first_source"), F.col("source")
                ).alias("description"),
            )
        )
        out = v if out is None else out.unionByName(v)
    return out
