"""Validation lifecycle: scan → pass 1 → pass 2 → verdicts/violations.

Mirrors the reference two-pass lifecycle (``FairGTrackValidatorCli.java:225-362``)
as five DataFrame programs instead of a per-document interpreter:

- pass 1 = vectorized predicate columns (schema checks) + one uniqueness
  aggregation per constraint (``Validator.java:111-126``);
- documents failing pass 1 are masked out of pass 2
  (``FairGTrackValidatorCli.java:276-315``) — and, subtly, schema-check
  failures abort *before* PK recording (``ValidatedJSONSchema.java:360-392``),
  so their keys never enter the registry;
- pass 2 = FK anti-joins against the pass-1 PK registries
  (``Validator.java:128-179``). The registry is complete before any probe —
  same global two-phase structure as the reference, but each phase is a
  parallel shuffle instead of a file loop.

Scale notes: corpora are validated per schema_id (the discriminator column ≙
``ValidableDoc.getJsonSchemaId``); each uniqueness constraint is one hash
shuffle on its key string; PK registries are cached + broadcast into the FK
anti-joins when small. Docs are scanned ONCE (the reference reads every file
twice, ``FairGTrackValidatorCli.java:265,328``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.checks import apply_checks
from .operators.fk import fk_check
from .operators.uniqueness import uniqueness_check
from .plans.schema_compile import ValidationPlan

VIOLATION_SCHEMA = (
    "source string, ord long, schema_id string, check_id string, "
    "key_str string, reason string, description string"
)


@dataclass
class ValidationResult:
    verdicts: DataFrame  # source, ord, schema_id, validated boolean
    violations: DataFrame  # VIOLATION_SCHEMA
    pk_registries: dict[tuple[str, str], DataFrame] = field(default_factory=dict)


def validate_corpus(
    corpus: dict[str, tuple[ValidationPlan, DataFrame]],
    source_col: str = "source",
    ord_col: str = "ord",
) -> ValidationResult:
    """Validate a multi-schema corpus: ``{schema_id: (plan, df)}``.

    Each df must carry ``source_col`` (identity) and ``ord_col`` (deterministic
    total order ≙ directory-walk order — SURVEY §2.6).
    """
    spark = next(iter(corpus.values()))[1].sparkSession
    empty_violations = spark.createDataFrame([], VIOLATION_SCHEMA)

    all_p1_violations: list[DataFrame] = []
    pk_registries: dict[tuple[str, str], DataFrame] = {}
    pk_empty: dict[tuple[str, str], bool] = {}
    pass2_docs: dict[str, DataFrame] = {}

    # ---------------- PASS 1: schema checks + uniqueness, per schema ----------
    for schema_id, (plan, df) in corpus.items():
        # persist: violation rows are output-sized and consumed by 3+ actions
        # (survivor mask, union, verdict join) — one evaluation, not four.
        schema_viol = apply_checks(
            df, plan.checks, plan.join_checks, schema_id, source_col, ord_col
        ).persist()
        p1_failed = schema_viol.select(source_col, "ord").distinct()
        survivors = df.join(
            p1_failed.withColumnRenamed("ord", ord_col) if ord_col != "ord" else p1_failed,
            [source_col, ord_col],
            "left_anti",
        )

        dup_violations: list[DataFrame] = [schema_viol]
        dup_failed_docs: list[DataFrame] = []
        for uq in plan.uniques:
            res = uniqueness_check(
                survivors, uq.check_id, uq.members, schema_id, source_col, ord_col
            )
            # no extra cache: uniqueness_check persists its ranked keys, and
            # the registry is a cheap filter over that. Emptiness (J3) is
            # evaluated lazily — only when some FK actually targets this
            # registry — so corpora without FKs never pay the extra job.
            pk_registries[(schema_id, uq.check_id)] = res.pk
            dup_violations.append(res.violations)
            dup_failed_docs.append(res.violations.select("source", "ord").distinct())

        p1_viol = _union_all(dup_violations, empty_violations)
        all_p1_violations.append(p1_viol)

        # mask pass-1 failures out of pass 2 (schema failures AND dup failures)
        masked = survivors
        for d in dup_failed_docs:
            rd = d.withColumnRenamed("ord", ord_col) if ord_col != "ord" else d
            rd = rd.withColumnRenamed("source", source_col) if source_col != "source" else rd
            masked = masked.join(rd, [source_col, ord_col], "left_anti")
        pass2_docs[schema_id] = masked

    # ---------------- PASS 2: FK probes against completed registries ----------
    all_p2_violations: list[DataFrame] = []
    registered = set(corpus.keys())
    for schema_id, (plan, _) in corpus.items():
        docs = pass2_docs[schema_id]
        for fk in plan.fks:
            key = (fk.target_schema_id, fk.target_check_id)
            if fk.target_schema_id not in registered:
                pk, empty = None, None
            elif key in pk_registries:
                pk = pk_registries[key]
                if key not in pk_empty:
                    # first FK touching this registry: persist it (it is
                    # re-read by every probe) and settle emptiness (J3)
                    pk = pk.persist()
                    pk_registries[key] = pk
                    pk_empty[key] = pk.limit(1).count() == 0
                empty = pk_empty[key]
                pk = pk_registries[key]
            else:
                # target schema registered but has no such constraint ⇒ no
                # recorded documents for it (J3, Validator.java:164-167)
                pk, empty = spark.createDataFrame(
                    [], "schema_id string, check_id string, key_str string, first_source string"
                ), True
            all_p2_violations.append(
                fk_check(
                    docs, fk.check_id, fk.members, schema_id,
                    fk.target_schema_id, pk, source_col, ord_col,
                    pk_known_empty=empty,
                )
            )

    # Persist the unioned violations: they are output-sized (violations ≪
    # corpus) and every downstream consumer (verdict join, counts, sinks)
    # would otherwise re-execute the full scan+shuffle pipeline per action.
    violations = _union_all(
        all_p1_violations + all_p2_violations, empty_violations
    ).persist()

    # ---------------- verdicts -------------------------------------------------
    verdict_parts = []
    for schema_id, (_, df) in corpus.items():
        verdict_parts.append(
            df.select(
                F.col(source_col).alias("source"),
                F.col(ord_col).cast("long").alias("ord"),
                F.lit(schema_id).alias("schema_id"),
            )
        )
    all_docs = verdict_parts[0]
    for p in verdict_parts[1:]:
        all_docs = all_docs.unionByName(p)
    failed = violations.select("source", "ord").distinct().withColumn("_f", F.lit(True))
    verdicts = (
        all_docs.join(failed, ["source", "ord"], "left")
        .select(
            "source", "ord", "schema_id",
            F.coalesce(~F.col("_f"), F.lit(True)).alias("validated"),
        )
    )
    return ValidationResult(
        verdicts=verdicts, violations=violations, pk_registries=pk_registries
    )


def _union_all(dfs: list[DataFrame], empty: DataFrame) -> DataFrame:
    out = empty
    for d in dfs:
        out = out.unionByName(d)
    return out
