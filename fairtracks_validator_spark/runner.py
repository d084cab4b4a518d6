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

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.checks import apply_checks, checks_pass_predicate
from .operators.fk import fk_check
from .operators.uniqueness import uniqueness_check
from .functions.keys import flat_key_string, is_flat_members
from .plans.schema_compile import ValidationPlan

VIOLATION_SCHEMA = (
    "source string, ord long, schema_id string, check_id string, "
    "key_str string, reason string, description string"
)

# per-document violation details nested inside the wide verdict relation
# (source/ord/schema_id live on the row itself)
_WIDE_VIOLATION_DDL = (
    "array<struct<check_id:string,key_str:string,reason:string,"
    "description:string>>"
)

# registries at or below this many distinct keys get an explicit broadcast
# hint in FK probes (≈ a few hundred MB of key strings); larger ones rely on
# AQE's runtime broadcast/sort-merge selection.
BROADCAST_MAX_PK_KEYS = 5_000_000

# fused-path uniqueness: when the corpus has at most this many DUPLICATED
# keys (not total keys — near-unique url corpora have very few), resolve
# first-writer-wins with a broadcast of the duplicate keys' first holders
# instead of shuffling + sorting the entire verdict stream (see
# ``_dup_candidate_firsts``). ~2M keys ≈ 200 MB broadcast, well under
# Spark's 8 GB broadcast-relation cap; beyond it the window path takes over.
DUP_BROADCAST_MAX_KEYS = 2_000_000


@dataclass
class ValidationResult:
    verdicts: DataFrame  # source, ord, schema_id, validated boolean
    violations: DataFrame  # VIOLATION_SCHEMA
    pk_registries: dict[tuple[str, str], DataFrame] = field(default_factory=dict)
    _persisted: list = field(default_factory=list, repr=False)
    # one-row-per-doc verdict+nested-violations relation when the plan shape
    # allowed building it without extra shuffles (fused single-schema path);
    # None on the general multi-schema path (wide_verdicts() joins instead)
    wide: DataFrame | None = field(default=None, repr=False)

    def release(self) -> None:
        """Unpersist every relation this run cached. Call after the last
        action on verdicts/violations/registries — a long-lived session
        looping validation batches otherwise accumulates cached relations
        until eviction pressure degrades everything else (code-review r3)."""
        for p in self._persisted:
            try:
                p.unpersist()
            except Exception:
                pass
        self._persisted.clear()

    def summary(self) -> dict[str, int]:
        """docs / failed-docs / violation counts in ONE Spark action.

        Both branches union into one plan, so ReuseExchange executes the
        underlying scan+shuffle once — the way a real run sinks verdicts and
        violations in a single pass rather than one job per output.
        """
        status = (
            F.col("status")
            if "status" in self.verdicts.columns
            else F.when(F.col("validated"), "ok").otherwise("failed")
        )
        v = self.verdicts.select(
            F.lit("verdicts").alias("kind"),
            (status == "failed").cast("long").alias("bad"),
            (status == "ignored").cast("long").alias("ign"),
        )
        w = self.violations.select(
            F.lit("violations").alias("kind"),
            F.lit(1).cast("long").alias("bad"),
            F.lit(0).cast("long").alias("ign"),
        )
        rows = (
            v.unionByName(w)
            .groupBy("kind")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("bad").alias("bad"),
                F.sum("ign").alias("ign"),
            )
            .collect()
        )
        out = {"docs": 0, "failed_docs": 0, "ignored_docs": 0, "violations": 0}
        for r in rows:
            if r["kind"] == "verdicts":
                out["docs"], out["failed_docs"], out["ignored_docs"] = (
                    r["n"], r["bad"], r["ign"],
                )
            else:
                out["violations"] = r["n"]
        return out

    def wide_verdicts(self) -> DataFrame:
        """ONE row per document: the verdict columns plus a nested array of
        that document's violation rows — the single-output sink shape
        (``sink_observed``). A 100 TB run materializes THIS relation once;
        the flat violations view is a lazy ``explode`` over it.

        The fused single-schema path builds it inside the existing
        scan+shuffle for free (``self.wide``). The general multi-schema
        path reconstructs it from the two flat relations: group the
        (output-sized) violations by document identity, left-join onto the
        verdicts — two extra output-sized shuffles, never a corpus rescan.
        """
        if self.wide is not None:
            return self.wide
        grouped = self.violations.groupBy(
            F.col("source").alias("_vsrc"),
            F.col("ord").alias("_vord"),
            F.col("schema_id").alias("_vsid"),
        ).agg(
            F.collect_list(
                F.struct("check_id", "key_str", "reason", "description")
            ).alias("_viol")
        )
        v = self.verdicts
        status = (
            F.col("status")
            if "status" in v.columns
            else F.when(F.col("validated"), "ok").otherwise("failed")
        )
        return (
            v.join(
                grouped,
                v["source"].eqNullSafe(grouped["_vsrc"])
                & v["ord"].eqNullSafe(grouped["_vord"])
                & (v["schema_id"] == grouped["_vsid"]),
                "left",
            )
            .select(
                v["source"], v["ord"], v["schema_id"], v["validated"],
                status.alias("status"),
                F.coalesce(
                    F.col("_viol"), F.array().cast(_WIDE_VIOLATION_DDL)
                ).alias("violations"),
            )
        )


def sink_observed(
    result: ValidationResult,
    path: str | None = None,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Materialize verdicts AND violations in ONE Spark action, with the run
    counts riding the same action as ``DataFrame.observe`` accumulators.

    This is the production sink shape: a trillion-row run cannot afford one
    Spark job per output (verdicts, violations, doc count, failed count,
    violation count = 5 serial jobs whose fixed scheduling latency does not
    shrink with cluster size — the measured N→4N scaling residue,
    BENCH/BASELINE.md). One observed write = one job: counts cost zero extra
    passes, and the flat violations view stays available as a lazy explode
    over the written table.

    ``path=None`` writes to the built-in ``noop`` format — full computation,
    no sink I/O — which is what the scaling benchmark times (a single VM's
    local disk would otherwise add a non-scaling write bottleneck that a real
    per-node cluster disk does not have).
    """
    from pyspark.sql import Observation

    wide = result.wide_verdicts()
    obs = Observation()
    observed = wide.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        # status=='failed', NOT ~validated: orphan docs (status='ignored')
        # also carry validated=False and must not double-count as failures
        # (same convention as ValidationResult.summary())
        F.sum((F.col("status") == F.lit("failed")).cast("long")).alias(
            "failed_docs"
        ),
        F.sum((F.col("status") == F.lit("ignored")).cast("long")).alias(
            "ignored_docs"
        ),
        F.sum(F.size("violations").cast("long")).alias("violations"),
    )
    writer = observed.write.mode("overwrite")
    if path is None:
        writer.format("noop").save()
    else:
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(fmt).save(path)
    m = obs.get
    return {
        k: int(m[k] or 0)
        for k in ("docs", "failed_docs", "ignored_docs", "violations")
    }


def _null_ddl_for_steps(steps: list[tuple[str, str | None]]) -> str:
    """DDL of a null column shaped like the ACCESS PATTERN of a jPath whose
    root column is absent: `a.b[].c` pads `a` as
    struct<b: array<struct<c: string>>> so getField/fan-out resolve and every
    check sees "value absent"."""
    t = "string"
    for name, idx in reversed(steps[1:]):
        inner = f"array<{t}>" if idx is not None else t
        t = f"struct<{name}:{inner}>"
    _name0, idx0 = steps[0]
    return f"array<{t}>" if idx0 is not None else t


def _merged_steps_ddl(paths_steps: list[tuple[list, str | None]]) -> str:
    """DDL merging the shapes of several jPath step-lists that share their
    FIRST step (the column/field being padded).

    Padding from one path's shape alone breaks sibling paths — `a` padded
    as plain string leaves `a.b` unresolvable (code-review r3), and `a.b`
    padded as string leaves `a.b.c` unresolvable (advice r4) — so every
    shape merges into one nested struct; a path's explicit DDL hint
    (map-encoded objects) becomes that position's leaf type."""

    def new_node():
        return {"leaf": None, "children": {}}

    tree = new_node()
    root_is_arr = False
    for steps, hint in paths_steps:
        if steps[0][1] is not None:
            root_is_arr = True
        node = tree
        for name, idx in steps[1:]:
            child = node["children"].setdefault(name, [idx is not None, new_node()])
            child[0] = child[0] or idx is not None
            node = child[1]
        if hint:
            node["leaf"] = hint

    def render(node):
        if node["children"]:
            fields = ",".join(
                f"{name}:" + (f"array<{render(c[1])}>" if c[0] else render(c[1]))
                for name, c in sorted(node["children"].items())
            )
            return f"struct<{fields}>"
        return node["leaf"] or "string"

    t = render(tree)
    return f"array<{t}>" if root_is_arr else t


def _plan_steps_under(plan: ValidationPlan, root_name: str):
    """(steps, hint) for every parseable plan jPath rooted at ``root_name``."""
    from .functions.keys import _parse_jpath

    out = []
    for path, hint in (plan.jpaths or {}).items():
        try:
            steps = _parse_jpath(path)
        except ValueError:
            continue
        if steps[0][0] == root_name:
            out.append((steps, hint))
    return out


def _merged_null_ddl(root_name: str, plan: ValidationPlan) -> str:
    """DDL for an absent root column covering EVERY plan jPath under it."""
    matched = _plan_steps_under(plan, root_name)
    return _merged_steps_ddl(matched) if matched else ""


def align_to_plan(df: DataFrame, plan: ValidationPlan) -> DataFrame:
    """Schema-drift tolerance: every jPath the plan references must RESOLVE
    against ``df`` — the reference treats an absent property as "no value"
    (required fails, every other keyword is vacuous, keys contribute
    nothing, ``ValidableDoc.java:137-147``), while unpatched Spark would
    throw UNRESOLVED_COLUMN at analysis. Absent ROOT columns are padded as
    typed nulls matching the path shape (or the plan's DDL hint for
    map-encoded objects); absent depth-1 struct fields are padded via
    ``withField`` (arrays of structs via ``transform``). Each pad warns —
    drift is tolerated, never silent."""
    import warnings as _w

    from pyspark.sql import types as T

    from .functions.keys import _parse_jpath

    cols = set(df.columns)
    for path in sorted(plan.jpaths or {}):
        try:
            steps = _parse_jpath(path)
        except ValueError:
            continue
        root, _ridx = steps[0]
        if root not in cols:
            ddl = _merged_null_ddl(root, plan) or _null_ddl_for_steps(steps)
            _w.warn(
                f"document column {root!r} (for schema path {path!r}) is "
                f"absent from the table — treating as null ({plan.schema_id}; "
                "schema drift)"
            )
            df = df.withColumn(root, F.lit(None).cast(ddl))
            cols.add(root)
        elif len(steps) > 1:
            dt = df.schema[root].dataType
            name1, _idx1 = steps[1]
            # Merge the shapes of EVERY plan jPath through (root, name1) —
            # padding from this path alone would shadow a sibling's deeper
            # access ('a.b' pads b as string, then 'a.b.c' crashes).
            sibling = [
                (s[1:], h)
                for s, h in _plan_steps_under(plan, root)
                if len(s) > 1 and s[1][0] == name1
            ]
            field_ddl = _merged_steps_ddl(sibling)
            if isinstance(dt, T.StructType) and name1 not in dt.fieldNames():
                _w.warn(
                    f"struct field {root}.{name1} (for schema path {path!r}) "
                    f"is absent — treating as null ({plan.schema_id}; schema drift)"
                )
                df = df.withColumn(
                    root,
                    F.col(root).withField(name1, F.lit(None).cast(field_ddl)),
                )
            elif (
                isinstance(dt, T.ArrayType)
                and isinstance(dt.elementType, T.StructType)
                and name1 not in dt.elementType.fieldNames()
            ):
                _w.warn(
                    f"struct field {root}[].{name1} (for schema path {path!r}) "
                    f"is absent — treating as null ({plan.schema_id}; schema drift)"
                )

                def _pad(name: str, ddl: str):
                    return lambda x: x.withField(name, F.lit(None).cast(ddl))

                df = df.withColumn(
                    root, F.transform(F.col(root), _pad(name1, field_ddl))
                )
    return df


def validate_corpus(
    corpus: dict[str, tuple[ValidationPlan, DataFrame]],
    source_col: str = "source",
    ord_col: str = "ord",
    seed_registries: dict[tuple[str, str], DataFrame] | None = None,
    cache_narrow: bool = False,
    dup_strategy: str = "window",
) -> ValidationResult:
    """Validate a multi-schema corpus: ``{schema_id: (plan, df)}``.

    Each df must carry ``source_col`` (identity) and ``ord_col`` (deterministic
    total order ≙ directory-walk order — SURVEY §2.6).

    ``seed_registries``: pre-populated PK sets keyed by (schema_id, check_id)
    (A4, root README.md:25-35 — ``sources.catalog.seed_pk_registry``), unioned
    into the corpus-derived registries before FK probing.

    ``dup_strategy`` (fused single-schema path only): ``"window"`` (default)
    resolves first-writer-wins with one hash shuffle + sort of the narrow
    verdict stream; ``"auto"``/``"broadcast"`` probe the duplicate-key
    population and, when it fits the broadcast gate, resolve map-only via a
    candidate broadcast (``_dup_candidate_firsts``) with no corpus shuffle
    at all. The window default is a MEASURED choice, not a shortcut: the
    broadcast probe must re-scan the corpus once to ok-gate candidate
    first-holders, and for document tables the verdict stream it would keep
    off the wire is only ~1-2%% of the scanned bytes (40M-row pages table,
    local[16]: probe scan 10.9 s vs the whole window reduce ≈ 10 s) — a
    full re-read of a 100 TB table loses to shuffling 1-2 TB. Broadcast
    wins when rows are narrow relative to the key (the shuffle approaches
    scan size) or when shuffle capacity, not scan bandwidth, is the
    cluster's binding constraint.
    """
    if dup_strategy not in ("window", "auto", "broadcast"):
        raise ValueError(
            "dup_strategy must be 'window', 'auto' or 'broadcast', "
            f"got {dup_strategy!r}"
        )
    spark = next(iter(corpus.values()))[1].sparkSession
    empty_violations = spark.createDataFrame([], VIOLATION_SCHEMA)
    persisted: list = []  # released by ValidationResult.release()

    # schema-drift alignment: plan-referenced paths must resolve (absent ⇒
    # typed null column ⇒ reference "property absent" semantics)
    corpus = {
        sid: (plan, align_to_plan(df, plan))
        for sid, (plan, df) in corpus.items()
    }

    # web-scale fast path: single schema, pure-Column checks, at most one
    # flat-member uniqueness constraint, no FKs ⇒ ONE scan + ONE shuffle
    if len(corpus) == 1 and not seed_registries:
        schema_id, (plan, df) = next(iter(corpus.items()))
        if (
            not plan.join_checks
            and not plan.fks
            and len(plan.uniques) <= 1
            and all(is_flat_members(u.members) for u in plan.uniques)
        ):
            return _validate_fused(
                schema_id, plan, df, source_col, ord_col, empty_violations,
                cache_narrow=cache_narrow, dup_strategy=dup_strategy,
            )

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
        persisted.append(schema_viol)
        if not plan.join_checks:
            # pass-1 mask as a pure predicate — no anti-join, no shuffle
            survivors = df.where(checks_pass_predicate(plan.checks))
        else:
            # violation rows are always aliased ("source", "ord") — rename
            # BOTH back to the caller's column names before the anti-join
            p1_failed = schema_viol.select(
                F.col("source").alias(source_col), F.col("ord").alias(ord_col)
            ).distinct()
            survivors = df.join(p1_failed, [source_col, ord_col], "left_anti")

        dup_violations: list[DataFrame] = [schema_viol]
        dup_failed_docs: list[DataFrame] = []
        for uq in plan.uniques:
            res = uniqueness_check(
                survivors, uq.check_id, uq.members, schema_id, source_col, ord_col
            )
            # cascade-path caches (fan-out keys) register on the run's
            # persisted list so release() drops them; the single-pass path
            # deliberately caches nothing (see _resolve_single_pass).
            # Emptiness (J3) is
            # evaluated lazily — only when some FK actually targets this
            # registry — so corpora without FKs never pay the extra job.
            persisted.extend(res.persisted)
            pk = res.pk
            seed = (seed_registries or {}).get((schema_id, uq.check_id))
            if seed is not None:
                pk = pk.unionByName(seed)  # SO2: seed ∪ corpus keys
            pk_registries[(schema_id, uq.check_id)] = pk
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

    # seeds for registries with no corpus-side constraint (A4: the target
    # schema may have zero documents but externally provided keys)
    for skey, seed in (seed_registries or {}).items():
        if skey not in pk_registries:
            pk_registries[skey] = seed

    # ---------------- PASS 2: FK probes against completed registries ----------
    all_p2_violations: list[DataFrame] = []
    registered = set(corpus.keys()) | {s for (s, _) in (seed_registries or {})}
    for schema_id, (plan, _) in corpus.items():
        docs = pass2_docs[schema_id]
        for fk in plan.fks:
            key = (fk.target_schema_id, fk.target_check_id)
            if fk.target_schema_id not in registered:
                pk, empty, bcast = None, None, None
            elif key in pk_registries:
                pk = pk_registries[key]
                if key not in pk_empty:
                    # first FK touching this registry: persist it (it is
                    # re-read by every probe), settle emptiness (J3), and
                    # size-gate the broadcast hint — a huge registry must go
                    # through sort-merge/AQE, never a forced broadcast.
                    pk = pk.persist()
                    persisted.append(pk)
                    pk_registries[key] = pk
                    n = pk.count()
                    pk_empty[key] = (n == 0, n <= BROADCAST_MAX_PK_KEYS)
                empty, bcast = pk_empty[key]
                pk = pk_registries[key]
            else:
                # target schema registered but has no such constraint ⇒ no
                # recorded documents for it (J3, Validator.java:164-167)
                pk, empty, bcast = spark.createDataFrame(
                    [], "schema_id string, check_id string, key_str string, "
                        "first_source string, first_ord long"
                ), True, None
            all_p2_violations.append(
                fk_check(
                    docs, fk.check_id, fk.members, schema_id,
                    fk.target_schema_id, pk, source_col, ord_col,
                    broadcast_pk=bcast,
                    pk_known_empty=empty,
                )
            )

    # Persist the unioned violations: they are output-sized (violations ≪
    # corpus) and every downstream consumer (verdict join, counts, sinks)
    # would otherwise re-execute the full scan+shuffle pipeline per action.
    violations = _union_all(
        all_p1_violations + all_p2_violations, empty_violations
    ).persist()
    persisted.append(violations)

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
    # null-safe identity join INCLUDING schema_id (code-review r4): a plain
    # equi join never matches a null source (doc fails yet reads validated),
    # and joining on (source, ord) alone lets one schema's violation flip a
    # doc of another schema that happens to share the identity pair
    failed = violations.select(
        F.col("source").alias("_fsrc"), F.col("ord").alias("_ford"),
        F.col("schema_id").alias("_fsid"),
    ).distinct().withColumn("_f", F.lit(True))
    verdicts = (
        all_docs.join(
            failed,
            all_docs["source"].eqNullSafe(failed["_fsrc"])
            & all_docs["ord"].eqNullSafe(failed["_ford"])
            & (all_docs["schema_id"] == failed["_fsid"]),
            "left",
        )
        .select(
            "source", "ord", "schema_id",
            F.coalesce(~F.col("_f"), F.lit(True)).alias("validated"),
        )
        .withColumn("status", F.when(F.col("validated"), "ok").otherwise("failed"))
    )
    return ValidationResult(
        verdicts=verdicts, violations=violations, pk_registries=pk_registries,
        _persisted=persisted,
    )


def validate_routed(
    df: DataFrame,
    plans: dict[str, ValidationPlan],
    schema_id_col: str = "schema_id",
    source_col: str = "source",
    ord_col: str = "ord",
    seed_registries: dict[tuple[str, str], DataFrame] | None = None,
    cache_narrow: bool = False,
) -> ValidationResult:
    """Route a heterogeneous corpus by its discriminator column and validate.

    Orphan documents (schema id not registered) appear BOTH as violation
    rows and as verdict rows with ``status='ignored'`` — the reference
    counts them in its run stats rather than dropping them
    (``FairGTrackValidatorCli.java:227-233``; skip semantics of
    ``ValidableDocUnmatchingSchemaException``, ``ValidatedJSONSchema.java:394-397``).
    """
    from .sources.catalog import orphan_verdicts, route_corpus

    corpus, orphans = route_corpus(df, plans, schema_id_col)
    res = validate_corpus(corpus, source_col, ord_col, seed_registries,
                          cache_narrow=cache_narrow)
    verdicts = res.verdicts.unionByName(orphan_verdicts(orphans))
    violations = res.violations.unionByName(
        orphans.select(*[c.split()[0] for c in VIOLATION_SCHEMA.split(", ")])
    )
    # carry the inner run's caches so release() on the routed result works
    # (code-review r4 — dropping them leaked every persisted relation)
    return ValidationResult(
        verdicts=verdicts, violations=violations,
        pk_registries=res.pk_registries, _persisted=res._persisted,
    )


def _union_all(dfs: list[DataFrame], empty: DataFrame) -> DataFrame:
    out = empty
    for d in dfs:
        out = out.unionByName(d)
    return out


def _validate_fused(
    schema_id: str,
    plan: ValidationPlan,
    df: DataFrame,
    source_col: str,
    ord_col: str,
    empty_violations: DataFrame,
    cache_narrow: bool = False,
    dup_strategy: str = "auto",
) -> ValidationResult:
    """Single-scan, single-shuffle validation (the 100 TB shape).

    One projection computes, per row: the all-ok verdict predicate, the
    failed-check structs (built ONLY for failing rows), and the uniqueness
    key (gated by all-ok — schema-failed docs never record keys,
    ``ValidatedJSONSchema.java:360-392``). Rows without a key get a unique
    surrogate so they ride the same shuffle without skewing a null bucket,
    and first-writer-wins resolves in one window. The reference reads every
    document twice (``FairGTrackValidatorCli.java:265,328``); this path scans
    once — PER ACTION.

    ``cache_narrow`` (code-review r4 — the old comment here wrongly claimed
    shuffle-map reuse across sibling actions; each action builds its own
    QueryExecution with fresh shuffle dependencies, so materializing
    verdicts THEN violations re-executes the scan+shuffle): False (default)
    leaves every output lazy. True persists the post-shuffle narrow
    relation DISK_ONLY (~1% of input width) so each output reads the cache
    instead of re-scanning the input; release via
    ``ValidationResult.release()``. Measured trade at 4M pages rows on
    local[8] (host-local parquet): lazy 7.96 s vs cached 9.62 s for
    verdicts+violations — the cache WRITE costs more than recomputing a
    cheap local scan, so the default stays False for single-node use. The
    flag exists for the cluster shape it is named for: when the input is
    remote object storage at 10^12 rows, scanning the full corpus once per
    output dwarfs a 1%-width local spill, and callers materializing
    several outputs should enable it.
    """
    from pyspark.sql import Window

    from .operators.checks import check_entries

    all_ok = checks_pass_predicate(plan.checks)
    entries = check_entries(plan.checks)
    _entry_ddl = "array<struct<check_id:string,ok:boolean,message:string>>"
    if entries:
        # UNFILTERED entry array (r6): F.filter is a CodegenFallback HOF, so
        # filtering here forced every check expression + message to
        # re-evaluate interpreted per failing row (draft7 violations: 3.2 s
        # noop vs 0.3 s for the verdicts that share the same checks).
        # Consumers drop passing entries after explode / on the
        # materialized array instead; passing entries carry null messages
        # (check_entries gates them), so the array stays shuffle-light.
        fails = F.when(~all_ok, F.array(*entries))
    else:
        # PK-only plan: F.array() is array<void> and getField on it fails
        # at analysis (code-review r3) — no row checks means no fails
        fails = F.lit(None).cast(_entry_ddl)
    uq = plan.uniques[0] if plan.uniques else None

    cols = [
        F.col(source_col).alias("source"),
        F.col(ord_col).cast("long").alias("ord"),
        all_ok.alias("_ok"),
        fails.alias("_fails"),
    ]
    if uq is not None:
        cols.append(F.when(all_ok, flat_key_string(uq.members)).alias("_key"))
    narrow = df.select(*cols)
    persisted: list = []

    # nested violation entries for the wide (single-sink) relation — same
    # rows the flat `violations` view explodes to, kept on the document row
    _empty_viol = F.array().cast(_WIDE_VIOLATION_DDL)
    schema_fail_entries = F.coalesce(
        F.transform(
            F.filter(F.col("_fails"), lambda e: ~e.getField("ok")),
            lambda e: F.struct(
                e.getField("check_id").alias("check_id"),
                F.lit(None).cast("string").alias("key_str"),
                F.lit("schema").alias("reason"),
                e.getField("message").alias("description"),
            ),
        ),
        _empty_viol,
    )

    if uq is None:
        if cache_narrow:
            narrow = narrow.persist(StorageLevel.DISK_ONLY)
            persisted.append(narrow)
        verdicts = narrow.select(
            "source", "ord", F.lit(schema_id).alias("schema_id"),
            F.col("_ok").alias("validated"),
            F.when(F.col("_ok"), "ok").otherwise("failed").alias("status"),
        )
        violations = _explode_fails(narrow, schema_id)
        wide = narrow.select(
            "source", "ord", F.lit(schema_id).alias("schema_id"),
            F.col("_ok").alias("validated"),
            F.when(F.col("_ok"), "ok").otherwise("failed").alias("status"),
            F.when(~F.col("_ok"), schema_fail_entries)
            .otherwise(_empty_viol)
            .alias("violations"),
        )
        return ValidationResult(verdicts=verdicts, violations=violations,
                                _persisted=persisted, wide=wide)

    # null-proof surrogate (code-review r4): F.concat null-propagates, so a
    # null source collapsed every no-key null-source row into ONE null
    # bucket — false dup_pk violations. The isNull flags make the sentinel
    # collision-free against real values.
    surrogate = F.concat_ws(
        "\x00",
        F.lit(""),
        F.col("source").isNull().cast("string"),
        F.coalesce(F.col("source"), F.lit("")),
        F.col("ord").isNull().cast("string"),
        F.coalesce(F.col("ord").cast("string"), F.lit("")),
    )
    # candidate-broadcast resolution (near-unique corpora — the url-keyed
    # web regime): two narrow probe jobs find the rare duplicated keys and
    # their first ok-holders, which then broadcast back into a MAP-ONLY
    # main pass — no shuffle (and crucially no sort) of the corpus-sized
    # verdict stream at all. Falls back to the window shuffle when the
    # duplicate population exceeds the broadcast gate or on streaming input.
    firsts = None
    if dup_strategy in ("auto", "broadcast") and not df.isStreaming:
        firsts = _dup_candidate_firsts(
            df, flat_key_string(uq.members), all_ok, source_col, ord_col
        )
    if firsts is not None:
        persisted.append(firsts)
        row_os = F.struct(
            F.col("ord").cast("long").alias("o"), F.col("source").alias("s")
        )
        shuffled = (
            narrow.join(
                F.broadcast(firsts), narrow["_key"] == firsts["_k"], "left"
            )
            .select(
                "source", "ord", "_ok", "_fails", "_key",
                # not a duplicated key (no broadcast hit) or the first ok
                # holder itself ⇒ rank 1; every later ok holder ⇒ rank 2
                # (downstream only distinguishes ==1 vs >1)
                F.when(
                    F.col("_first").isNotNull() & (row_os > F.col("_first")),
                    F.lit(2),
                )
                .otherwise(F.lit(1))
                .alias("_rn"),
                F.coalesce(F.col("_first.s"), F.col("source")).alias(
                    "_first_source"
                ),
            )
        )
    else:
        # NOT persisted: caching a nested-array relation through the columnar
        # cache builder is slower than recomputing, and Spark reuses the
        # shuffle map outputs across actions on this lineage (skipped stages).
        #
        # Shape choices, both for the reduce stage's sort (the single most
        # expensive step of the fused plan at 40M rows):
        # - `_key` does not ride the shuffle: it equals `_k2` for keyed rows
        #   and is only ever read for them (surrogate rows are rank 1 by
        #   construction), so it is re-derived after the window from the
        #   first byte (surrogates start with NUL, JSON key strings with
        #   '[') — ~1/3 less shuffle volume.
        # - rank via min(struct(ord, source)) over a KEY-ONLY window instead
        #   of row_number over (key, ord, source): the sort key halves, and
        #   rank no longer depends on intra-key sort stability (identical
        #   (ord, source) identities tie as rank 1 instead of one of them
        #   being arbitrarily blamed — same convention as the broadcast
        #   path's comparison against the first holder).
        w = Window.partitionBy("_k2")
        row_os = F.struct(F.col("ord").alias("o"), F.col("source").alias("s"))
        mn = F.min(row_os).over(w)
        shuffled = (
            narrow.withColumn("_k2", F.coalesce(F.col("_key"), surrogate))
            .drop("_key")
            .withColumn("_mn", mn)
            .select(
                "source", "ord", "_ok", "_fails",
                F.when(
                    F.substring("_k2", 1, 1) != "\x00", F.col("_k2")
                ).alias("_key"),
                F.when(row_os > F.col("_mn"), F.lit(2))
                .otherwise(F.lit(1))
                .alias("_rn"),
                F.col("_mn.s").alias("_first_source"),
            )
        )
    if cache_narrow:
        shuffled = shuffled.persist(StorageLevel.DISK_ONLY)
        persisted.append(shuffled)

    verdicts = shuffled.select(
        "source", "ord", F.lit(schema_id).alias("schema_id"),
        (F.col("_ok") & (F.col("_rn") == 1)).alias("validated"),
    ).withColumn("status", F.when(F.col("validated"), "ok").otherwise("failed"))
    dup_viol = shuffled.where(F.col("_ok") & (F.col("_rn") > 1)).select(
        "source", "ord",
        F.lit(schema_id).alias("schema_id"),
        F.lit(uq.check_id).alias("check_id"),
        F.col("_key").alias("key_str"),
        F.lit("dup_pk").alias("reason"),
        F.format_string(
            "Duplicate PK in %s and %s", F.col("_first_source"), F.col("source")
        ).alias("description"),
    )
    violations = _explode_fails(shuffled, schema_id).unionByName(dup_viol)
    dup_entry = F.array(
        F.struct(
            F.lit(uq.check_id).alias("check_id"),
            F.col("_key").alias("key_str"),
            F.lit("dup_pk").alias("reason"),
            F.format_string(
                "Duplicate PK in %s and %s",
                F.col("_first_source"), F.col("source"),
            ).alias("description"),
        )
    )
    wide = shuffled.select(
        "source", "ord", F.lit(schema_id).alias("schema_id"),
        (F.col("_ok") & (F.col("_rn") == 1)).alias("validated"),
        F.when(F.col("_ok") & (F.col("_rn") == 1), "ok")
        .otherwise("failed").alias("status"),
        F.when(~F.col("_ok"), schema_fail_entries)
        .when(F.col("_rn") > 1, dup_entry)
        .otherwise(_empty_viol)
        .alias("violations"),
    )
    pk = shuffled.where(
        F.col("_ok") & (F.col("_rn") == 1) & F.col("_key").isNotNull()
    ).select(
        F.lit(schema_id).alias("schema_id"),
        F.lit(uq.check_id).alias("check_id"),
        F.col("_key").alias("key_str"),
        F.col("source").alias("first_source"),
        F.col("ord").cast("long").alias("first_ord"),
    )
    return ValidationResult(
        verdicts=verdicts, violations=violations,
        pk_registries={(schema_id, uq.check_id): pk},
        _persisted=persisted, wide=wide,
    )


def _dup_candidate_firsts(
    df: DataFrame,
    key_raw,
    all_ok,
    source_col: str,
    ord_col: str,
    max_keys: int | None = None,
) -> DataFrame | None:
    """Probe the duplicate-key population for the fused uniqueness check.

    Returns a PERSISTED ``(_k, _first)`` relation — one row per key string
    that has ≥2 check-passing holders, with the first holder's
    ``struct(o=ord, s=source)`` — or ``None`` when a size gate trips (caller
    falls back to the window shuffle). Caller owns the unpersist via
    ``ValidationResult.release()``.

    Two probe jobs, both narrow:

    1. ``xxhash64`` of the UNGATED key (raw member columns — so the scan
       prunes to the key + identity columns and never evaluates the check
       predicates), hash-aggregated to the hashes seen more than once. An
       8-byte-hash shuffle with map-side partial aggregation instead of the
       corpus-wide key-string sort. Hash collisions only over-approximate
       the candidate set — exactness is restored in step 2, which groups by
       the real key string.
    2. Rows whose key-hash hits the (broadcast) duplicate-hash set — the
       rare candidates — are grouped by their actual key string, keeping
       ``min(struct(ord, source))`` over the check-PASSING holders only
       (schema-failed docs never record keys,
       ``ValidatedJSONSchema.java:360-392``). The ok-predicate is evaluated
       inside the aggregate's projection, i.e. only on candidate rows —
       there is no filter for the optimizer to push below the semi-join.

    Keys with <2 ok holders drop out (a lone ok holder is rank 1 whether or
    not failed docs shared its key — same as the window path, where failed
    rows ride surrogate keys). At 10^12-row scale with a heavily duplicated
    corpus the gate trips and the window path takes over; for the
    near-unique url regime this turns the whole uniqueness resolution into
    one broadcast hash lookup inside the scan stage.
    """
    if max_keys is None:
        max_keys = DUP_BROADCAST_MAX_KEYS
    keys = df.select(key_raw.alias("_k"))
    dup_h = (
        keys.where(F.col("_k").isNotNull())
        .groupBy(F.xxhash64("_k").alias("_h"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > F.lit(1))
        .select("_h")
        .persist()
    )
    if dup_h.count() > max_keys:
        dup_h.unpersist()
        return None
    ok_os = F.when(
        all_ok,
        F.struct(
            F.col(ord_col).cast("long").alias("o"),
            F.col(source_col).alias("s"),
        ),
    )
    firsts = (
        df.withColumn("_h", F.xxhash64(key_raw))
        .join(F.broadcast(dup_h), "_h", "left_semi")
        .select(key_raw.alias("_k"), ok_os.alias("_os"))
        .where(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(
            F.min("_os").alias("_first"),
            F.count("_os").alias("_c_ok"),
        )
        .where(F.col("_c_ok") > F.lit(1))
        .select("_k", "_first")
        .persist()
    )
    n = firsts.count()
    dup_h.unpersist()
    if n > max_keys:
        firsts.unpersist()
        return None
    return firsts


def _explode_fails(narrow: DataFrame, schema_id: str) -> DataFrame:
    # No ~_ok row filter (r6): _fails is NULL for passing rows (it is gated
    # on ¬all_ok at construction) and explode of a null array emits zero
    # rows — the filter was redundant, and written out it alias-inlined the
    # full check predicate and pushed it below the caller's rebalance
    # exchange (every check ran in the scan stage — one task on
    # single-row-group input — and AGAIN above it). The let_ identity wrap
    # matters: InferFiltersFromGenerate re-derives exactly that pushable
    # size(_fails) > 0 filter when the explode input is a bare ATTRIBUTE,
    # and only then — a non-attribute generator input is excluded by the
    # rule ("we may evaluate expensive input expressions multiple times").
    from .functions.expr import let_

    return narrow.select(
        "source", "ord",
        F.explode(let_(F.col("_fails"), lambda x: x)).alias("_f"),
    ).where(~F.col("_f.ok")).select(
        "source", "ord",
        F.lit(schema_id).alias("schema_id"),
        F.col("_f.check_id").alias("check_id"),
        F.lit(None).cast("string").alias("key_str"),
        F.lit("schema").alias("reason"),
        F.col("_f.message").alias("description"),
    )
