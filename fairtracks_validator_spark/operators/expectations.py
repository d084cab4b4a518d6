"""Table-level expectations — N declarative rules, ONE aggregation pass.

The public pattern (dbt tests, Great Expectations, Deequ — all open
source / published) declares per-table data-quality rules: row counts in
range, null rates under a ceiling, means/extrema/quantiles in bounds,
categorical domains respected. Run naively, each rule is its own
aggregation job — 20 rules = 20 scans of a 100 TB table.

Here every rule compiles to aggregate *expressions* over one shared
``df.agg(...)`` — a single scan, map-side partial aggregation, one
1-row exchange — and the verdict table (one row per rule) is exploded
from that single row driver-side-free. Adding a rule adds columns to the
aggregate, never a pass over the data.

Rule metrics are exact and deterministic, so the whole suite has a DuckDB
oracle (``__spark_entry__.q_expectations_documents``); the one sketch-based
rule (``distinct_count(approx=True)``) follows the repo's numeric-bound
oracle convention instead — at 10^12 rows exact COUNT(DISTINCT) means an
Expand shuffle, so approx is the scale default and exact the opt-in.

Related single-rule forms live in :mod:`.stats` (``null_rate_check``,
``cardinality_check``) and emit the runner's violation-row schema;
:func:`violations` bridges this suite's report into that same schema.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``metric(column)`` must land in ``[lo, hi]``.

    ``kind`` names the metric; ``params`` carries metric-specific knobs
    (quantile level, accepted-value list, regex). ``lo``/``hi`` of ``None``
    mean unbounded on that side."""

    rule_id: str
    kind: str
    column: Optional[str] = None
    lo: Optional[float] = None
    hi: Optional[float] = None
    params: dict[str, Any] = field(default_factory=dict)


# ------------------------------------------------------------- rule builders
def row_count(lo: Optional[float] = None, hi: Optional[float] = None) -> Rule:
    return Rule("row_count", "row_count", None, lo, hi)


def null_rate(column: str, max_rate: float) -> Rule:
    return Rule(f"null_rate:{column}", "null_rate", column, None, max_rate)


def min_value(column: str, lo: Optional[float] = None,
              hi: Optional[float] = None) -> Rule:
    return Rule(f"min:{column}", "min", column, lo, hi)


def max_value(column: str, lo: Optional[float] = None,
              hi: Optional[float] = None) -> Rule:
    return Rule(f"max:{column}", "max", column, lo, hi)


def mean_value(column: str, lo: Optional[float] = None,
               hi: Optional[float] = None) -> Rule:
    return Rule(f"mean:{column}", "mean", column, lo, hi)


def quantile_value(column: str, q: float, lo: Optional[float] = None,
                   hi: Optional[float] = None) -> Rule:
    return Rule(f"q{q}:{column}", "quantile", column, lo, hi, {"q": q})


def accepted_values(column: str, values: list, min_rate: float = 1.0) -> Rule:
    """Share of NON-NULL rows whose value is in ``values`` ≥ ``min_rate``."""
    return Rule(f"accepted:{column}", "accepted_values", column,
                min_rate, None, {"values": list(values)})


def match_rate(column: str, pattern: str, min_rate: float = 1.0) -> Rule:
    """Share of NON-NULL rows fully matching ``pattern`` ≥ ``min_rate``
    (anchored rlike — keep the pattern in the Java∩RE2 dialect for oracle
    parity, same rule as the schema format checks)."""
    return Rule(f"match:{column}", "match_rate", column,
                min_rate, None, {"pattern": pattern})


def distinct_count(column: str, lo: Optional[float] = None,
                   hi: Optional[float] = None, approx: bool = True) -> Rule:
    return Rule(f"distinct:{column}", "distinct", column, lo, hi,
                {"approx": approx})


_JSON_PARAM_KEYS = {
    "quantile": ("q",),
    "accepted_values": ("values",),
    "match_rate": ("pattern",),
    "distinct": ("approx",),
}

_DEFAULT_ID = {
    "row_count": lambda d: "row_count",
    "null_rate": lambda d: f"null_rate:{d['column']}",
    "min": lambda d: f"min:{d['column']}",
    "max": lambda d: f"max:{d['column']}",
    "mean": lambda d: f"mean:{d['column']}",
    "quantile": lambda d: f"q{d['q']}:{d['column']}",
    "accepted_values": lambda d: f"accepted:{d['column']}",
    "match_rate": lambda d: f"match:{d['column']}",
    "distinct": lambda d: f"distinct:{d['column']}",
}


def rules_from_json(spec: list[dict]) -> list[Rule]:
    """Build rules from a JSON-friendly spec (the CLI ``expect`` format).

    Each object: ``{"kind": ..., "column": ..., "lo": ..., "hi": ...}``
    plus kind-specific keys (``q``, ``values``, ``pattern``, ``approx``)
    and an optional ``rule_id`` override. Unknown keys are an error —
    a typo'd bound must not silently become an unbounded rule."""
    rules = []
    for i, obj in enumerate(spec):
        d = dict(obj)
        try:
            kind = d.pop("kind")
        except KeyError:
            raise ValueError(f"rule #{i}: missing 'kind'") from None
        if kind not in _DEFAULT_ID:
            raise ValueError(f"rule #{i}: unknown kind {kind!r}")
        column = d.pop("column", None)
        if column is None and kind != "row_count":
            raise ValueError(f"rule #{i} ({kind}): missing 'column'")
        lo, hi = d.pop("lo", None), d.pop("hi", None)
        params = {}
        for k in _JSON_PARAM_KEYS.get(kind, ()):
            if k in d:
                params[k] = d.pop(k)
            elif kind != "distinct":  # approx has a default
                raise ValueError(f"rule #{i} ({kind}): missing {k!r}")
        if kind == "distinct":
            params.setdefault("approx", True)
        rule_id = d.pop("rule_id", None) or _DEFAULT_ID[kind](
            {"column": column, **params}
        )
        if d:
            raise ValueError(f"rule #{i} ({kind}): unknown keys {sorted(d)}")
        rules.append(Rule(rule_id, kind, column, lo, hi, params))
    return rules


# --------------------------------------------------------------- compilation
def _metric_expr(r: Rule) -> Column:
    c = F.col(r.column) if r.column else None
    if r.kind == "row_count":
        return F.count(F.lit(1)).cast("double")
    if r.kind == "null_rate":
        return F.avg(c.isNull().cast("double"))
    if r.kind == "min":
        return F.min(c).cast("double")
    if r.kind == "max":
        return F.max(c).cast("double")
    if r.kind == "mean":
        return F.avg(c.cast("double"))
    if r.kind == "quantile":
        # exact interpolated percentile (matches DuckDB quantile_cont);
        # at extreme scale swap for percentile_approx and the bound oracle
        return F.percentile(c.cast("double"), F.lit(float(r.params["q"])))
    if r.kind == "accepted_values":
        ok = c.isin(r.params["values"]).cast("double")
        return F.avg(F.when(c.isNotNull(), ok))
    if r.kind == "match_rate":
        ok = c.rlike(f"^(?:{r.params['pattern']})$").cast("double")
        return F.avg(F.when(c.isNotNull(), ok))
    if r.kind == "distinct":
        if r.params.get("approx", True):
            return F.approx_count_distinct(c).cast("double")
        return F.count_distinct(c).cast("double")
    raise ValueError(f"unknown expectation kind: {r.kind}")


def _passed(metric: Column, r: Rule) -> Column:
    cond = metric.isNotNull()
    if r.lo is not None:
        cond = cond & (metric >= F.lit(float(r.lo)))
    if r.hi is not None:
        cond = cond & (metric <= F.lit(float(r.hi)))
    return cond


def run_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in ONE aggregation over ``df``.

    Returns one row per rule:
    ``(rule_id, column, metric double, lo, hi, passed boolean)`` —
    ``metric`` rounded to 6dp (the repo's float-oracle convention). Rule
    ids must be unique (they key the report)."""
    if not rules:
        raise ValueError("run_expectations needs at least one rule")
    ids = [r.rule_id for r in rules]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate rule_ids: {sorted(ids)}")
    agg = df.agg(
        *[F.round(_metric_expr(r), 6).alias(f"_m{i}") for i, r in enumerate(rules)]
    )
    items = F.array(
        *[
            F.struct(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit(r.column).cast("string").alias("column"),
                F.col(f"_m{i}").alias("metric"),
                F.lit(r.lo).cast("double").alias("lo"),
                F.lit(r.hi).cast("double").alias("hi"),
                _passed(F.col(f"_m{i}"), r).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return agg.select(F.explode(items).alias("r")).select("r.*")


def suggest_rules(
    df: DataFrame,
    columns: Optional[list[str]] = None,
    row_slack: float = 0.5,
    null_slack: float = 0.02,
    range_slack: float = 0.25,
    max_categories: int = 32,
) -> list[Rule]:
    """Profile ``df`` and propose a rule set (Deequ's constraint-suggestion
    shape — public AWS-labs project). TWO passes total, independent of
    column count:

    1. one aggregation computing per-column null rate / min / max /
       approx-distinct plus the row count;
    2. one aggregation collecting the (sorted, truncated) value set of
       every low-cardinality string column — candidates only, skipped
       entirely when none qualify.

    The suggested bounds encode the observed table plus slack: row count
    within ``±row_slack``, null rate at most observed ``+ null_slack``,
    numeric min/max widened by ``range_slack`` of the observed span,
    categorical columns pinned to their observed value set (when it fits
    ``max_categories``) at the observed in-set rate. Suggestions are a
    starting point — review before gating a pipeline on them."""
    from pyspark.sql import types as T

    if columns is None:
        columns = df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in columns if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    numeric = tuple(
        getattr(T, n)
        for n in ("ByteType", "ShortType", "IntegerType", "LongType",
                  "FloatType", "DoubleType", "DecimalType")
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.avg(F.col(c).isNull().cast("double")).alias(f"nr__{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"nd__{c}"))
        if isinstance(fields[c], numeric):
            aggs.append(F.min(c).cast("double").alias(f"mn__{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx__{c}"))
    prof = df.agg(*aggs).first()

    n = prof["__n"]
    rules = [
        row_count(lo=max(0.0, round(n * (1 - row_slack))),
                  hi=round(n * (1 + row_slack)))
    ]
    cat_candidates = [
        c for c in columns
        if isinstance(fields[c], T.StringType)
        and 0 < prof[f"nd__{c}"] <= max_categories
    ]
    cat_values: dict[str, list] = {}
    if cat_candidates:
        sets = df.agg(
            *[
                # truncated at max_categories+1: an approx-count under-
                # estimate must surface as "doesn't fit" not a silent clip
                F.slice(
                    F.sort_array(F.collect_set(c)), 1, max_categories + 1
                ).alias(f"vs__{c}")
                for c in cat_candidates
            ]
        ).first()
        for c in cat_candidates:
            vals = sets[f"vs__{c}"]
            if 0 < len(vals) <= max_categories:
                cat_values[c] = vals
    for c in columns:
        rate = prof[f"nr__{c}"]
        if rate is not None:
            rules.append(null_rate(c, min(1.0, round(rate + null_slack, 6))))
        if isinstance(fields[c], numeric):
            mn, mx = prof[f"mn__{c}"], prof[f"mx__{c}"]
            if mn is not None and mx is not None:
                pad = range_slack * (mx - mn)
                rules.append(min_value(c, lo=round(mn - pad, 6)))
                rules.append(max_value(c, hi=round(mx + pad, 6)))
        if c in cat_values:
            rules.append(accepted_values(c, cat_values[c], min_rate=1.0))
    return rules


def rules_to_json(rules: list[Rule]) -> list[dict]:
    """Inverse of :func:`rules_from_json` — serialize for the CLI format."""
    out = []
    for r in rules:
        d: dict = {"kind": r.kind, "rule_id": r.rule_id}
        if r.column is not None:
            d["column"] = r.column
        if r.lo is not None:
            d["lo"] = r.lo
        if r.hi is not None:
            d["hi"] = r.hi
        d.update(r.params)
        out.append(d)
    return out


def violations(report: DataFrame, schema_id: str = "expectations") -> DataFrame:
    """Failing rules in the runner's violation-row schema (see
    ``stats.null_rate_check`` for the column contract)."""
    return report.where(~F.col("passed")).select(
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("ord"),
        F.lit(schema_id).alias("schema_id"),
        F.col("rule_id").alias("check_id"),
        F.lit(None).cast("string").alias("key_str"),
        F.lit("expectation").alias("reason"),
        F.format_string(
            "expectation %s failed: metric %s not in [%s, %s]",
            F.col("rule_id"),
            F.col("metric").cast("string"),
            F.coalesce(F.col("lo").cast("string"), F.lit("-inf")),
            F.coalesce(F.col("hi").cast("string"), F.lit("+inf")),
        ).alias("description"),
    )
