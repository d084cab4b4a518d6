"""Foreign-key / referential-integrity checks as anti joins.

Reference (``Validator.java:128-179``): pass 2 generates each document's FK
key strings (same ``GenKeyStrings`` Cartesian machinery as PKs) and probes the
target schema's in-memory PK hash map. Exact message formats:

- key miss      → "Unmatching FK (%s) in %s to schema %s"
                  (``SchemaMissingForeignKeyException.java:23``)
- empty PK set  → "No available documents from %s schema, required by %s"
                  (``SchemaMissingForeignKeyNoDocumentsException.java:21``)
- missing schema→ "No available schema %s , required by %s"
                  (``SchemaMissingForeignKeySchemaException.java:28``)

Null/absent tuples are skipped — ``fkStrings`` empty ⇒ no check at all
(``Validator.java:145-163``).

Spark shape: the hash-map probe IS a hash join — we run
``fk_keys LEFT ANTI JOIN pk_keys ON key_str``. The broadcast decision is
size-gated: an explicit ``F.broadcast()`` hint overrides
``autoBroadcastJoinThreshold`` unconditionally, so hinting a registry of
unknown size would force-broadcast billions of keys and OOM the driver.
Callers that KNOW the registry is small (the runner counts it once while
settling J3 emptiness) pass ``broadcast_pk=True``; the default (``None``)
adds no hint and lets AQE pick broadcast at runtime from the registry's
actual shuffle-map size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


VIOLATION_COLS = ["source", "ord", "schema_id", "check_id", "key_str", "reason", "description"]


def fk_keys(
    df: DataFrame,
    members: list[str],
    source_col: str = "source",
    ord_col: str = "ord",
) -> DataFrame:
    """(source, ord, key_str) — one row per generated FK key string.

    Delegates to ``uniqueness._doc_keys``: key generation is the identical
    job on both sides of the probe, and its flat-member fast path (pure
    codegen ``to_json``, no explode) is exactly the web-scale FK shape —
    duplicating only the HOF path here made every flat probe pay the array
    machinery (code-review r3)."""
    from .uniqueness import _doc_keys

    return _doc_keys(df, "fk", members, source_col, ord_col)


def fk_check(
    df: DataFrame,
    check_id: str,
    members: list[str],
    schema_id: str,
    target_schema_id: str,
    pk: DataFrame | None,
    source_col: str = "source",
    ord_col: str = "ord",
    broadcast_pk: bool | None = None,
    pk_known_empty: bool | None = None,
) -> DataFrame:
    """Violations for one FK declaration.

    ``pk``: the target schema's recorded registry (``UniquenessResult.pk`` —
    columns must include ``key_str``), or None when the target schema is not
    registered at all (J2, ``Validator.java:168-171``).

    ``pk_known_empty``: pass the precomputed emptiness verdict (J3,
    ``Validator.java:164-167``) to avoid re-counting; None ⇒ computed here
    (triggers the upstream job — cache ``pk`` first).

    ``broadcast_pk``: True ⇒ hint broadcast (caller verified the registry is
    small); False/None ⇒ no hint, AQE decides from runtime size.
    """
    probes = fk_keys(df, members, source_col, ord_col)

    if pk is None:
        # J2: FK decl to an unregistered schema — every doc with ≥1 key fails.
        return (
            probes.select("source", "ord")
            .distinct()
            .select(
                "source",
                "ord",
                F.lit(schema_id).alias("schema_id"),
                F.lit(check_id).alias("check_id"),
                F.lit(None).cast("string").alias("key_str"),
                F.lit("fk_no_schema").alias("reason"),
                F.format_string(
                    "No available schema %s , required by %s",
                    F.lit(target_schema_id),
                    F.col("source"),
                ).alias("description"),
            )
        )

    if pk_known_empty is None:
        pk_known_empty = pk.limit(1).count() == 0

    if pk_known_empty:
        # J3: target loaded but produced no keys — per-doc constant violation.
        return (
            probes.select("source", "ord")
            .distinct()
            .select(
                "source",
                "ord",
                F.lit(schema_id).alias("schema_id"),
                F.lit(check_id).alias("check_id"),
                F.lit(None).cast("string").alias("key_str"),
                F.lit("fk_no_docs").alias("reason"),
                F.format_string(
                    "No available documents from %s schema, required by %s",
                    F.lit(target_schema_id),
                    F.col("source"),
                ).alias("description"),
            )
        )

    pk_side = pk.select("key_str").distinct()
    if broadcast_pk:
        pk_side = F.broadcast(pk_side)

    # When the PK side exceeds the broadcast gate this becomes a shuffle
    # anti-join; Spark's optimizer-injected runtime bloom filter
    # (spark.sql.optimizer.runtime.bloomFilter.enabled, on by default)
    # pre-filters the probe side map-side, so only likely-missing keys pay
    # the shuffle — the bloom-prefilter pattern without hand-rolled sketches.
    return probes.join(pk_side, "key_str", "left_anti").select(
        "source",
        "ord",
        F.lit(schema_id).alias("schema_id"),
        F.lit(check_id).alias("check_id"),
        "key_str",
        F.lit("fk_missing").alias("reason"),
        F.format_string(
            "Unmatching FK (%s) in %s to schema %s",
            F.col("key_str"),
            F.col("source"),
            F.lit(target_schema_id),
        ).alias("description"),
    )
