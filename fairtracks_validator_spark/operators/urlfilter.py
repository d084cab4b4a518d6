"""URL blocklist filtering — the C4/RefinedWeb pre-filter stage.

Both public recipes drop documents whose URL matches a curated blocklist
(C4: "bad words" URL list; RefinedWeb §3.1: UT1 blocklist, ~4.6M entries)
BEFORE any content processing — it is the cheapest filter in the pipeline,
so it runs first. Matching is at two granularities:

- registered domain (eTLD+1): blocks every subdomain of a listed domain,
- exact host: blocks one subdomain without touching its siblings.

Scale shape: the blocklist is a DIMENSION (≤ a few million short strings —
megabytes), so both lookups are broadcast hash joins against the corpus;
the corpus never shuffles. Small lists (≤ ``URL_BLOCK_FOLD_MAX``) fold into
literal arrays instead — zero joins, pure codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url import registered_domain, url_host

# above this many entries a folded literal array stops being the scale path
# (the literal ships inside every task binary); larger lists broadcast-join.
URL_BLOCK_FOLD_MAX = 1024


def url_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocklist: list[str] | DataFrame,
) -> DataFrame:
    """Input columns + ``blocked_by`` ('host' | 'domain' | NULL) + ``keep``.

    A row is blocked iff its URL's exact host OR its registered domain
    (eTLD+1, so subdomains inherit the block) appears in ``blocklist``
    (entries lowercased; host match wins the label when both hit).

    ``blocklist`` as a DataFrame must carry a ``domain`` string column —
    the 10^6-entry shape, applied via two size-gated broadcast semi-lookups
    (left joins on the derived host/domain keys; the corpus side stays
    map-only). As a list it folds into literal arrays
    (``URL_BLOCK_FOLD_MAX``-capped), zero joins.
    """
    host = url_host(F.col(url_col))
    dom = registered_domain(host)

    if isinstance(blocklist, DataFrame):
        if "domain" not in blocklist.columns:
            raise ValueError("blocklist DataFrame needs a 'domain' column")
        b = blocklist.select(F.lower(F.col("domain")).alias("_bk")).distinct()
        out = (
            df.withColumn("_host", host)
            .withColumn("_dom", dom)
            .join(
                F.broadcast(b.select(F.col("_bk").alias("_host"),
                                     F.lit(True).alias("_hhit"))),
                "_host", "left",
            )
            .join(
                F.broadcast(b.select(F.col("_bk").alias("_dom"),
                                     F.lit(True).alias("_dhit"))),
                "_dom", "left",
            )
        )
        blocked_by = (
            F.when(F.col("_hhit"), F.lit("host"))
            .when(F.col("_dhit"), F.lit("domain"))
        )
        return (
            out.withColumn("blocked_by", blocked_by)
            .withColumn("keep", F.col("blocked_by").isNull())
            .drop("_host", "_dom", "_hhit", "_dhit")
        )

    if len(blocklist) > URL_BLOCK_FOLD_MAX:
        raise ValueError(
            f"{len(blocklist)} entries > fold cap {URL_BLOCK_FOLD_MAX}; "
            "pass the blocklist as a DataFrame(domain) instead"
        )
    lits = F.lit(sorted({e.lower() for e in blocklist})).cast("array<string>")
    blocked_by = (
        F.when(F.array_contains(lits, host), F.lit("host"))
        .when(F.array_contains(lits, dom), F.lit("domain"))
    )
    return df.withColumn("blocked_by", blocked_by).withColumn(
        "keep", F.col("blocked_by").isNull()
    )
