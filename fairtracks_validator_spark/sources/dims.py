"""Dimension snapshots — deterministic, vendored, no network at validation time.

Replaces the reference's lazily-populated caches:

- MIRIAM/identifiers.org registry → SQLite ``namespaces(id, namespace, name,
  pattern)`` with a 7-day TTL (``extensions/CurieCache.java:41-72,156-270``).
  Here: a small in-repo snapshot, loaded driver-side (it is tiny) and folded
  into compiled CURIE check expressions — the degenerate-but-optimal form of
  a broadcast join.
- Per-ontology RDF4J NativeStores queried with SPARQL
  (``extensions/TermFormat.java:204-267``). Here: ``terms(ontology, iri,
  label)`` and ``ancestors(ontology, iri, ancestor_iri)`` DataFrames — the
  ``rdfs:subClassOf*`` closure is precomputed offline so validation is a
  broadcast semi-join, never a reasoner call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Snapshot of the identifiers.org rows the reference corpus exercises
# (CurieCache.java mirrors the full registry; only these namespaces appear in
# the fairtracks_simple schema). Patterns are the published MIRIAM ones.
NAMESPACES_SNAPSHOT: dict[str, str] = {
    "orcid": r"^\d{4}-\d{4}-\d{4}-\d{3}[\dX]$",
    "pubmed": r"^\d+$",
    "doi": r"^10\.\d{4,9}/[-._;()/:A-Za-z0-9]+$",
    "geo": r"^G(PL|SM|SE|DS)\d+$",
}


def namespaces_dim(spark: SparkSession, snapshot: dict[str, str] | None = None) -> DataFrame:
    """As a DataFrame, for callers that want the join form instead of the
    folded-constant form."""
    snap = snapshot if snapshot is not None else NAMESPACES_SNAPSHOT
    rows = [(f"MIR:{i:08d}", ns, ns.upper(), pat) for i, (ns, pat) in enumerate(snap.items())]
    return spark.createDataFrame(rows, "id string, namespace string, name string, pattern string")


def namespace_mir_ids(snapshot: dict[str, str] | None = None) -> dict[str, str]:
    """MIR id → namespace for the snapshot (same ids ``namespaces_dim``
    stamps). The reference's CURIE cache resolves lookups by namespace OR id
    (``CurieCache.java:108-115``); feed this to ``Dims.namespace_ids`` so
    schemas may declare ``namespace: "MIR:00000000"``."""
    snap = snapshot if snapshot is not None else NAMESPACES_SNAPSHOT
    return {f"MIR:{i:08d}": ns for i, ns in enumerate(snap)}


# Toy 5-node NCIT-flavoured hierarchy (FIXTURES.md F7): enough to exercise
# matchType exact/label/suffix and the ancestors closure.
_TERM_ROWS = [
    # (ontology, iri, label)
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C48660", "Grade 2"),
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C48659", "Grade 1"),
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C18000", "Grading"),
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C7057", "Disease"),
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C3262", "Neoplasm"),
]

# reflexive transitive closure over: C48660→C18000, C48659→C18000,
# C3262→C7057 (rdfs:subClassOf*, TermFormat.java:264-267)
_ANCESTOR_ROWS = [
    ("ncit", iri, iri) for (_, iri, _) in _TERM_ROWS
] + [
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C48660",
     "http://purl.obolibrary.org/obo/NCIT_C18000"),
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C48659",
     "http://purl.obolibrary.org/obo/NCIT_C18000"),
    ("ncit", "http://purl.obolibrary.org/obo/NCIT_C3262",
     "http://purl.obolibrary.org/obo/NCIT_C7057"),
]


def terms_dim(spark: SparkSession, rows: list[tuple] | None = None) -> DataFrame:
    # None-safe defaulting: an explicitly EMPTY list models an empty
    # ontology and must stay empty, not fall back to the fixture
    # (code-review r4)
    return spark.createDataFrame(
        rows if rows is not None else _TERM_ROWS,
        "ontology string, iri string, label string",
    )


def ancestors_dim(spark: SparkSession, rows: list[tuple] | None = None) -> DataFrame:
    return spark.createDataFrame(
        rows if rows is not None else _ANCESTOR_ROWS,
        "ontology string, iri string, ancestor_iri string",
    )
