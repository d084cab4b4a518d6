"""Driver-side compilation: JSON-Schema(+extensions) dict → ValidationPlan.

Reference lifecycle pass 0 (``FairGTrackValidatorCli.java:63-218``): each
schema is meta-validated, its ``$id`` extracted, ``primary_key`` parsed
(``ValidatedJSONSchema.java:278-298`` — non-string members ⇒ WARNING and the
whole constraint ignored), and ``foreign_keys`` discovered by a recursive walk
over ``properties``/``items`` that builds dotted member paths with ``[]``
steps (``ValidatedJSONSchema.java:152-217``).

Here compilation happens ONCE on the driver; the output plan is a bag of pure
``Column`` expressions + key/FK specs. No per-document interpretation remains
— the compiled constants ride into executors inside the serialized plan
(≙ implicit broadcast).

Extension keywords (root ``README.md:9-81``): ``unique`` (true | [members]),
``primary_key``, ``foreign_keys`` ([{schema_id, members}]),
``foreignProperty`` ("schema_id#jpath"), ``format: curie`` (+ ``matchType``,
``namespace``), ``format: term`` (+ ``ontology``, ``matchType``,
``ancestors``).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..operators import checks as C


@dataclass(frozen=True)
class UniqueSpec:
    check_id: str
    members: list[str]


@dataclass(frozen=True)
class FKSpec:
    check_id: str
    target_schema_id: str
    members: list[str]
    # foreignProperty targets a named unique constraint instead of the PK
    target_check_id: str = "pk"


@dataclass
class Dims:
    """Dimension snapshots replacing the reference's lazy network caches.

    namespaces: dict ns → identifiers.org regex (≙ SQLite CURIE cache,
    ``extensions/CurieCache.java:41-67``); terms/ancestors: DataFrames
    (≙ RDF4J stores, ``extensions/TermFormat.java:204-261``).
    """

    namespaces: dict[str, str] = field(default_factory=dict)
    terms: DataFrame | None = None
    ancestors: DataFrame | None = None
    # MIRIAM ids (``MIR:00000008``) → namespace: the reference resolves CURIE
    # registry lookups by namespace OR id (``CurieCache.java:108-115,397-424``),
    # so a schema may declare its namespace by MIR id.
    namespace_ids: dict[str, str] = field(default_factory=dict)
    # collect small term dims at compile time into pure expressions (zero
    # shuffles); False forces the broadcast-join path for every term check.
    fold_term_dims: bool = True


@dataclass
class ValidationPlan:
    schema_id: str
    checks: list[C.Check] = field(default_factory=list)
    join_checks: list[C.JoinCheck] = field(default_factory=list)
    uniques: list[UniqueSpec] = field(default_factory=list)
    fks: list[FKSpec] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


def compile_schema(schema: dict, dims: Dims | None = None) -> ValidationPlan:
    dims = dims or Dims()
    schema_id = schema.get("$id") or schema.get("id")
    if not schema_id:
        raise ValueError("schema has no $id/id (SchemaNoIdException)")
    plan = ValidationPlan(schema_id=schema_id)

    # ---- root-level primary_key (ValidatedJSONSchema.java:278-298)
    pk = schema.get("primary_key")
    if pk is not None:
        _add_members_constraint(plan, "pk", pk, "primary key")

    # ---- root-level compound unique (README.md:21-23)
    uq = schema.get("unique")
    if isinstance(uq, list):
        _add_members_constraint(plan, "unique", uq, "unique")
    elif uq is not None and not isinstance(uq, bool):
        _warn(plan, f"unique in {schema_id} is not a boolean or array. Ignoring it")

    _walk(plan, schema, prefix="", dims=dims)
    return plan


def _add_members_constraint(plan: ValidationPlan, check_id: str, members, kind: str):
    if not isinstance(members, list) or not all(isinstance(m, str) for m in members):
        # reference: "primary key ... is not composed by strings defining its
        # attributes. Ignoring it" (ValidatedJSONSchema.java:285-289)
        _warn(plan, f"{kind} in {plan.schema_id} is not composed by strings "
                    "defining its attributes. Ignoring it")
        return
    plan.uniques.append(UniqueSpec(check_id=check_id, members=list(members)))


def _warn(plan: ValidationPlan, msg: str):
    plan.warnings.append(msg)
    warnings.warn(msg, stacklevel=3)


def _walk(plan: ValidationPlan, schema: dict, prefix: str, dims: Dims):
    """Recursive walk mirroring findFKs (ValidatedJSONSchema.java:160-217)
    extended to also compile per-property keyword checks."""
    # array wrapper: descend into items, extending the path with []
    if isinstance(schema.get("items"), dict):
        schema = schema["items"]
        if prefix:
            prefix = prefix + "[]"

    # this level's foreign_keys
    fks = schema.get("foreign_keys")
    if isinstance(fks, list):
        for i, fk in enumerate(fks):
            if not (isinstance(fk, dict) and "schema_id" in fk and "members" in fk):
                continue  # only valid declarations taken into account
            members = fk["members"]
            if not isinstance(members, list):
                continue
            comps = []
            for comp in members:
                comp = str(comp)
                comps.append(
                    f"{prefix}.{comp}" if comp and comp != "." and prefix else (comp if comp and comp != "." else prefix)
                )
            plan.fks.append(
                FKSpec(
                    check_id=f"fk:{prefix or '.'}:{i}",
                    target_schema_id=str(fk["schema_id"]),
                    members=comps,
                )
            )

    props = schema.get("properties")
    if not isinstance(props, dict):
        return
    dotted = (prefix + ".") if prefix else ""

    for r in schema.get("required", []) or []:
        plan.checks.append(C.required_check(f"{dotted}{r}"))

    for name, sub in props.items():
        if not isinstance(sub, dict):
            continue
        path = f"{dotted}{name}"
        _compile_property(plan, path, sub, dims)
        # recurse (objects and arrays-of-objects)
        _walk(plan, sub, prefix=path, dims=dims)


def _compile_property(plan: ValidationPlan, path: str, sub: dict, dims: Dims):
    t = sub.get("type")
    if isinstance(t, str) and t in ("string", "number", "integer", "boolean"):
        plan.checks.append(C.type_check(path, t))
    if "const" in sub:
        plan.checks.append(C.const_check(path, sub["const"]))
    if "enum" in sub:
        plan.checks.append(C.enum_check(path, sub["enum"]))
    if "pattern" in sub:
        plan.checks.append(C.pattern_check(path, sub["pattern"]))
    if "minimum" in sub:
        plan.checks.append(C.minimum_check(path, sub["minimum"]))
    if "maximum" in sub:
        plan.checks.append(C.maximum_check(path, sub["maximum"]))
    if "exclusiveMinimum" in sub:
        plan.checks.append(C.minimum_check(path, sub["exclusiveMinimum"], exclusive=True))
    if "exclusiveMaximum" in sub:
        plan.checks.append(C.maximum_check(path, sub["exclusiveMaximum"], exclusive=True))
    if "minLength" in sub:
        plan.checks.append(C.min_length_check(path, sub["minLength"]))
    if "maxLength" in sub:
        plan.checks.append(C.max_length_check(path, sub["maxLength"]))

    # additionalProperties: false on an open-object (map-encoded) property.
    # Fixed-layout objects are StructType — closed at parse (SURVEY P6); the
    # runtime check only applies when the column is kept as a map, which the
    # schema marks explicitly (encoding is a relational-mapping concern).
    if sub.get("additionalProperties") is False and sub.get("x-encoding") == "map":
        allowed = list((sub.get("properties") or {}).keys())
        plan.checks.append(C.additional_properties_check(path, allowed))

    fmt = sub.get("format")
    if fmt == "uri":
        plan.checks.append(C.format_uri_check(path))
    elif fmt == "curie":
        # registry keyed by namespace AND by MIR id — CurieCache.get matches
        # either (``CurieCache.java:108-115``), so declarations like
        # ``namespace: "MIR:00000008"`` resolve to the same pattern.
        registry = dict(dims.namespaces)
        for mid, ns in (dims.namespace_ids or {}).items():
            if ns in dims.namespaces:
                registry.setdefault(mid, dims.namespaces[ns])
        plan.checks.append(
            C.curie_check(
                path,
                match_type=sub.get("matchType", "loose"),
                namespaces=_as_list(sub.get("namespace", [])),
                registry=registry,
            )
        )
    elif fmt == "term":
        onts = _as_list(sub.get("ontology", []))
        if not onts:
            _warn(plan, f"format 'term' at {path} requires attribute 'ontology'")
        elif dims.terms is None:
            _warn(plan, f"format 'term' at {path}: no terms dimension loaded")
        else:
            kwargs = dict(
                match_type=sub.get("matchType", "exact"),
                ontologies=onts,
                terms=dims.terms,
                ancestors=dims.ancestors,
                required_ancestors=_as_list(sub.get("ancestors", [])) or None,
            )
            # fold the dim into a pure expression when it fits the driver
            # (zero extra shuffles — vendored snapshots always fold); fall
            # back to the broadcast-join form for live-sized ontologies
            folded = (
                C.fold_term_check(path, **kwargs) if dims.fold_term_dims else None
            )
            if folded is not None:
                plan.checks.append(folded)
            else:
                plan.join_checks.append(C.term_check(path, **kwargs))

    # per-property unique: true (README.md:11-13; python impl supports many)
    uq = sub.get("unique")
    if uq is True:
        plan.uniques.append(UniqueSpec(check_id=f"u_{path}", members=[path]))
    elif uq is not None and uq is not False:
        _warn(plan, f"unique at {path} in {plan.schema_id} is not a boolean. Ignoring it")

    # foreignProperty: "schema_id#jpath" (README.md:15-17)
    fp = sub.get("foreignProperty")
    if isinstance(fp, str) and "#" in fp:
        target_schema, target_path = fp.split("#", 1)
        plan.fks.append(
            FKSpec(
                check_id=f"foreignProperty:{path}",
                target_schema_id=target_schema,
                members=[path],
                target_check_id=f"u_{target_path}",
            )
        )
