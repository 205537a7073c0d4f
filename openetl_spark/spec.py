"""Declarative pipeline/connector spec.

Mirrors the semantics of the reference's core types
(`/root/reference/src/types.ts:151-297`: Filter, Sort,
Transformation, Connector, Pipeline) re-expressed as Python
dataclasses, with two deliberate extensions the reference declares but
disables (SURVEY.md §2A.1):

* ``FilterGroup`` — nested AND/OR trees. The reference only ever
  AND-joins a flat filter list; Spark gives OR for free.
* first-class custom ``Transformation(type='function')`` — declared in
  the reference's union but unimplemented (`src/utils/transform.ts:174-176`).

The spec is *data*: compiling it to a DataFrame is `plans/compiler.py`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Literal, Sequence, Union

# Canonical predicate vocabulary — superset across the reference's adapter
# dialects (SURVEY.md §2A.1; HubSpot's operator map is the widest:
# `/root/reference/adapters/hubspot/src/index.ts:390-398`).
FILTER_OPERATORS = frozenset(
    {
        "=", "!=", ">", ">=", "<", "<=",
        "contains", "not_contains",
        "in", "not_in",
        "between", "not_between",
        "is_null", "is_not_null",
        "like", "rlike", "starts_with", "ends_with",
    }
)


@dataclass
class Filter:
    """One predicate: ``field OP value`` (value unused for is_null/is_not_null)."""

    field: str
    operator: str = "="
    value: Any = None

    def __post_init__(self) -> None:
        if self.operator not in FILTER_OPERATORS:
            raise ValueError(f"unknown filter operator: {self.operator!r}")


@dataclass
class FilterGroup:
    """Boolean combination of filters / nested groups (engine extension)."""

    op: Literal["AND", "OR"] = "AND"
    filters: Sequence[Union["Filter", "FilterGroup"]] = ()


FilterLike = Union[Filter, FilterGroup]


@dataclass
class Sort:
    field: str
    type: Literal["asc", "desc"] = "asc"


@dataclass
class Transformation:
    """One step of the transform chain (reference `src/utils/transform.ts`).

    ``type`` ∈ {concat, renameKey, uppercase, lowercase, trim, split,
    replace, addPrefix, addSuffix, toNumber, extract, mergeObjects,
    function}. ``options`` carries the per-type parameters; ``function``
    takes a ``Callable[[DataFrame], DataFrame]`` under options['fn'].
    """

    type: str
    options: dict[str, Any] = field(default_factory=dict)


@dataclass
class Connector:
    """Declarative source/target query spec (≈ reference Connector).

    ``adapter_id`` selects a registered source ("parquet", "csv",
    "json", "jdbc", "rest", "memory", ...); ``endpoint_id`` is the
    table/path/route; ``config`` is adapter-specific options.
    """

    adapter_id: str
    endpoint_id: str
    credential_id: str | None = None
    config: dict[str, Any] = field(default_factory=dict)
    fields: Sequence[str] = ()
    filters: Sequence[FilterLike] = ()
    sort: Sequence[Sort] = ()
    limit: int | None = None
    offset: int | None = None
    transform: Sequence[Transformation] = ()
    timeout: float | None = None  # ingest deadline (REST sources only)
    streaming: bool = False  # compile to readStream / writeStream (C20)


@dataclass
class Pipeline:
    """read → transform → write program (≈ reference Pipeline).

    Exactly one of ``source`` / ``data`` must be provided. Hooks mirror
    the reference lifecycle (`src/types.ts:283-286`): ``onload(df)``
    after extract+transform, ``onbeforesend(df)`` may replace the
    DataFrame or return False to abort the load, ``onupload()`` after
    the load completes.
    """

    id: str
    source: Connector | None = None
    data: Any = None  # list[dict] | pandas.DataFrame | DataFrame
    target: Connector | None = None
    onload: Callable[[Any], None] | None = None
    onbeforesend: Callable[[Any], Any] | None = None
    onupload: Callable[[], None] | None = None
    error_handling: dict[str, Any] = field(default_factory=dict)  # max_retries, retry_interval (s)
    rate_limiting: dict[str, Any] = field(default_factory=dict)  # requests_per_second
    logging: Callable[[dict], None] | None = None


# --------------------------------------------------------------------
# Declarative analytic query (engine extension, SURVEY.md §7 step 3)
# --------------------------------------------------------------------


@dataclass
class Aggregate:
    """One aggregate term. ``expr`` is a column name or SQL expression
    (``l_extendedprice * (1 - l_discount)``); ``None`` with
    ``fn='count'`` is COUNT(*). ``round_dp`` applies the catalog's
    rounding convention on output."""

    fn: Literal["sum", "avg", "min", "max", "count", "count_distinct"]
    expr: str | None
    alias: str
    round_dp: int | None = None


@dataclass
class Join:
    """Equi-join step. ``on`` is either shared column names
    (``["custkey"]``) or (left, right) name pairs
    (``[["l_suppkey", "s_suppkey"], ["c_nationkey", "s_nationkey"]]``);
    ``broadcast`` hints the right side (dims)."""

    table: str
    on: Sequence[Any]
    how: str = "inner"
    broadcast: bool = False


@dataclass
class QuerySpec:
    """The declarative analytic query the reference never had: joins,
    derived expressions, grouped aggregation, HAVING, ordering, limit —
    all as data (JSON-able via ``from_dict``), compiled to one lazy
    DataFrame lineage by ``plans.compiler.compile_query``. Everything
    an operator mask would disallow simply isn't expressible here;
    everything else rides Catalyst (join selection, pushdown, codegen)
    with zero engine-side planning."""

    table: "str | QuerySpec"
    joins: Sequence[Join] = ()
    filters: Sequence[FilterLike] = ()
    derived: dict[str, str] = field(default_factory=dict)
    group_by: Sequence[str] = ()
    aggregates: Sequence[Aggregate] = ()
    having: Sequence[FilterLike] = ()
    windows: Sequence["WindowFn"] = ()
    select: Sequence[str] = ()
    distinct: bool = False
    sort: Sequence[Sort] = ()
    limit: int | None = None
    alias: str | None = None  # required when used as a derived table

    @staticmethod
    def from_dict(d: dict) -> "QuerySpec":
        def _filters(items):
            out = []
            for f in items or ():
                if "op" in f:
                    out.append(FilterGroup(f["op"], _filters(f["filters"])))
                else:
                    out.append(
                        Filter(f["field"], f.get("operator", "="), f.get("value"))
                    )
            return out

        def _tbl(t):
            # spec_from_dict so a nested {"set_op": ...} works as a
            # derived table / join target, not only nested QuerySpecs
            return spec_from_dict(t) if isinstance(t, dict) else t

        return QuerySpec(
            table=_tbl(d["table"]),
            joins=[
                Join(_tbl(j["table"]), j["on"], j.get("how", "inner"),
                     j.get("broadcast", False))
                for j in d.get("joins", ())
            ],
            filters=_filters(d.get("filters")),
            derived=dict(d.get("derived", {})),
            group_by=list(d.get("group_by", ())),
            aggregates=[
                Aggregate(a["fn"], a.get("expr"), a["alias"], a.get("round_dp"))
                for a in d.get("aggregates", ())
            ],
            having=_filters(d.get("having")),
            windows=[
                WindowFn(
                    w["fn"], w["alias"],
                    list(w.get("partition_by", ())),
                    [Sort(s["field"], s.get("type", "asc"))
                     for s in w.get("order_by", ())],
                    w.get("expr"), w.get("offset", 1),
                    tuple(w["frame"]) if w.get("frame") is not None else None,
                )
                for w in d.get("windows", ())
            ],
            select=list(d.get("select", ())),
            distinct=bool(d.get("distinct", False)),
            sort=[Sort(s["field"], s.get("type", "asc")) for s in d.get("sort", ())],
            limit=d.get("limit"),
            alias=d.get("alias"),
        )


@dataclass
class SetOp:
    """Declarative set operation over QuerySpecs (or nested SetOps):
    ``op`` ∈ union_all / union / intersect / except — SQL semantics
    (union/intersect/except deduplicate; columns match positionally, so
    give every input an explicit ``select``). ``except`` folds
    left-associatively across >2 inputs."""

    op: str
    inputs: Sequence["QuerySpec | SetOp"]
    sort: Sequence[Sort] = ()
    limit: int | None = None

    @staticmethod
    def from_dict(d: dict) -> "SetOp":
        return SetOp(
            op=d["set_op"],
            inputs=[spec_from_dict(i) for i in d["inputs"]],
            sort=[Sort(s["field"], s.get("type", "asc")) for s in d.get("sort", ())],
            limit=d.get("limit"),
        )


def spec_from_dict(d: "dict | QuerySpec | SetOp") -> "QuerySpec | SetOp":
    """Dispatch a JSON-able analytic spec: {"set_op": ...} → SetOp,
    anything else → QuerySpec."""
    if isinstance(d, (QuerySpec, SetOp)):
        return d
    return SetOp.from_dict(d) if "set_op" in d else QuerySpec.from_dict(d)


@dataclass
class WindowFn:
    """Declarative window term: ``fn`` ∈ row_number/rank/dense_rank/
    lag/lead/sum/avg/min/max/count; ``expr`` is the argument (None for
    ranking fns). ``frame`` (aggregate fns only) is a ROWS frame as
    ``(start, end)`` where each bound is an int row offset (negative =
    preceding, 0 = current row, positive = following) or the string
    ``"unbounded"``; None keeps Spark's default (running frame when
    ordered, whole partition otherwise — the renderer mirrors that
    default explicitly so both engines agree)."""

    fn: str
    alias: str
    partition_by: Sequence[str] = ()
    order_by: Sequence[Sort] = ()
    expr: str | None = None
    offset: int = 1  # lag/lead only
    frame: tuple | None = None  # (start, end) ROWS bounds
