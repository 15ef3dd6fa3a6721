"""Metric-view compiler — the reference's one non-built-in idea.

The reference declares a Databricks *metric view*: a YAML spec with a
source table, a view-level filter, declarative joins, dimensions, and
measures (reference: src/notebooks/modelling/semantic_layer.sql:7-94 —
source :13, filter :14, joins :15-30, dimensions :31-75, measures
:76-93). At consumer query time Databricks compiles
``SELECT <dims>, MEASURE(<m>) ... GROUP BY <dims>`` into a
join+filter+aggregate plan. There is no OSS equivalent, so this module
*is* the replacement: the same spec shape compiled to a Spark SQL
statement (one declarative plan → Catalyst optimizes joins, pushdown,
pruning; broadcast hints are emitted for dim joins).

Contract (mirrors the Databricks semantics):
- the consumer picks any subset of declared dimensions and measures;
- the engine groups by exactly the chosen dimensions and evaluates the
  chosen measures post-join, after the view-level filter;
- 1:N joins intentionally fan out fact rows (the reference's
  per-genre COUNT(*) double-counts reviews across genres — SURVEY
  §7.3.2); this is preserved, not "fixed".
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JoinSpec:
    """One declarative join (semantic_layer.sql:15-30 shape:
    ``name`` + ``sql_on``)."""

    name: str  # table alias to join (must exist in the view's tables)
    on: str  # SQL boolean expr, e.g. "source.o_custkey = customer.c_custkey"
    how: str = "left"
    broadcast: bool = True  # dims are small; hint unless told otherwise


@dataclass
class MetricViewSpec:
    """The YAML-shaped spec (semantic_layer.sql:11-93)."""

    source: str  # name of the fact table
    filter: str | None = None  # view-level filter (semantic_layer.sql:14)
    joins: list[JoinSpec] = field(default_factory=list)
    dimensions: dict[str, str] = field(default_factory=dict)  # name -> SQL expr
    measures: dict[str, str] = field(default_factory=dict)  # name -> SQL agg expr


class MetricView:
    """Compile metric queries against a spec + a table catalog.

    ``tables`` maps names used in the spec (source + join names) to
    DataFrames; they are registered as temp views under a unique
    prefix so compiled SQL never collides with user views.

    ``name`` is the metric view's declared consumer-facing name: when
    set, :meth:`sql` only accepts consumer queries whose ``FROM``
    names it (a query naming a DIFFERENT metric view must error, not
    silently run against this one). When ``None`` the ``FROM`` name is
    not checked (single-view usage).
    """

    _seq = 0

    def __init__(
        self,
        spark: SparkSession,
        spec: MetricViewSpec,
        tables: dict[str, DataFrame],
        name: str | None = None,
    ):
        missing = {spec.source, *(j.name for j in spec.joins)} - set(tables)
        if missing:
            raise ValueError(f"metric view references unknown tables: {missing}")
        # temp views registered below live in the TABLES' session —
        # resolve compiled SQL there, not on the caller handle, so the
        # binding stays correct however the tables were loaded. Mixed
        # sessions would scatter the views across sessions the SQL
        # never queries — reject that up front.
        sessions = {id(df.sparkSession): df.sparkSession for df in tables.values()}
        if len(sessions) > 1:
            raise ValueError(
                "metric view tables must share one SparkSession; got "
                f"{len(sessions)} distinct sessions across {sorted(tables)}"
            )
        self.spark = (
            next(iter(sessions.values())) if sessions else spark
        )
        self.spec = spec
        self.name = name
        MetricView._seq += 1
        self._prefix = f"__mv{MetricView._seq}_"
        self._alias = {name: f"{self._prefix}{name}" for name in tables}
        for name, df in tables.items():
            df.createOrReplaceTempView(self._alias[name])

    def _rewrite(self, expr: str) -> str:
        """Qualify spec table names with the registered view prefix.

        Word-boundary regex, applied only OUTSIDE single-quoted SQL
        string literals — a blind ``str.replace`` would corrupt a
        literal like ``'orders.eu'`` or a qualified name whose
        identifier merely ends with a table name (``big_orders.x`` has
        no word boundary before ``orders``, so it is left alone)."""
        import re

        # split on single-quoted literals ('' is the SQL escape);
        # odd-indexed parts are the literals — never rewritten
        parts = re.split(r"('(?:[^']|'')*')", expr)
        for i in range(0, len(parts), 2):
            for name, view in self._alias.items():
                parts[i] = re.sub(
                    rf"\b{re.escape(name)}\.", f"{view}.", parts[i]
                )
        return "".join(parts)

    def compile_sql(
        self,
        dimensions: list[str],
        measures: list[str],
        where: str | None = None,
    ) -> str:
        """Emit the SELECT the consumer's (dims, measures) choice
        compiles to — the ``SELECT <dims>, MEASURE(<m>) GROUP BY``
        expansion."""
        spec = self.spec
        unknown = set(dimensions) - set(spec.dimensions)
        if unknown:
            raise ValueError(f"unknown dimensions: {unknown}")
        unknown = set(measures) - set(spec.measures)
        if unknown:
            raise ValueError(f"unknown measures: {unknown}")

        select = [
            f"{self._rewrite(spec.dimensions[d])} AS {d}" for d in dimensions
        ] + [f"{self._rewrite(spec.measures[m])} AS {m}" for m in measures]

        hints = [
            f"BROADCAST({self._alias[j.name]})" for j in self.spec.joins if j.broadcast
        ]
        hint_sql = f"/*+ {', '.join(hints)} */ " if hints else ""

        lines = [
            f"SELECT {hint_sql}{', '.join(select)}",
            f"FROM {self._alias[spec.source]} AS {self._alias[spec.source]}",
        ]
        for j in spec.joins:
            lines.append(
                f"{j.how.upper()} JOIN {self._alias[j.name]} ON {self._rewrite(j.on)}"
            )
        conds = [c for c in (spec.filter, where) if c]
        if conds:
            lines.append(
                "WHERE " + " AND ".join(f"({self._rewrite(c)})" for c in conds)
            )
        if dimensions:
            lines.append(
                "GROUP BY " + ", ".join(str(i + 1) for i in range(len(dimensions)))
            )
        return "\n".join(lines)

    def query(
        self,
        dimensions: list[str],
        measures: list[str],
        where: str | None = None,
    ) -> DataFrame:
        """The consumer entry point: pick dims + measures, get a
        DataFrame plan (lazy — Catalyst sees one declarative query)."""
        return self.spark.sql(self.compile_sql(dimensions, measures, where))

    def sql(self, consumer_sql: str) -> DataFrame:
        """Accept the reference's consumer SQL shape VERBATIM —
        ``SELECT <dim>, MEASURE(<m>) FROM <view> GROUP BY <dim>``
        (semantic_layer.sql:7-10's query contract) — and rewrite it to
        :meth:`query`. Deliberately regex-level: the grammar is the
        metric-view consumer contract (bare dimension names, MEASURE()
        calls, optional AS aliases, optional WHERE pushed below the
        aggregation, GROUP BY by name or ordinal), not general SQL —
        anything else raises rather than mis-parsing.
        """
        import re

        m = re.match(
            r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<view>[\w.${}]+)"
            r"(?:\s+WHERE\s+(?P<where>.+?))?"
            r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?\s*;?\s*$",
            consumer_sql,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                f"not a metric-view consumer query: {consumer_sql!r}"
            )
        if self.name is not None and m["view"].lower() != self.name.lower():
            raise ValueError(
                f"consumer query names metric view {m['view']!r}, but "
                f"this view is declared as {self.name!r} — route the "
                "query to the view it names"
            )
        # select items in SELECT order — GROUP BY ordinals resolve
        # against THIS list (dims and measures interleave freely;
        # resolving against the dims list alone mis-binds the moment a
        # measure precedes a dimension)
        items: list[tuple[str, str]] = []  # (kind, declared name)
        renames: list[tuple[str, str]] = []  # (declared name, alias)
        for item in m["select"].split(","):
            item = item.strip()
            mm = re.match(
                r"^MEASURE\s*\(\s*(\w+)\s*\)(?:\s+AS\s+(\w+))?$",
                item,
                re.IGNORECASE,
            )
            if mm:
                items.append(("measure", mm[1]))
                if mm[2]:
                    renames.append((mm[1], mm[2]))
                continue
            md = re.match(r"^(\w+)(?:\s+AS\s+(\w+))?$", item, re.IGNORECASE)
            if not md:
                raise ValueError(
                    f"unsupported select item (dimensions are bare names, "
                    f"measures are MEASURE(name)): {item!r}"
                )
            items.append(("dim", md[1]))
            if md[2]:
                renames.append((md[1], md[2]))
        dims = [name for kind, name in items if kind == "dim"]
        measures = [name for kind, name in items if kind == "measure"]
        if m["group"]:
            grouped = [g.strip() for g in m["group"].split(",")]
            resolved = []
            for g in grouped:
                if not g.isdigit():
                    resolved.append(g)
                    continue
                idx = int(g) - 1
                if not 0 <= idx < len(items):
                    raise ValueError(
                        f"GROUP BY ordinal {g} is out of range for the "
                        f"{len(items)}-item select list"
                    )
                kind, name = items[idx]
                if kind == "measure":
                    raise ValueError(
                        f"GROUP BY ordinal {g} refers to "
                        f"MEASURE({name}) — metric views group only by "
                        "dimensions"
                    )
                resolved.append(name)
            if sorted(resolved) != sorted(dims):
                raise ValueError(
                    f"GROUP BY {grouped} does not match the selected "
                    f"dimensions {dims} (metric views group by exactly "
                    "the chosen dimensions)"
                )
        elif dims:
            raise ValueError(
                "dimensions selected without GROUP BY — metric views "
                "group by exactly the chosen dimensions"
            )
        out = self.query(dims, measures, where=m["where"])
        for declared, alias in renames:
            out = out.withColumnRenamed(declared, alias)
        return out
