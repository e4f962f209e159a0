"""Filter/sort query DSL (SURVEY.md §2.3) compiled to Catalyst Columns.

Mirrors the reference compiler exactly, but emits ``pyspark.sql.Column``
expressions instead of SQL strings:

* **CNF groups** — filters are an AND of OR-groups
  (QueryBuilder.php:13-16,108-116): groups OR-joined inside, AND-joined
  outside.
* **Operator whitelist** — ``=, !=, >, <, >=, <=, IN, NOT IN, LIKE,
  NOT LIKE`` (Filter.php:14-47); anything else raises.
* **LIKE is substring-contains** — the reference wraps values ``'%v%'``
  (Filter.php:110-112), so we compile to ``col.contains(v)``.  Edge
  divergence, adjudicated: a ``%`` or ``_`` INSIDE the value is an active
  wildcard in the reference's raw SQL but a literal character here — the
  reference's wrapping shows substring intent, and literal matching is
  the safe reading of user-supplied values.
* **Empty IN / NOT IN is a tautology** — both compile to ``1=1``
  (Filter.php:89-93); preserved verbatim (including the surprising empty
  NOT IN pass-through, quirk §4.4.10).
* **EAV meta predicates** — ``pm.meta_key = f AND pm.meta_value <op> v``
  over ONE left-joined meta relation (Filter.php:96-100).  Faithful
  consequence: two meta predicates in different AND-groups can only be
  satisfied by a single meta row, exactly like the reference's single
  ``pm`` alias.
* **Typed literals** — string / int / float / datetime; numeric and
  datetime comparisons against meta values cast the stringly-typed
  ``meta_value`` (MySQL's implicit coercion, Filter.php:122 made explicit).
* **Sorts** — ASC/DESC whitelist (Sort.php:13-22); meta sorts pivot EAV
  rows via string-MAX (quirk §7.4.5) then cast ``number -> DECIMAL(38,10)``,
  ``date -> DATE`` (Sort.php:41-49).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COMPARISON_OPS = ("=", "!=", ">", "<", ">=", "<=", "IN", "NOT IN", "LIKE", "NOT LIKE")
META_CASTS = ("number", "date", "text")
SORT_DIRS = ("ASC", "DESC")

# Reference: Sort.php:41-49 casts meta sort keys; DECIMAL(38,10) mirrors
# MySQL's CAST(... AS DECIMAL) at the SURVEY §2.3/Q8 prescribed width —
# a narrow scale (e.g. 3 digits) would collapse values differing past it
# into tie-break-decided order.
_DECIMAL = "decimal(38,10)"


def _lit(value: Any) -> Column:
    if isinstance(value, _dt.datetime):
        return F.lit(value).cast("timestamp")
    return F.lit(value)


def _apply_op(col: Column, operator: str, value: Any) -> Column:
    if operator == "=":
        return col == _lit(value)
    if operator == "!=":
        return col != _lit(value)
    if operator == ">":
        return col > _lit(value)
    if operator == "<":
        return col < _lit(value)
    if operator == ">=":
        return col >= _lit(value)
    if operator == "<=":
        return col <= _lit(value)
    if operator in ("IN", "NOT IN"):
        # the reference takes arrays (Filter.php / SURVEY Q4); a bare
        # string would silently char-split via list(), and a scalar would
        # die with an opaque iteration error — reject both loudly
        if not isinstance(value, (list, tuple, set)):
            raise ValueError(
                f"{operator} takes a list of values, got {type(value).__name__}"
            )
        if operator == "IN":
            return F.lit(True) if not value else col.isin(list(value))
        # Empty NOT IN is also a tautology in the reference (Filter.php:89-93).
        return F.lit(True) if not value else ~col.isin(list(value))
    if operator == "LIKE":
        return col.contains(str(value))
    if operator == "NOT LIKE":
        return ~col.contains(str(value))
    raise ValueError(f"invalid operator: {operator!r}")


@dataclass
class Filter:
    """One predicate (Filter.php): a document column or an EAV meta key."""

    field: str
    operator: str
    value: Any
    is_meta: bool = False

    def __post_init__(self) -> None:
        if self.operator not in COMPARISON_OPS:
            raise ValueError(
                f"invalid operator {self.operator!r}; allowed: {COMPARISON_OPS}"
            )

    def to_column(self, meta_key_col: str = "meta_key", meta_value_col: str = "meta_value") -> Column:
        if not self.is_meta:
            return _apply_op(F.col(self.field), self.operator, self.value)
        val_col = F.col(meta_value_col)
        value = self.value
        # meta_value is stored as text (SURVEY.md §1.3); typed comparisons
        # cast explicitly where MySQL would coerce implicitly.
        if isinstance(value, bool):
            # Spark's boolean->string cast writes lowercase "true"/"false"
            # (doc_meta is built via cast), so compare against that form —
            # Python str(True) == "True" would silently never match
            value = "true" if value else "false"
        elif isinstance(value, (int, float)) and self.operator not in ("LIKE", "NOT LIKE"):
            # DELIBERATE deviation from MySQL's implicit coercion: MySQL
            # turns non-numeric text into 0 ('en' < 5 matches everything);
            # cast-to-double turns it into NULL, which EXCLUDES the row —
            # the saner and documented behavior (quirk register).
            val_col = val_col.cast("double")
            value = float(value)
        elif isinstance(value, _dt.datetime):
            val_col = val_col.cast("timestamp")
        elif isinstance(value, (list, tuple)) and value and isinstance(value[0], bool):
            # bool is an int subclass — without this arm a [True] list
            # would take the numeric branch and compare "true" casts as
            # NULL doubles (the scalar-bool fix, applied to lists)
            value = ["true" if v else "false" for v in value]
        elif isinstance(value, (list, tuple)) and value and isinstance(value[0], (int, float)):
            val_col = val_col.cast("double")
            value = [float(v) for v in value]
        pred = _apply_op(val_col, self.operator, value)
        return (F.col(meta_key_col) == self.field) & pred


@dataclass
class Sort:
    """One sort key (Sort.php): document column, or cast EAV meta key."""

    field: str
    direction: str = "ASC"
    is_meta: bool = False
    meta_cast: str = "text"

    def __post_init__(self) -> None:
        if self.direction.upper() not in SORT_DIRS:
            raise ValueError(f"invalid direction {self.direction!r}")
        if self.meta_cast not in META_CASTS:
            raise ValueError(f"invalid meta cast {self.meta_cast!r}")
        self.direction = self.direction.upper()

    @property
    def ascending(self) -> bool:
        return self.direction == "ASC"

    def pivot_column(self) -> Column:
        """The EAV pivot aggregate for this key: string MAX over matching
        meta rows (VectorTable.php:203 — MAX of text, cast afterwards)."""
        return F.max(
            F.when(F.col("meta_key") == self.field, F.col("meta_value"))
        ).alias(self._pivot_name())

    def _pivot_name(self) -> str:
        return f"_meta_{self.field}"

    def order_column(self) -> Column:
        if not self.is_meta:
            c = F.col(self.field)
        else:
            c = F.col(self._pivot_name())
            if self.meta_cast == "number":
                c = c.cast(_DECIMAL)
            elif self.meta_cast == "date":
                c = c.cast("date")
        return c.asc() if self.ascending else c.desc()


class QueryBuilder:
    """CNF filter groups + ordered sort keys (QueryBuilder.php).

    ``add_filter_group(key)`` opens a named OR-group; ``add_filter(group,
    filter)`` appends to it.  ``candidates(documents, doc_meta)`` compiles
    the S2 candidate query: one left join documents x meta, the CNF
    predicate, DISTINCT post ids.
    """

    def __init__(self) -> None:
        self._groups: dict[str, list[Filter]] = {}
        self._sorts: list[Sort] = []

    # -- construction (mirrors QueryBuilder.php:27-57) ----------------------
    def add_filter_group(self, key: str) -> "QueryBuilder":
        self._groups.setdefault(key, [])
        return self

    def add_filter(self, group: str, flt: Filter) -> "QueryBuilder":
        self.add_filter_group(group)
        self._groups[group].append(flt)
        return self

    def add_sort(self, sort: Sort) -> "QueryBuilder":
        self._sorts.append(sort)
        return self

    def has_filters(self) -> bool:
        return any(self._groups.values())

    def has_sorts(self) -> bool:
        return bool(self._sorts)

    @property
    def sorts(self) -> list[Sort]:
        return list(self._sorts)

    # -- compilation --------------------------------------------------------
    def predicate(self) -> Column | None:
        """CNF Column over the (documents LEFT JOIN doc_meta) relation."""
        groups = [g for g in self._groups.values() if g]
        if not groups:
            return None
        conj = None
        for group in groups:
            disj = None
            for flt in group:
                c = flt.to_column()
                disj = c if disj is None else (disj | c)
            conj = disj if conj is None else (conj & disj)
        return conj

    def candidates(
        self,
        documents: DataFrame,
        doc_meta: DataFrame | None = None,
        id_col: str = "post_id",
    ) -> DataFrame:
        """S2: ``SELECT DISTINCT p.ID FROM posts LEFT JOIN postmeta ...
        WHERE <cnf>`` (VectorTable.php:104-114) as a DataFrame plan.

        The meta side joins on the document id; Catalyst pushes the
        non-meta conjuncts down to the documents scan.
        """
        if doc_meta is None and any(
            f.is_meta for fs in self._groups.values() for f in fs
        ):
            raise ValueError("meta filters require the doc_meta DataFrame")
        joined = documents
        if doc_meta is not None:
            joined = documents.join(doc_meta, on=id_col, how="left")
        pred = self.predicate()
        if pred is not None:
            joined = joined.where(pred)
        return joined.select(id_col).distinct()

    def apply_sorts(
        self,
        df: DataFrame,
        documents: DataFrame | None = None,
        doc_meta: DataFrame | None = None,
        id_col: str = "post_id",
        tie_break: str | None = "id",
    ) -> DataFrame:
        """S7: EAV pivot + metadata sort (VectorTable.php:194-218).

        Meta sort keys pivot ``doc_meta`` via conditional string-MAX
        aggregation (one shuffle on post_id); column sort keys join the
        documents dimension.  A deterministic tie-break replaces the
        reference's heap nondeterminism.
        """
        if not self._sorts:
            return df
        meta_sorts = [s for s in self._sorts if s.is_meta]
        col_sorts = [s for s in self._sorts if not s.is_meta]
        out = df
        if col_sorts:
            if documents is None:
                raise ValueError("column sorts require the documents DataFrame")
            need = [s.field for s in col_sorts]
            out = out.join(
                documents.select(id_col, *need), on=id_col, how="left"
            )
        if meta_sorts:
            if doc_meta is None:
                raise ValueError("meta sorts require the doc_meta DataFrame")
            # prune BEFORE the pivot aggregation: only the sort keys'
            # meta rows, only the ids present in df — without this the
            # groupBy shuffles the WHOLE EAV table (every key of every
            # document) to order a handful of stage-3 survivors
            pivot = (
                doc_meta.where(
                    F.col("meta_key").isin([s.field for s in meta_sorts])
                )
                .join(df.select(id_col), id_col, "left_semi")
                .groupBy(id_col)
                .agg(*[s.pivot_column() for s in meta_sorts])
            )
            out = out.join(pivot, on=id_col, how="left")
        order = [s.order_column() for s in self._sorts]
        if tie_break:
            order.append(F.col(tie_break).asc())
        return out.orderBy(*order).drop(
            *[s._pivot_name() for s in meta_sorts],
            *[s.field for s in col_sorts],
        )
