"""Data-quality gate — dependency-free replacement for DQX.

The reference gates its DAG on two ``databricks-labs-dqx`` rules
(reference: src/notebooks/data_quality.py:25-35): primary-key
uniqueness on the fact (``is_unique(['recommendationid'])``) and a
numeric range check (``is_in_range('weighted_score', -5, 5)``), then
raises if any row errors (data_quality.py:40-46), blocking the
downstream semantic-layer task (workflow.json:50-79).

Same semantics here as ~100 lines of DataFrame code:
- rules annotate rows with an ``_errors`` column (null when clean);
- dataset-level uniqueness is a window count (no self-join);
- the gate uses ``limit(1)`` probing, not a full count — at 100 TB
  "is there at least one bad row" must not scan everything after the
  first hit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    criticality: str = "error"  # 'error' blocks, 'warn' reports


@dataclass(frozen=True)
class IsUnique(Rule):
    """data_quality.py:25-29: dataset-level key uniqueness."""

    columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class IsInRange(Rule):
    """data_quality.py:30-35: numeric range check (inclusive)."""

    column: str = ""
    min_value: float = 0.0
    max_value: float = 0.0


@dataclass(frozen=True)
class NotNull(Rule):
    """Null check (reference used isNull guards inline, reviews_fact.py:106)."""

    column: str = ""


class QualityError(Exception):
    """Raised by the gate; blocks downstream tasks (workflow.json:50-79)."""


def _violation(rule: Rule, df: DataFrame) -> Column:
    """Column that is an error-message string when the row violates the
    rule, else null."""
    if isinstance(rule, IsUnique):
        w = Window.partitionBy(*rule.columns)
        return F.when(
            F.count(F.lit(1)).over(w) > 1,
            F.lit(f"{rule.name}: duplicate key ({', '.join(rule.columns)})"),
        )
    if isinstance(rule, IsInRange):
        c = F.col(rule.column)
        return F.when(
            c.isNull() | (c < rule.min_value) | (c > rule.max_value),
            F.lit(
                f"{rule.name}: {rule.column} outside "
                f"[{rule.min_value}, {rule.max_value}]"
            ),
        )
    if isinstance(rule, NotNull):
        return F.when(
            F.col(rule.column).isNull(), F.lit(f"{rule.name}: {rule.column} is null")
        )
    raise TypeError(f"unknown rule type: {type(rule).__name__}")


def _msg_array(msgs: list[Column]) -> Column:
    if not msgs:
        return F.lit(None).cast("array<string>")
    arr = F.filter(F.array(*msgs), lambda m: m.isNotNull())
    return F.when(F.size(arr) > 0, arr)


def apply_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Annotate rows with ``_errors`` and ``_warnings`` (arrays of
    messages, null when clean) — the DQX ``apply_checks`` analog
    (data_quality.py:40-42). ``error``-criticality rules feed
    ``_errors`` (and block the gate); everything else feeds
    ``_warnings`` (reported by :func:`violations`, never blocking)."""
    errs = [_violation(r, df) for r in rules if r.criticality == "error"]
    warns = [_violation(r, df) for r in rules if r.criticality != "error"]
    return df.withColumn("_errors", _msg_array(errs)).withColumn(
        "_warnings", _msg_array(warns)
    )


def quality_gate(df: DataFrame, rules: list[Rule]) -> None:
    """data_quality.py:44-46: raise if any row errors.

    Uses ``limit(1)`` so Spark stops at the first offending row instead
    of materializing every violation (the reference ran a full
    ``count()``)."""
    bad = apply_rules(df, rules).filter(F.col("_errors").isNotNull()).limit(1)
    first = bad.select("_errors").collect()
    if first:
        raise QualityError(f"data quality gate failed: {first[0]['_errors']}")


def violations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """All offending rows with their messages — the reporting path
    (the reference ``display(errors)``, data_quality.py:45). Includes
    warn-level rows; only ``_errors`` rows block the gate."""
    return apply_rules(df, rules).filter(
        F.col("_errors").isNotNull() | F.col("_warnings").isNotNull()
    )
