"""Expression-tree helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(col: Column, body) -> Column:
    """Let-binding for expression trees: evaluate ``col`` once per row,
    reference it as a lambda variable inside ``body``. Emulated with
    transform over a single-element array — Spark has no native let,
    and both CollapseProject (which inlines a projected column's whole
    expression into every downstream reference) and higher-order
    lambdas (which re-evaluate captured subexpressions per element)
    otherwise multiply the cost: the naive nested-minhash expression
    re-derived the shingle array 64× per row and the full signature
    64× per band reference — ~4000× redundant work per row."""
    return F.element_at(F.transform(F.array(col), body), 1)
