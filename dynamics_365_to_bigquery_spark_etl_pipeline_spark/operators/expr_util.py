"""Expression-level evaluation control (r15 optimization round).

``bind_once`` exists because of how Catalyst evaluates HIGHER-ORDER
functions: ``zip_with``/``transform``/``aggregate`` run interpreted
(CodegenFallback), so whole-stage codegen's common-subexpression
elimination never sees them — and a Column function that references its
argument expression k times embeds k COPIES of that argument's tree,
each evaluated per row. ``shingles``/``word_ngrams`` pass the
``split(regexp_replace(lower(text)))`` token subtree into reshapes that
reference it ~7 times (three shifted slices + the size guards), so the
regexp+split ran ~7x per row — and predicate pushdown multiplies it
again when a filter referencing the output is pushed through the
projection with the expression substituted in (PushDownPredicate has no
cost model). Measured on the sf0.1 corpus: shingling 1.02 -> 0.54 s,
the contamination-hits pipeline 3.9 -> 1.8 s (rows identical; see
OPTIMIZATION_r15.md).

The fix evaluates the shared subtree ONCE per row by binding it as a
HOF lambda variable: ``transform(array(expr), x -> build(x))[1]``.
Lambda variables are bound VALUES — referencing ``x`` k times inside
``build`` re-reads the value, never re-evaluates the tree — and a
pushed-down filter copy of the whole construct still evaluates ``expr``
exactly once per copy.

Constraint: ``build`` must be expressible inside a lambda (no
window/aggregate functions), and ``expr`` must not itself be a lambda
variable from an enclosing HOF (PySpark lambdas nest fine, but keep the
nesting shallow — every level is interpreted).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(expr: Column, build: Callable[[Column], Column]) -> Column:
    """``build(expr)`` with ``expr`` evaluated exactly once per row,
    however many times ``build`` references its argument."""
    return F.element_at(F.transform(F.array(expr), build), 1)
