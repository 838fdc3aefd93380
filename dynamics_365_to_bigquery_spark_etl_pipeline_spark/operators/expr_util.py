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

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bind_once(expr: Column, build: Callable[[Column], Column]) -> Column:
    """``build(expr)`` with ``expr`` evaluated exactly once per row,
    however many times ``build`` references its argument."""
    return F.element_at(F.transform(F.array(expr), build), 1)


def explode_nonempty(
    df: DataFrame,
    cols: Sequence[Union[str, Column]],
    arr: Union[str, Column],
    alias: str,
    pos_alias: Optional[str] = None,
    keep: Optional[Column] = None,
) -> DataFrame:
    """``df.select(*cols, explode(arr).alias(alias))`` — but WITHOUT
    Catalyst's inferred ``size(arr) > 0`` filter (r16, folding the 14
    r15 ``explode_outer`` sites into one owner so the invariant cannot
    decay site by site — VERDICT r15 #8 / "what's wrong" #4).

    Why not plain ``explode``: ``InferFiltersFromGenerate`` adds a
    ``size(arr) > 0 AND isnotnull(arr)`` filter, and ``PushDownPredicate``
    (no cost model) substitutes the WHOLE array expression into that
    condition and pushes it through projections — for interpreted-HOF
    token/gram chains that re-evaluates the chain per raw row, in the
    worst case below a distinct/routing step (measured 2.6x on
    q_decontaminate_ngram in r15). ``explode_outer`` generates no
    inferred filter; the single null row an empty (or NULL) array emits
    is killed HERE, at the generate, so rows are exactly those of plain
    ``explode``.

    ``keep`` is the row gate applied at the generate — default
    ``isNotNull(alias)``, the pure null kill (precondition for that
    default: array ELEMENTS are non-null, true for every tokenizer /
    gram / hash producer in this repo). Sites whose semantic gate
    already subsumes the null kill pass it instead (e.g.
    ``F.length(alias) > 0`` — ``length(NULL)`` is NULL, so the outer
    row still dies) and keep their committed plan shape exactly.

    ``pos_alias`` switches to ``posexplode_outer`` with
    ``(pos_alias, alias)`` output columns."""
    gen = (
        F.posexplode_outer(arr).alias(pos_alias, alias)
        if pos_alias
        else F.explode_outer(arr).alias(alias)
    )
    gate = keep if keep is not None else F.col(alias).isNotNull()
    return df.select(*cols, gen).filter(gate)
