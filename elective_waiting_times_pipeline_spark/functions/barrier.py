"""Single-evaluation barrier for expensive derived columns.

Catalyst re-evaluates expensive expressions in two ways that a plain
two-step `.select(...)` binding cannot stop:

- a Filter over a bound attribute is pushed through the binding
  Project (`PushPredicateThroughNonJoin` substitutes the alias's
  DEFINING EXPRESSION into the pushed predicate), so the expression
  runs once in the pushed filter and again in the projection;
- a single-reference binding is collapsed outright (`CollapseProject`
  only spares multi-referenced non-cheap aliases, SPARK-36718), and
  an unused nondeterministic "barrier column" is simply pruned.

`bind_once` routes the derived values through
`explode(array(struct(...)))`: a Generate that emits exactly one row
per input row, whose output attribute filters CANNOT be pushed below
(generator outputs do not exist under the Generate) and whose input
expression is evaluated exactly once per row. The struct fields are
then exposed as top-level columns; predicates and projections over
them are cheap field extractions of the materialized struct. The
construction is stateless and streaming-compatible (verified: the
same chain runs under availableNow), and costs one array+struct
allocation per row — noise next to the tokenize/regexp pipelines it
protects (plan-verified: a filter+project over one bound tokenize
went from 2 evaluations of the tokenize chain to 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bind_once(df: DataFrame, keep: list[str] | None = None, /, **exprs: Column) -> DataFrame:
    """Return `df` with each `exprs` value available as a same-named
    top-level column, each evaluated exactly ONCE per row regardless
    of how many filters/projections downstream reference it.

    `keep` lists the pass-through columns (default: all of df's
    columns). Caveat: the barrier guarantees one evaluation per
    CONSUMING SUBTREE — a plan that scans `df` twice still evaluates
    twice per scan (checkpoint for that)."""
    cols = list(df.columns) if keep is None else list(keep)
    packed = df.select(
        *cols,
        F.explode(F.array(F.struct(*[c.alias(n) for n, c in exprs.items()]))).alias("_bound"),
    )
    return packed.select(*cols, *[F.col(f"_bound.{n}").alias(n) for n in exprs])
