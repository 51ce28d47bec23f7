"""Null-safe equi-join helper.

Spark's USING-style equi-join (``df.join(other, ["k"])``) drops rows
whose key is NULL on either side — SQL semantics, but wrong for the
"aggregate per group, join the result back" pattern, where groupBy
treats NULL as a perfectly good group and the join back then silently
loses that whole slice (ADVICE r08 #4, found in the token-budget
mixture and generalized by the round-9 audit to PSI drift keys and
per-language perplexity cuts). ``null_safe_join`` is the drop-in form:
``<=>`` (eqNullSafe) per key, right-side key columns deduplicated, so
NULL groups round-trip like any other.

The physical plan is identical to the equi-join's (eqNullSafe keys
still hash-partition / broadcast-hash; Catalyst plans `<=>` as a join
key, not a post-filter), so there is no scale penalty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join on ``keys`` with NULL == NULL (eqNullSafe), emitting each
    key column once (taken from the left side, like a USING join).
    ``right`` must not share non-key column names with ``left``.

    Raises on NullType keys: a literally untyped all-NULL column (e.g.
    inferred from an all-None pandas column) makes `<=>` return no
    matches at all — found by the hypothesis property test — and no
    real group column is NullType, so failing loudly beats an empty
    result.

    ``how`` is restricted to the modes where emitting the key from the
    LEFT side is correct (inner/left/semi/anti). right/full would give
    right-only rows NULL keys once the ``__nsj_*`` columns are dropped
    — silent corruption — so they raise instead (ADVICE r09 #3); flip
    the operands for a right join."""
    from pyspark.sql.types import NullType

    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"null_safe_join: how={how!r} unsupported — key columns are "
            "emitted from the left side, so right/full outer joins would "
            "silently NULL the keys of right-only rows. Use "
            "inner/left/semi/anti (swap operands for a right join)."
        )

    for side, name in ((left, "left"), (right, "right")):
        for k in keys:
            if isinstance(side.schema[k].dataType, NullType):
                raise TypeError(
                    f"null_safe_join: {name} key column {k!r} is NullType "
                    "(untyped all-NULL) — cast it to the real key type first"
                )
    aliased = right
    for k in keys:
        aliased = aliased.withColumnRenamed(k, f"__nsj_{k}")
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__nsj_{k}"))
        cond = c if cond is None else cond & c
    return left.join(aliased, cond, how).drop(*[f"__nsj_{k}" for k in keys])
