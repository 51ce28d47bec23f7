"""Frequency-sketch operators: distributed Misra-Gries heavy hitters.

The exact heavy-hitter query (groupBy term -> count -> filter) shuffles
|vocab| keys; at 100 TB of text the vocabulary (especially with typos /
near-tokens) is itself huge, and the shuffle carries every distinct
term. The Misra-Gries summary bounds state at O(k) PER PARTITION and
ships only <= k*partitions candidate rows to the merge — the classic
mergeable-summary trade (same story as the HLL/GK sketch aggregates in
queries/relational.py).

Deficiency guarantee (the contract the catalog query oracle-asserts):
each per-partition summary undercounts any term by at most
n_p/(k+1) — every uniform-decrement trim of delta removes >=
delta*(k+1) total mass, and only n_p mass ever enters. Summed over
partitions, a term absent from EVERY summary has true frequency
<= n/(k+1) < n/k; contrapositive: every term with true frequency
> n/k appears in the merged candidate set. (Boyer-Moore MJRTY is the
k=1 case; see also Metwally et al.'s Space-Saving — same bound.)

The kernel is pandas-vectorized (value_counts + indexed add per Arrow
batch) — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trim(acc, k: int):
    """Generalized MG decrement: subtract the (k+1)-th largest counter
    from ALL counters and drop the non-positive — equivalent to that
    many rounds of classic one-at-a-time decrements."""
    if len(acc) <= k:
        return acc
    thresh = acc.nlargest(k + 1).iloc[-1]
    acc = acc - thresh
    return acc[acc > 0]


def misra_gries_candidates(df: DataFrame, col: str, k: int = 200) -> DataFrame:
    """Per-partition Misra-Gries(k) summaries, merged by term.

    Returns (term, mg_count) — mg_count lower-bounds the true count;
    the candidate set provably contains every term whose true frequency
    exceeds n/k. Follow with an exact count of ONLY the candidates
    (a semi-join — tiny) when exact heavy-hitter counts are needed.
    """
    out_schema = f"{col} string, mg_count long"

    def kernel(batches):
        import pandas as pd

        acc = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].value_counts()
            acc = acc.add(vc, fill_value=0)
            # trim lazily at 4k so the nlargest scan amortizes
            if len(acc) > 4 * k:
                acc = _trim(acc, k)
        acc = _trim(acc, k)
        if len(acc):
            yield pd.DataFrame(
                {col: acc.index.astype(str), "mg_count": acc.values.astype("int64")}
            )

    summaries = df.select(col).mapInPandas(kernel, schema=out_schema)
    return summaries.groupBy(col).agg(F.sum("mg_count").alias("mg_count"))
