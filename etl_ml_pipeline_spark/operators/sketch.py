"""Frequency-sketch operators: Misra-Gries heavy hitters + Count-Min.

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

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------------------
# Count-Min sketch — point-frequency estimation with bounded state.
#
# Where Misra-Gries answers "which terms are heavy", Count-Min answers
# "how often does THIS term occur" for arbitrary point queries, with a
# one-sided error: estimate >= true count always, and the overestimate
# is <= e*N/width per depth row with probability 1 - e^-depth (Cormode
# & Muthukrishnan 2005). State is a fixed depth x width integer matrix
# regardless of vocabulary size — the whole point at 100 TB: the exact
# groupBy(term) shuffles |vocab| keys, the sketch shuffles at most
# depth*width cells with full map-side partial aggregation.
#
# The row hashes derive from md5 (same trick as text.token_hash60), so
# a SQL engine can rebuild the IDENTICAL matrix — the catalog oracle
# replays the sketch cell-for-cell in DuckDB rather than trusting a
# probabilistic contract.
# ---------------------------------------------------------------------------


def cms_bucket(col: Column, row: int, width: int) -> Column:
    """Bucket of ``col`` in sketch row ``row``: the 60-bit md5-derived
    hash of ``value|row``, mod width. Deterministic and reproducible in
    any engine with md5 + hex parsing."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"|{row}"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h % width).alias("bucket")


def count_min_matrix(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch as a (j, bucket, cnt) DataFrame.

    One narrow explode (x depth) then ONE shuffle bounded at
    depth*width keys — partial aggregation collapses each map task's
    output to at most the matrix size, so shuffle volume is O(matrix)
    per task, independent of input rows or vocabulary.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(F.col(col), j, width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    matrix: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]``: min over the
    depth rows of the probed cell, 0 when a cell was never touched.
    The matrix is <= depth*width rows — always broadcast."""
    pcells = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(F.col(col), j, width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, "c.j", "c.bucket")
    return (
        pcells.join(F.broadcast(matrix), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
