"""Distribution-drift operators: Population Stability Index and the
pipeline gate built on it.

PSI is the production drift monitor for feature pipelines: bucket the
reference window into equal-width bins, compare the current window's
bin mass, PSI = sum (q_i - p_i) * ln(q_i / p_i). Rule of thumb:
< 0.1 stable, 0.1-0.2 drifting, > 0.2 retrain/block.

Determinism contract (shared with the ``drift_psi_events`` oracle):
values arrive on an integer grid (e.g. cents), bin edges are integer
floor divisions off the REFERENCE min/max, counts are Laplace-smoothed
over a full bin spine, and each term floor-truncates to integer 1e-8
units before the per-key sum — so the total is an order-free integer
sum and the only float op is one ln() per bin.

Scale: two bounded aggregations (|keys x bins| each) plus broadcast
joins of 1-row-per-key stats; the input scans are the only big data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.operators.joins import null_safe_join
from etl_ml_pipeline_spark.registry import register_transform


def psi(
    ref: DataFrame,
    cur: DataFrame,
    keys: list[str],
    value_col: str,
    bins: int = 10,
) -> DataFrame:
    """Per-key PSI of ``cur`` against ``ref``.

    ``value_col`` must already be on an integer grid (cast money to
    cents first); bin edges come from the reference window's min/max.
    Returns one row per key group: (*keys, psi).
    """
    edges = ref.groupBy(*keys).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.expr(f"({value_col} - __lo) * {bins} div (__hi - __lo + 1)"),
            ),
        )
        return (
            null_safe_join(df, F.broadcast(edges), keys)
            .select(*keys, b.alias("__bin"))
            .groupBy(*keys, "__bin")
            .agg(F.count("*").alias(out))
        )

    spine = edges.select(
        *keys, F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("__bin")
    )
    # null-safe throughout (round-9 audit of ADVICE r08 #4): a NULL
    # segment key is a real segment — a drift monitor that silently
    # stops watching it is the worst failure mode a gate can have.
    # binned() outputs are |keys x bins| rows — the same bounded
    # cardinality as edges/tot — so they broadcast like the rest: the
    # whole spine assembly is BroadcastHashJoin, no sort-merge shuffle
    # of already-aggregated data.
    counts = (
        null_safe_join(
            null_safe_join(
                spine, F.broadcast(binned(ref, "nr")), [*keys, "__bin"], "left"
            ),
            F.broadcast(binned(cur, "nc")),
            [*keys, "__bin"],
            "left",
        )
        .fillna({"nr": 0, "nc": 0})
    )
    tot = counts.groupBy(*keys).agg(
        (F.sum("nr") + bins).alias("__tr"), (F.sum("nc") + bins).alias("__tc")
    )
    p = (F.col("nr") + 1) / F.col("__tr")
    q = (F.col("nc") + 1) / F.col("__tc")
    # +1e-6 nudge before floor (mirrored in the drift_psi_events
    # oracle): JVM Math.log vs libm ln can differ by 1 ulp, so a term
    # within ~1e-12 of an integer boundary could floor apart across
    # engines (ADVICE r07 #2 — same posture as the DSIR weights).
    term_i = F.floor(
        (q - p) * F.log(q / p) * 100000000 + 1e-6
    ).cast("long")
    return (
        null_safe_join(counts, F.broadcast(tot), keys)
        .select(*keys, term_i.alias("__t"))
        .groupBy(*keys)
        .agg((F.sum("__t") / 100000000.0).alias("psi"))
    )


@register_transform("psi_gate")
class PsiGate(BaseTransform):
    """Pipeline drift gate: compute per-key PSI of the incoming frame
    against a stored reference table and fail (or warn) when any key
    drifts past the threshold — the dq_expectations pattern applied to
    distributions. The collect is bounded at |key groups| rows."""

    def transform(self, df: DataFrame) -> DataFrame:
        import logging

        cfg = self.config
        ref_path = cfg["reference_path"]
        value_col = cfg.get("value_col", "value")
        keys = list(cfg.get("keys", ["event_type"]))
        bins = int(cfg.get("bins", 10))
        threshold = float(cfg.get("threshold", 0.2))
        mode = cfg.get("mode", "fail")
        if mode not in ("fail", "warn"):
            raise ValueError(f"psi_gate mode must be fail|warn, got {mode!r}")
        spark = df.sparkSession
        ref = spark.read.parquet(ref_path)
        cents = F.round(F.col(value_col) * 100, 0).cast("long").alias("__c")
        scores = psi(
            ref.select(*keys, cents), df.select(*keys, cents), keys, "__c", bins
        )
        bad = [
            (tuple(r[k] for k in keys), r["psi"])
            for r in scores.collect()
            if r["psi"] > threshold
        ]
        if bad:
            msg = (
                f"psi_gate: {len(bad)} key group(s) drifted past "
                f"{threshold}: {bad[:5]}"
            )
            if mode == "fail":
                raise ValueError(msg)
            logging.getLogger(__name__).warning(msg)
        return df
