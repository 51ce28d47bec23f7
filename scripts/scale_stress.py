"""Scale-stress experiment: run the hot operators on synthetic corpora
10-40x the sf0.1 test data (generated from spark.range — no disk), and
measure whether wall time scales linearly, which is the property the
100 TB posture actually depends on. Results recorded in ROADMAP.md.

Also measures the salted vs unsalted aggregate on a 90%-one-key skew —
the case AQE alone does not fix for aggregations.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n_rows: int, dup_every: int = 7):
    """Synthetic documents: ~12 pseudo-random words from a 1k-word
    vocabulary, deterministic per id; every ``dup_every``-th row is an
    exact duplicate of the previous row."""
    base = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (F.xxhash64(F.col("id") * 12 + j) % 1000).cast("string"),
                )
                for j in range(12)
            ],
        ).alias("text"),
    )
    # duplicate injection: dup rows copy the text of doc_id-1
    return base.withColumn(
        "text",
        F.when(
            (F.col("doc_id") % dup_every == 0) & (F.col("doc_id") > 0),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        (F.xxhash64((F.col("doc_id") - 1) * 12 + j) % 1000).cast(
                            "string"
                        ),
                    )
                    for j in range(12)
                ],
            ),
        ).otherwise(F.col("text")),
    )


def timed(label, df):
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:7.1f}s  ({n:,} rows out)", flush=True)
    return dt


def main():
    from etl_ml_pipeline_spark.operators.dedup import (
        exact_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_df,
    )
    from etl_ml_pipeline_spark.operators.skew import salted_agg

    spark = get_spark(master="local[32]", shuffle_partitions=64)

    for n in (500_000, 2_000_000, 8_000_000):
        docs = synth_docs(spark, n)
        timed(f"exact_dedup n={n:,}", exact_dedup(docs, "text", "doc_id"))

    for n in (250_000, 1_000_000):
        docs = synth_docs(spark, n)
        sigs = minhash_signatures(shingle_df(docs, "text", "doc_id"))
        timed(f"minhash+lsh n={n:,}", lsh_candidate_pairs(sigs))

    # skew: 90% of rows share one key
    for n in (5_000_000,):
        skewed = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        t0 = time.perf_counter()
        plain = skewed.groupBy("k").agg(F.sum("v").alias("s"))
        plain.count()
        t_plain = time.perf_counter() - t0
        skewed_id = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.col("id").alias("rid"),
        )
        t0 = time.perf_counter()
        salted = salted_agg(skewed_id, ["k"], {"v": "sum"}, unique_col="rid", n_salt=32)
        salted.count()
        t_salt = time.perf_counter() - t0
        print(f"skew n={n:,}: plain={t_plain:.1f}s salted={t_salt:.1f}s", flush=True)




def ann_stress():
    """IVF-PQ at 1M synthetic 64-d vectors: index assignment + encoding
    + probed ADC search; the ANN-at-scale data point."""
    from etl_ml_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        pq_codebooks_from_rows,
    )

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    n = 1_000_000
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (F.xxhash64(F.col("id") * 64 + j) % 1000).cast("double") / 500.0
        - 1.0,
    )
    emb = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    centroids = emb.filter(F.col("vec_id") % 5000 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    cbs = pq_codebooks_from_rows(emb, "embedding", "vec_id", m=8, k=16, id_step=31)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    timed(f"ivfpq_topk n={n:,} (200 lists, probe 1)",
          ivfpq_topk(queries, corpus, centroids, cbs, k=5))


def new_ops_stress():
    """Round-5 operators at synthetic scale: FastSS ed1 join over
    random hex strings (variant-join machinery, near-zero true pairs),
    Misra-Gries over a 100k vocabulary with planted skew, and
    triangle counting on a 2M-node path-power graph (4M edges,
    2M-2 triangles)."""
    from etl_ml_pipeline_spark.operators.dedup import ed1_candidate_pairs
    from etl_ml_pipeline_spark.operators.graph import triangle_counts
    from etl_ml_pipeline_spark.operators.sketch import misra_gries_candidates

    spark = get_spark(master="local[32]", shuffle_partitions=64)

    for n in (250_000, 1_000_000):
        strs = spark.range(n).select(
            F.substring(F.md5(F.col("id").cast("string")), 1, 8).alias("s")
        )
        timed(f"ed1_pairs n={n:,}", ed1_candidate_pairs(strs, "s"))

    for n in (2_000_000, 10_000_000):
        terms = spark.range(n).select(
            F.when(F.col("id") % 10 < 3, F.lit("hot"))
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 100_000).cast("string")))
            .alias("term")
        )
        timed(f"misra_gries k=200 n={n:,}", misra_gries_candidates(terms, "term", 200))

    n = 2_000_000
    base = spark.range(n - 1).select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    skip = spark.range(n - 2).select(F.col("id").alias("a"), (F.col("id") + 2).alias("b"))
    timed(f"triangles nodes={n:,} edges={2*n-3:,}", triangle_counts(base.unionAll(skip)))


def streaming_stress(n_events: int = 200_000, n_users: int = 5_000):
    """Stateful-streaming throughput: n_events JSONL events through the
    applyInPandasWithState gap sessionizer in availableNow micro-batches
    — measures the custom-stateful path end to end (state store R/W,
    Arrow transfer, timeout bookkeeping), not just the operators'
    semantics. Events span ~55 hours with a 30-min gap, so most users
    close multiple sessions mid-stream."""
    import json
    import tempfile
    import time as _t
    from pathlib import Path

    from etl_ml_pipeline_spark.streaming import read_json_stream
    from etl_ml_pipeline_spark.streaming.joins import stateful_sessionizer

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    tmp = Path(tempfile.mkdtemp())
    d = tmp / "in"
    d.mkdir()
    # 4 files -> 4 micro-batches; deterministic event times
    per_file = n_events // 4
    for b in range(4):
        with open(d / f"b{b}.json", "w") as f:
            for i in range(per_file):
                gid = b * per_file + i
                ts = 1704067200 + gid  # 1 event/sec overall
                f.write(json.dumps({
                    "user_id": gid % n_users,
                    "ts": _ts_str(ts),
                    "value": float(gid % 97),
                }) + "\n")
    stream = read_json_stream(
        spark, str(d), "user_id bigint, ts timestamp, value double",
        max_files_per_trigger=1,
    )
    out = stateful_sessionizer(stream, gap_minutes=30, watermark="1 hour")
    t0 = _t.perf_counter()
    q = (out.writeStream.format("memory").queryName("stress_sess")
         .outputMode("append").option("checkpointLocation", str(tmp / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    dt = _t.perf_counter() - t0
    n_sessions = spark.table("stress_sess").count()
    print(f"sessionizer stream n={n_events:,} users={n_users:,}: "
          f"{dt:.1f}s ({n_events/dt:,.0f} events/s), "
          f"{n_sessions:,} closed sessions", flush=True)


def _ts_str(epoch: int) -> str:
    import datetime as _dt

    return _dt.datetime.fromtimestamp(epoch, _dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def sketch_stress():
    """Mergeable-sketch operators at synthetic scale: Count-Min build +
    probe over a 100k vocabulary, and the HLL rolling-distinct rollup
    over a year of synthetic (day, user) activity. Both are the
    bounded-state replacements for vocabulary/user-cardinality
    shuffles, so the interesting number is how flat the per-row cost
    stays as rows grow."""
    from etl_ml_pipeline_spark.operators.sketch import (
        count_min_estimate,
        count_min_matrix,
    )

    spark = get_spark(master="local[32]", shuffle_partitions=64)

    for n in (2_000_000, 10_000_000):
        terms = spark.range(n).select(
            F.when(F.col("id") % 10 < 3, F.lit("hot"))
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 100_000).cast("string")))
            .alias("term")
        )
        matrix = count_min_matrix(terms, "term", depth=4, width=4096)
        timed(f"cms_build d=4 w=4096 n={n:,}", matrix)
        probes = spark.range(1000).select(
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("term")
        )
        timed(
            f"cms_probe 1000 terms n={n:,}",
            count_min_estimate(matrix, probes, "term", depth=4, width=4096),
        )

    # 365 days x 1M users, ~20M activity rows: per-day HLL sketches,
    # trailing-7-day union. The exact rolling distinct re-shuffles the
    # raw pairs per window; the sketch path touches them once.
    n = 20_000_000
    act = spark.range(n).select(
        (F.col("id") % 365).alias("day"),
        ((F.col("id") * 2654435761) % 1_000_000).alias("user_id"),
    )
    daily = act.groupBy("day").agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    spine = daily.select(F.col("day").alias("anchor"))
    rolled = (
        spine.join(
            daily,
            (F.col("day") <= F.col("anchor")) & (F.col("day") >= F.col("anchor") - 6),
        )
        .groupBy("anchor")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    timed(f"hll_rolling_7d days=365 rows={n:,}", rolled)


def kmeans_stress():
    """Lloyd k-means at 1M synthetic 64-d vectors, k=64, 2 iterations —
    the clustering-at-scale data point. Assignment is map-only codegen
    over 64 broadcast-literal centroids; each update shuffles to k*d =
    4096 rows."""
    import time as _t

    from etl_ml_pipeline_spark.operators.kmeans import (
        assign_clusters,
        lloyd_iterations,
        quantize_micro,
    )

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    n, k = 1_000_000, 64
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (F.xxhash64(F.col("id") * 64 + j) % 1000).cast("float") / 500.0
        - 1.0,
    )
    emb = quantize_micro(
        spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    ).select("vec_id", "e").persist()
    emb.count()  # materialize the cache outside the timed region
    t0 = _t.perf_counter()
    cents = lloyd_iterations(emb, k=k, iters=2)
    dt_train = _t.perf_counter() - t0
    # force FULL evaluation: a count() would let Catalyst prune the
    # assignment projection entirely (the scale-ladder gotcha)
    t0 = _t.perf_counter()
    assign_clusters(emb, cents).select(F.sum(F.col("dist") / 1e6)).collect()
    print(f"{f'kmeans assign n={n:,} k={k}':45s} "
          f"{_t.perf_counter() - t0:7.1f}s", flush=True)
    print(f"{'kmeans 2 Lloyd iterations':45s} {dt_train:7.1f}s", flush=True)


def holt_stress():
    """Holt smoothing over 100k series x 200 points (20M rows): the
    per-series Python recursion after the repartition — measures the
    mapInPandas path when the caller did NOT pre-reduce."""
    from etl_ml_pipeline_spark.operators.indicators import add_holt_linear

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    n_series, n_pts = 100_000, 200
    df = spark.range(n_series * n_pts).select(
        (F.col("id") % n_series).alias("sid"),
        (F.col("id") / n_series).cast("long").alias("ord"),
        ((F.xxhash64("id") % 1000) / 100.0).alias("y"),
    )
    timed(f"holt n={n_series:,}x{n_pts}", add_holt_linear(df, "sid", "ord", "y"))


if __name__ == "__main__":
    if "--ann" in sys.argv:
        ann_stress()
    elif "--kmeans" in sys.argv:
        kmeans_stress()
    elif "--holt" in sys.argv:
        holt_stress()
    elif "--new-ops" in sys.argv:
        new_ops_stress()
    elif "--streaming" in sys.argv:
        streaming_stress()
    elif "--sketch" in sys.argv:
        sketch_stress()
    else:
        main()
