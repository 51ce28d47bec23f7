"""Incremental corpus dedup: stream new documents against a PERSISTENT
MinHash signature index.

The batch dedup operators (operators/dedup.py) answer "which documents
in THIS corpus are near-dups of each other". The production ingestion
question is different: "is this NEW document a near-dup of anything we
already hold" — and recomputing corpus signatures per arrival batch is
exactly the O(corpus) work an index exists to avoid. Here the corpus
exists only as its signature table (16 ints per document, ~1000x
smaller than text); each micro-batch signatures its own documents once,
meets the index in a banded equi-join (never all-pairs, never raw
text), and appends the signatures of its unique survivors so later
batches dedup against them too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.dedup import minhash_signatures, shingle_df

_N_PERM = 16
_BANDS, _ROWS = 4, 4


def build_minhash_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Batch-build the signature index parquet: (id, m0..m15)."""
    sh = shingle_df(docs, text_col, id_col)
    minhash_signatures(sh, n_perm=_N_PERM).write.mode("overwrite").parquet(index_path)


def _banded(sigs: DataFrame, id_out: str, ms_out: str) -> DataFrame:
    """Explode signatures to (id, ms array, band key) rows."""
    sig_cols = [f"m{i}" for i in range(_N_PERM)]
    arr = F.array(*[F.col(c) for c in sig_cols])
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_", *[F.col(f"m{b * _ROWS + r}") for r in range(_ROWS)]
                ).alias("band_val"),
            )
            for b in range(_BANDS)
        ]
    )
    return sigs.select(
        F.col("id").alias(id_out), arr.alias(ms_out), F.explode(entries).alias("bk")
    )


def stream_dedup_against_index(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    verdicts_view: str = "dedup_verdicts",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
):
    """For every micro-batch of documents: emit (doc_id, dup_of,
    est_jaccard) verdicts for near-dups of the indexed corpus (or of an
    earlier doc in the same batch), and append the unique survivors'
    signatures to the index.

    Scale shape per batch: signatures are one groupBy over the batch's
    shingles; the index side is read as signatures only (no text);
    candidates come from a band-key equi-join, so cost is
    O(batch x matching buckets), independent of corpus size. Verdicts
    accumulate in a global temp view (foreachBatch sessions are clones;
    see write_stream_cdc_view).

    Returns the started StreamingQuery (caller awaits/stops).
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        sh = shingle_df(batch_df, text_col, id_col)
        sigs = minhash_signatures(sh, n_perm=_N_PERM).localCheckpoint(eager=True)

        index = spark.read.parquet(index_path).withColumn("__src", F.lit(0))
        pool = index.unionByName(sigs.withColumn("__src", F.lit(1)))
        new_b = _banded(sigs, "new_id", "new_ms")
        old_b = _banded(pool.drop("__src"), "old_id", "old_ms").join(
            pool.select(F.col("id").alias("old_id"), "__src"), "old_id"
        )
        matches = F.aggregate(
            F.zip_with(
                F.col("new_ms"), F.col("old_ms"), lambda x, y: (x == y).cast("int")
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        cand = (
            new_b.join(old_b, "bk")
            # a batch doc can only be the dup of the INDEX or of an
            # EARLIER batch doc — never of itself or a later one
            .filter((F.col("__src") == 0) | (F.col("old_id") < F.col("new_id")))
            .dropDuplicates(["new_id", "old_id"])
            .withColumn("est_jaccard", matches / F.lit(_N_PERM))
            .filter(F.col("est_jaccard") >= threshold)
        )
        verdicts = (
            cand.groupBy("new_id")
            .agg(
                F.min_by("old_id", F.struct(-F.col("est_jaccard"), F.col("old_id"))).alias("dup_of"),
                F.max("est_jaccard").alias("est_jaccard"),
            )
            .select(F.col("new_id").alias(id_col), "dup_of", "est_jaccard")
        )
        prior = (
            spark.table(f"global_temp.{verdicts_view}")
            if spark.catalog.tableExists(f"global_temp.{verdicts_view}")
            else spark.createDataFrame([], verdicts.schema)
        )
        all_verdicts = prior.unionByName(verdicts).localCheckpoint(eager=True)
        all_verdicts.createOrReplaceGlobalTempView(verdicts_view)

        unique_sigs = sigs.join(
            verdicts.select(F.col(id_col).alias("id")), "id", "left_anti"
        )
        unique_sigs.write.mode("append").parquet(index_path)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
