"""Text-analysis queries over the documents table (oracle-matched).

All expressions are JVM built-ins from ``operators.text``; oracles
replicate the exact arithmetic (divisions on identical integer inputs
are bit-identical doubles; truncation uses floor — see verify skill
notes on cross-engine round() ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators import text as X
from etl_ml_pipeline_spark.queries.tables import maybe_broadcast, t

_STOP_SQL_LIST = ", ".join(f"'{s}'" for s in X.EN_STOPWORDS)

# Shared dialect fragments for token stats
_TOKS_DUCK = "regexp_split_to_array(trim(text), '\\s+')"


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats. Scale: map-side token math + one tiny
    shuffle on lang."""
    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    per_doc = docs.select(
        "lang",
        X.token_count(c).alias("n_tok"),
        X.unique_token_count(c).alias("n_uniq"),
        F.length(F.concat_ws("", X.tokens(c))).alias("n_chars_tok"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.floor(F.sum("n_tok") / F.count("*") * 100) / 100).alias("avg_tokens"),
            (F.floor(F.sum("n_chars_tok") / F.sum("n_tok") * 10000) / 10000).alias(
                "avg_token_len"
            ),
            (F.floor(F.sum("n_uniq") / F.sum("n_tok") * 10000) / 10000).alias(
                "uniq_ratio"
            ),
        )
        .orderBy("lang")
    )


_TOKEN_STATS_SQL = f"""
WITH per_doc AS (
  SELECT lang,
         len({_TOKS_DUCK}) AS n_tok,
         len(list_distinct({_TOKS_DUCK})) AS n_uniq,
         length(array_to_string({_TOKS_DUCK}, '')) AS n_chars_tok
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       floor(sum(n_tok) / count(*) * 100) / 100 AS avg_tokens,
       floor(sum(n_chars_tok) / sum(n_tok) * 10000) / 10000 AS avg_token_len,
       floor(sum(n_uniq) / sum(n_tok) * 10000) / 10000 AS uniq_ratio
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


def text_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + heuristic score (C4/Gopher-style
    deterministic rules). Scale: pure map-side projection."""
    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    return (
        docs.select(
            "doc_id",
            X.token_count(c).alias("n_tokens"),
            (F.floor(X.type_token_ratio(c) * 10000) / 10000).alias("ttr"),
            (F.floor(X.en_score(c) * 10000) / 10000).alias("stopword_ratio"),
            (F.floor(X.quality_score(c) * 10000) / 10000).alias("quality"),
        )
        .orderBy("doc_id")
    )


_QUALITY_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         len({_TOKS_DUCK}) AS n_tok,
         len(list_distinct({_TOKS_DUCK})) AS n_uniq,
         len(list_filter({_TOKS_DUCK}, tk -> tk IN ({_STOP_SQL_LIST}))) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, n_tok,
         CAST(n_uniq AS DOUBLE) / n_tok AS ttr,
         CAST(n_stop AS DOUBLE) / n_tok AS swr
  FROM feats
)
SELECT doc_id,
       n_tok AS n_tokens,
       floor(ttr * 10000) / 10000 AS ttr,
       floor(swr * 10000) / 10000 AS stopword_ratio,
       floor((CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END
              + least(ttr, 0.5) * 0.6
              + CASE WHEN swr BETWEEN 0.01 AND 0.5 THEN 0.2 ELSE 0.0 END) * 10000
       ) / 10000 AS quality
FROM scored
ORDER BY doc_id
"""


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID vs the labeled lang column (confusion counts).
    The synthetic corpus is English-ish word soup for every label, so the
    heuristic marks most docs 'en' — the query pins the operator, not the
    corpus. Scale: map-side + tiny shuffle."""
    docs = t(spark, sf_dir, "documents")
    pred = F.when(X.en_score(F.col("text")) >= 0.05, "en").otherwise("other")
    return (
        docs.withColumn("predicted", pred)
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted")
    )


_LANGID_SQL = f"""
SELECT lang,
       CASE WHEN CAST(len(list_filter({_TOKS_DUCK}, tk -> tk IN ({_STOP_SQL_LIST}))) AS DOUBLE)
                 / len({_TOKS_DUCK}) >= 0.05
            THEN 'en' ELSE 'other' END AS predicted,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY lang, predicted
"""


def text_fingerprint_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint nibble histogram — pins normalization + hashing
    parity across engines (16 uniform buckets if the hash behaves)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.substring(X.fingerprint(F.col("text")), 1, 1).alias("nibble"))
        .groupBy("nibble")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("nibble")
    )


_FINGERPRINT_SQL = """
SELECT substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 1) AS nibble,
       count(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY nibble
"""


# ---------------------------------------------------------------------------
# text_winnow_sketch — rolling-hash (winnowing) fingerprints: polynomial
# k-gram hashes, per-window minima, distinct sketch per doc. Integer
# arithmetic end-to-end -> DuckDB list comprehensions replay it exactly.
# ---------------------------------------------------------------------------


def text_winnow_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import winnow_fingerprints

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sketch = winnow_fingerprints(F.col("text"), k=8, w=4)
    return (
        docs.select("doc_id", sketch.alias("fp"))
        .select(
            "doc_id",
            F.size("fp").alias("n_fp"),
            F.coalesce(F.element_at("fp", 1), F.lit(-1)).alias("min_fp"),
            F.coalesce(F.element_at("fp", -1), F.lit(-1)).alias("max_fp"),
        )
        .orderBy("doc_id")
    )


_WINNOW_SQL = """
WITH codes AS (
  SELECT doc_id, [ascii(text[i]) FOR i IN range(1, len(text) + 1)] AS cs
  FROM documents WHERE doc_id < 300
),
grams AS (
  SELECT doc_id,
         [list_reduce(
            list_prepend(0::BIGINT, list_slice(cs, i, i + 7)),
            (acc, c) -> (acc * 257 + c) % 2147483647
          ) FOR i IN range(1, len(cs) - 7 + 1)] AS hs
  FROM codes
),
sketches AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [list_min(list_slice(hs, i, i + 3)) FOR i IN range(1, len(hs) - 3 + 1)]
         )) AS fp
  FROM grams
)
SELECT doc_id,
       CAST(len(fp) AS INT) AS n_fp,
       coalesce(fp[1], -1) AS min_fp,
       coalesce(fp[-1], -1) AS max_fp
FROM sketches
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text_vocab_topk — corpus-level vocabulary: top-40 tokens by frequency.
# The token explode multiplies rows ~60x, but partial aggregation
# (map-side combine) collapses each partition's counts BEFORE the
# shuffle, so the exchange carries |vocab|-sized partials, not |tokens|
# rows. Deterministic top-k: count desc, token asc tiebreak.
# ---------------------------------------------------------------------------


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(X.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(40)
    )


_VOCAB_SQL = f"""
SELECT token, count(*) AS freq
FROM (SELECT unnest({_TOKS_DUCK}) AS token FROM documents) a
GROUP BY token
ORDER BY freq DESC, token
LIMIT 40
"""


# ---------------------------------------------------------------------------
# text_bm25_top_terms — TF-IDF + BM25 term scoring, top-3 terms per doc.
# The full retrieval-scoring pipeline: per-(doc,term) TF, document
# frequency DF, global N and avgdl, smooth IDF, BM25 saturation.
# Scale shape: ONE explode->groupBy(doc,term) shuffle builds TF; DF is a
# |vocab|-sized aggregate of that result (re-aggregation, no second scan
# of the corpus) broadcast back; N/avgdl are 1-row scalars cross-joined.
# Cross-engine parity: avgdl = exact-int sum/count division (not avg());
# scores floor-truncated at 1e-4; ranking sorts the TRUNCATED score with
# a term tiebreak so an ULP wobble in ln() can't flip row_number.
# ---------------------------------------------------------------------------

_BM25_K1, _BM25_B = 1.2, 0.75


def text_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tf = (
        docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # df must REFERENCE tf's count column or Catalyst prunes it from
    # this branch's copy of the subtree (functions=[] vs count(1)),
    # the exchanges stop being identical, and the corpus is tokenized
    # twice instead of once via ReusedExchange. count(when(tf>0,1)) is
    # exactly count(*) here (tf >= 1 by construction) but opaque to
    # the pruner, so the whole tf pipeline is computed once (round-9
    # plan audit: explode x2 -> x1, results bit-identical).
    df_ = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, 1)).alias("df")
    )
    scalars = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    n, dfc, tfc = F.col("n_docs"), F.col("df"), F.col("tf")
    idf_smooth = F.log((n + 1) / (dfc + 1)) + 1
    idf_bm25 = F.log(1 + (n - dfc + 0.5) / (dfc + 0.5))
    denom = tfc + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    # df_ (vocab-sized) and dl (corpus-sized) SCALE with the documents
    # table — size-guard their broadcast hints like the TPC-H dims; the
    # 1-row scalars frame is bounded by construction.
    scored = (
        tf.join(maybe_broadcast(df_, sf_dir, "documents"), "term")
        .join(maybe_broadcast(dl, sf_dir, "documents"), "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            "term",
            "tf",
            (F.floor(tfc * idf_smooth * 10000) / 10000).alias("tfidf"),
            (F.floor(idf_bm25 * tfc * (_BM25_K1 + 1) / denom * 10000) / 10000).alias(
                "bm25"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .drop("rnk")
        .orderBy("doc_id", F.desc("bm25"), "term")
    )


_BM25_SQL = f"""
WITH tf AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term
  FROM documents WHERE doc_id < 200
),
tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
dl  AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tfc GROUP BY 1),
dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
scalars AS (SELECT count(*) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
            FROM dl),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         floor(t.tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1)
               * 10000) / 10000 AS tfidf,
         floor(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * t.tf * ({_BM25_K1} + 1)
               / (t.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / avgdl))
               * 10000) / 10000 AS bm25
  FROM tfc t
  JOIN dfc USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN scalars
)
SELECT doc_id, term, tf, tfidf, bm25
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY bm25 DESC, term) AS rnk
      FROM scored) a
WHERE rnk <= 3
ORDER BY doc_id, bm25 DESC, term
"""


# ---------------------------------------------------------------------------
# text_bpe_token_stats — whitespace vs BPE-pre-split token budgets per
# language, with the fertility ratio (subword tokens per whitespace
# word) every multilingual training mix is costed by. Pure map-side
# regex + one tiny shuffle on lang.
# ---------------------------------------------------------------------------


def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    per_doc = docs.select(
        "lang",
        X.token_count(c).alias("n_ws"),
        X.bpe_token_count(c).alias("n_bpe"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("n_ws").alias("ws_tokens"),
            F.sum("n_bpe").alias("bpe_tokens"),
            (F.floor(F.sum("n_bpe") / F.sum("n_ws") * 10000) / 10000).alias(
                "fertility"
            ),
        )
        .orderBy("lang")
    )


_BPE_STATS_SQL = f"""
SELECT lang,
       CAST(sum(len({_TOKS_DUCK})) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text,
            '{X.BPE_SPLIT_PATTERN}'))) AS BIGINT) AS bpe_tokens,
       floor(sum(len(regexp_extract_all(text, '{X.BPE_SPLIT_PATTERN}')))
             / sum(len({_TOKS_DUCK})) * 10000) / 10000 AS fertility
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# text_repetition_stats — Gopher-style repetition filter signal: the
# most frequent word 2-gram per document and the fraction of 2-gram
# slots it covers; documents above the published-style threshold are
# flagged. Per-doc rows bounded to doc_id < 300 (same convention as the
# dedup oracles).
# ---------------------------------------------------------------------------


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import top_ngram_stats

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    stats = top_ngram_stats(docs, "text", "doc_id", n=2)
    return stats.select(
        F.col("id").alias("doc_id"),
        "top_gram",
        "top_count",
        (F.floor(F.col("top_frac") * 10000) / 10000).alias("top_frac"),
        (F.col("top_frac") > 0.18).cast("int").alias("repetitive"),
    ).orderBy("doc_id")


_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS tk FROM documents WHERE doc_id < 300
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i+1])) AS gram
  FROM toks
),
counts AS (
  SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2
),
slots AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
top AS (
  SELECT doc_id, gram, cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
  FROM counts
)
SELECT t.doc_id,
       t.gram AS top_gram,
       t.cnt AS top_count,
       floor(CAST(t.cnt AS DOUBLE) / s.n_grams * 10000) / 10000 AS top_frac,
       CAST(CAST(t.cnt AS DOUBLE) / s.n_grams > 0.18 AS INT) AS repetitive
FROM top t JOIN slots s USING (doc_id)
WHERE t.rn = 1
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# text_pii_scrub — PII detection + redaction over a corpus with
# deterministically injected PII (the driver corpus has none, so docs
# with doc_id % 10 == 0 get an email and % 15 == 0 an IPv4 appended —
# both sides replicate the injection). Detection counts and the md5 of
# the scrubbed text are compared, proving the redaction byte-exact.
# ---------------------------------------------------------------------------


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import pii_counts, scrub_pii

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 15 == 0,
                F.concat(
                    F.lit(" from 192.168.1."), (F.col("doc_id") % 255).cast("string")
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    c = F.col("text")
    return (
        injected.select(
            "doc_id",
            pii_counts(c)["n_emails"].alias("n_emails"),
            pii_counts(c)["n_ipv4"].alias("n_ipv4"),
            F.md5(scrub_pii(c)).alias("scrubbed_md5"),
        )
        .filter((F.col("n_emails") > 0) | (F.col("n_ipv4") > 0))
        .orderBy("doc_id")
    )


_PII_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 10 = 0
                 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 15 = 0
                 THEN ' from 192.168.1.' || (doc_id % 255) ELSE '' END AS text
  FROM documents WHERE doc_id < 500
),
scored AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{X.PII_EMAIL_PATTERN}')) AS n_emails,
         len(regexp_extract_all(text, '{X.PII_IPV4_PATTERN}')) AS n_ipv4,
         md5(regexp_replace(regexp_replace(text, '{X.PII_EMAIL_PATTERN}',
             '<EMAIL>', 'g'), '{X.PII_IPV4_PATTERN}', '<IP>', 'g')) AS scrubbed_md5
  FROM injected
)
SELECT doc_id, CAST(n_emails AS INT) AS n_emails, CAST(n_ipv4 AS INT) AS n_ipv4,
       scrubbed_md5
FROM scored
WHERE n_emails > 0 OR n_ipv4 > 0
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text_contamination — benchmark-decontamination pass: corpus docs
# sharing word 5-grams with a held-out "benchmark" subset
# (doc_id % 97 == 0), matched via 60-bit gram hashes in one equi-join.
# ---------------------------------------------------------------------------


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import contamination_pairs

    docs = t(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    # a true eval-set benchmark (~1% of docs): broadcast its gram side
    pairs = contamination_pairs(
        corpus, benchmark, n=5, min_shared=1, broadcast_bench=True
    )
    return pairs.orderBy("corpus_id", "bench_id")


_CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS tk FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(tk) - 3),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                 || ' ' || tk[i+4]))) AS gram
  FROM toks
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM grams
),
bench AS (SELECT doc_id AS bench_id, gh FROM hashed WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id AS corpus_id, gh FROM hashed WHERE doc_id % 97 != 0)
SELECT c.corpus_id, b.bench_id, count(*) AS n_shared
FROM corpus c JOIN bench b USING (gh)
GROUP BY 1, 2
HAVING count(*) >= 1
ORDER BY corpus_id, bench_id
"""


# ---------------------------------------------------------------------------
# text_model_quality_score — fastText-style hashed linear classifier
# inference (the architecture of model-based quality filters), with a
# deterministic pseudo-weight table so DuckDB replays inference exactly.
# Weights are INTEGER-valued doubles (bucket % 97 - 48): every partial
# sum is exact in either engine regardless of aggregation order, so the
# only float op is the final sigmoid on identical inputs.
# ---------------------------------------------------------------------------

_QM_BUCKETS = 512


def text_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import hashed_linear_score

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    weights = spark.range(_QM_BUCKETS).select(
        F.col("id").alias("bucket"),
        (F.col("id") % 97 - 48).cast("double").alias("weight"),
    )
    scored = hashed_linear_score(docs, weights, n_buckets=_QM_BUCKETS)
    return scored.select(
        "doc_id",
        "n_tok",
        (F.floor(F.col("score") * 1e6) / 1e6).alias("score"),
    ).orderBy("doc_id")


_QM_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS tok
  FROM documents WHERE doc_id < 300
),
bucketed AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {_QM_BUCKETS} AS bucket
  FROM toks
),
weights AS (
  SELECT range AS bucket, CAST(range % 97 - 48 AS DOUBLE) AS weight
  FROM range({_QM_BUCKETS})
),
scored AS (
  SELECT b.doc_id,
         count(*) AS n_tok,
         sum(coalesce(w.weight, 0.0)) AS wsum
  FROM bucketed b LEFT JOIN weights w USING (bucket)
  GROUP BY 1
)
SELECT doc_id,
       n_tok,
       floor(1.0 / (1.0 + exp(-(wsum / n_tok))) * 1e6) / 1e6 AS score
FROM scored
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# chunk_documents_sliding — sliding-window token chunking (the RAG/
# embedding-prep op): overlapping fixed-size windows, chunk text carried
# for downstream encoding, compared by md5 to keep the oracle payload
# narrow. Pure map-side explode — no shuffle.
# ---------------------------------------------------------------------------

_CHUNK_W, _CHUNK_S = 32, 24  # window/stride sized to the synthetic docs


def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import chunk_sliding

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_sliding(docs, window=_CHUNK_W, stride=_CHUNK_S)
    return out.select(
        F.col("id").alias("doc_id"),
        "chunk_id",
        "start_tok",
        "n_chunk_tok",
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS tk FROM documents
),
stats AS (
  SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0
),
chunks AS (
  SELECT doc_id, tk, n, gs.i AS chunk_id
  FROM stats, LATERAL unnest(generate_series(0,
    CASE WHEN n <= {_CHUNK_W} THEN 0
         ELSE CAST(ceil((n - {_CHUNK_W}) / {_CHUNK_S}.0) AS BIGINT) END)) gs(i)
)
SELECT doc_id, chunk_id,
       chunk_id * {_CHUNK_S} AS start_tok,
       least({_CHUNK_W}, n - chunk_id * {_CHUNK_S}) AS n_chunk_tok,
       md5(array_to_string(
         tk[chunk_id * {_CHUNK_S} + 1 :
            chunk_id * {_CHUNK_S} + least({_CHUNK_W}, n - chunk_id * {_CHUNK_S})],
         ' ')) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# corpus_clean_funnel — the end-to-end pre-training data-cleaning
# pipeline as ONE oracle-checked query: language-ID filter -> heuristic
# quality filter -> exact dedup (first-wins) -> benchmark
# decontamination, reporting the per-stage survivor counts (the funnel
# every published pipeline reports). Runs over the deterministically
# dup'd corpus so the dedup stage provably removes rows; benchmark docs
# (doc_id % 97 == 0) are held out, and their injected +1M copies that
# survive the filters are caught by the decontamination stage.
# Scale: stages are lazy filters over one scan; dedup is one shuffle on
# the fingerprint; decontamination is a distinct-gram anti-join.
# ---------------------------------------------------------------------------

_FUNNEL_EN, _FUNNEL_Q = 0.05, 0.8


def corpus_clean_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 optimization (guide §1.2-1, don't recompute what you throw
    # away): the original built one count branch PER STAGE, so the
    # corpus scan + scoring lineage evaluated 5x (and the dedup window
    # 3x — once each for the n3, gram, and anti-join consumers). Now:
    # stage counts 0-2 come from ONE scoring pass (a single aggregate
    # with conditional counts — the flags are cumulative, p2 implies
    # p1), the dedup survivors are pinned once (lazy localCheckpoint —
    # the scan+score+window lineage otherwise re-evaluates for the
    # gram side AND both sides of the anti-join), and n3/n4 fold into
    # ONE aggregate over a contamination-flag left join instead of two
    # more count branches. Same five numbers, hash-identical; the
    # oracle SQL is untouched.
    from etl_ml_pipeline_spark.queries.dedup_q import _dup_corpus

    corpus = _dup_corpus(spark, sf_dir, heavy=True).filter(
        F.col("doc_id") % 97 != 0
    )
    c = F.col("text")
    p1 = X.en_score(c) >= _FUNNEL_EN
    p2 = p1 & (X.quality_score(c) >= _FUNNEL_Q)
    counts012 = corpus.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count(F.when(p1, 1)).alias("n1"),
        F.count(F.when(p2, 1)).alias("n2"),
    )

    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(X.fingerprint(c)).orderBy("doc_id")
    )
    s3 = (
        corpus.filter(p2)
        .withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )

    bench_grams = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select(
            F.explode(F.array_distinct(X.word_ngrams(c, 5))).alias("g")
        )
        .select(X.token_hash60(F.col("g")).alias("gh"))
        .distinct()
    )
    s3_grams = s3.select(
        "doc_id",
        F.explode(F.array_distinct(X.word_ngrams(c, 5))).alias("g"),
    ).select("doc_id", X.token_hash60(F.col("g")).alias("gh"))
    contaminated = (
        s3_grams.join(F.broadcast(bench_grams), "gh")
        .select("doc_id")
        .distinct()
        .withColumn("__dirty", F.lit(1))
    )
    counts34 = s3.join(contaminated, "doc_id", "left").agg(
        F.count(F.lit(1)).alias("n3"),
        F.count(F.when(F.col("__dirty").isNull(), 1)).alias("n4"),
    )

    counts = counts012.crossJoin(counts34).selectExpr(
        "stack(5, '0_corpus', n0, '1_langid', n1, '2_quality', n2, "
        "'3_dedup', n3, '4_decontaminated', n4) AS (stage, n_docs)"
    )
    return counts.orderBy("stage")


def _funnel_oracle() -> str:
    from etl_ml_pipeline_spark.queries.dedup_q import _DUP_CORPUS_SQL

    return f"""
WITH corpus AS (
  SELECT * FROM ({_DUP_CORPUS_SQL}) WHERE doc_id % 97 != 0
),
scored AS (
  SELECT doc_id, text, {_TOKS_DUCK} AS tk FROM corpus
),
s1 AS (
  SELECT doc_id, text, tk FROM scored
  WHERE len(list_filter(tk, x -> x IN ({_STOP_SQL_LIST}))) * 1.0 / len(tk)
        >= {_FUNNEL_EN}
),
s2 AS (
  SELECT doc_id, text, tk FROM s1
  WHERE (CASE WHEN len(tk) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
        + least(len(list_distinct(tk)) * 1.0 / len(tk), 0.5) * 0.6
        + (CASE WHEN len(list_filter(tk, x -> x IN ({_STOP_SQL_LIST})))
                     * 1.0 / len(tk) BETWEEN 0.01 AND 0.5
           THEN 0.2 ELSE 0.0 END) >= {_FUNNEL_Q}
),
s3 AS (
  SELECT doc_id, text, tk FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
      ORDER BY doc_id) AS rn
    FROM s2) WHERE rn = 1
),
bench_grams AS (
  SELECT DISTINCT ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM (
    SELECT unnest(list_distinct(list_transform(range(1, len(tk) - 3),
      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
           || ' ' || tk[i+4]))) AS gram
    FROM (SELECT {_TOKS_DUCK} AS tk FROM documents WHERE doc_id % 97 = 0))
),
s4 AS (
  SELECT s3.doc_id FROM s3
  WHERE NOT EXISTS (
    SELECT 1 FROM (
      SELECT unnest(list_distinct(list_transform(range(1, len(s3.tk) - 3),
        i -> s3.tk[i] || ' ' || s3.tk[i+1] || ' ' || s3.tk[i+2] || ' '
             || s3.tk[i+3] || ' ' || s3.tk[i+4]))) AS gram) g
    JOIN bench_grams b
      ON ('0x' || substr(md5(g.gram), 1, 15))::BIGINT = b.gh)
)
SELECT stage, n_docs FROM (
  SELECT '0_corpus' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM corpus
  UNION ALL SELECT '1_langid', CAST(count(*) AS BIGINT) FROM s1
  UNION ALL SELECT '2_quality', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL SELECT '3_dedup', CAST(count(*) AS BIGINT) FROM s3
  UNION ALL SELECT '4_decontaminated', CAST(count(*) AS BIGINT) FROM s4
) ORDER BY stage
"""


# ---------------------------------------------------------------------------
# sketch_heavy_hitters_terms — distributed Misra-Gries heavy hitters
# with an oracle-asserted deficiency contract.
# The corpus vocabulary is near-uniform (no true heavy hitter), so the
# term stream is derived deterministically with planted skew: doc_id%3
# docs emit 'hot_a' (~33%), remaining doc_id%7 docs 'hot_b' (~9.5%),
# the rest a ~700-key tail — MG(k=16) must trim aggressively, and the
# two planted keys are the only terms above the n/k=6.25% threshold.
# Outputs are PARTITION-INDEPENDENT: per true-heavy term, `in_sketch`
# (candidate survived — MG guarantees TRUE) and `bound_ok`
# (exact - n/(k+1) <= merged mg_count <= exact, the deficiency bound) —
# the sketch's raw counts vary with partitioning and are not emitted.
# Scale: O(k) state per partition, k*partitions candidate rows total;
# the exact side here exists only to judge the sketch.
# ---------------------------------------------------------------------------

_MG_K = 16


def _skewed_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        F.when(F.col("doc_id") % 3 == 0, F.lit("hot_a"))
        .when(F.col("doc_id") % 7 == 0, F.lit("hot_b"))
        .otherwise(F.concat(F.lit("t"), (F.col("doc_id") % 1000).cast("string")))
        .alias("term")
    )


def sketch_heavy_hitters_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.sketch import misra_gries_candidates

    terms = _skewed_terms(spark, sf_dir)
    total = terms.agg(F.count("*").alias("n_total"))
    exact = terms.groupBy("term").agg(F.count("*").alias("exact_count"))
    heavy = exact.crossJoin(F.broadcast(total)).filter(
        F.col("exact_count") * _MG_K > F.col("n_total")  # integer-exact n/k test
    )
    cands = misra_gries_candidates(terms, "term", _MG_K).withColumnRenamed(
        "term", "c_term"
    )
    return (
        heavy.join(cands, heavy.term == F.col("c_term"), "left")
        .select(
            "term",
            "exact_count",
            F.col("c_term").isNotNull().alias("in_sketch"),
            (
                F.col("c_term").isNotNull()
                & (F.col("mg_count") <= F.col("exact_count"))
                & (
                    F.col("mg_count") * (_MG_K + 1)
                    >= F.col("exact_count") * (_MG_K + 1) - F.col("n_total")
                )
            ).alias("bound_ok"),
        )
        .orderBy("term")
    )


_MG_SQL = f"""
WITH terms AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'hot_a'
              WHEN doc_id % 7 = 0 THEN 'hot_b'
              ELSE 't' || CAST(doc_id % 1000 AS VARCHAR) END AS term
  FROM documents
), tot AS (SELECT count(*) AS n_total FROM terms),
ex AS (SELECT term, count(*) AS exact_count FROM terms GROUP BY term)
SELECT term, CAST(exact_count AS BIGINT) AS exact_count,
       TRUE AS in_sketch, TRUE AS bound_ok
FROM ex, tot
WHERE exact_count * {_MG_K} > n_total
ORDER BY term
"""




# ---------------------------------------------------------------------------
# sketch_cms_frequency — Count-Min point-frequency estimates over the
# same planted-skew term stream the Misra-Gries query uses, probed at
# the two heavy terms, three tail terms, and one absent term. Because
# the row hashes are md5-derived (operators/sketch.cms_bucket), DuckDB
# rebuilds the IDENTICAL depth x width matrix and the oracle checks the
# estimates cell-for-cell — plus the one-sided guarantee
# (cms_estimate >= exact_count, always true by construction).
# Scale: the sketch build is one shuffle bounded at depth*width keys
# with full map-side partial aggregation — state independent of
# vocabulary size, the streaming-frequency answer the exact
# groupBy(term) can't give at 100 TB vocab cardinality.
# ---------------------------------------------------------------------------

_CMS_DEPTH, _CMS_WIDTH = 4, 1024
_CMS_PROBES = ("hot_a", "hot_b", "t1", "t5", "t998", "absent_term")


def sketch_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.sketch import (
        count_min_estimate,
        count_min_matrix,
    )

    terms = _skewed_terms(spark, sf_dir)
    matrix = count_min_matrix(terms, "term", _CMS_DEPTH, _CMS_WIDTH)
    probes = spark.createDataFrame(
        [(p,) for p in _CMS_PROBES], "term string"
    )
    est = count_min_estimate(matrix, probes, "term", _CMS_DEPTH, _CMS_WIDTH)
    # exact counts only for the 6 probe terms — the left join below
    # never consumed the other groups; the aggregate (and its map-side
    # partials / shuffle) is now |probes| groups, not |vocab|. term is
    # a derived CASE column, so the filter runs post-projection, not
    # at the scan (r15)
    exact = (
        terms.filter(F.col("term").isin(*_CMS_PROBES))
        .groupBy("term")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        est.join(exact, "term", "left")
        .select(
            F.col("term").alias("probe"),
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") >= F.coalesce("exact_count", F.lit(0))).alias(
                "over_ok"
            ),
        )
        .orderBy("probe")
    )


_CMS_PROBE_VALUES = ", ".join(f"('{p}')" for p in _CMS_PROBES)

_CMS_SQL = f"""
WITH terms AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'hot_a'
              WHEN doc_id % 7 = 0 THEN 'hot_b'
              ELSE 't' || CAST(doc_id % 1000 AS VARCHAR) END AS term
  FROM documents
),
rows_j AS (SELECT unnest(range({_CMS_DEPTH})) AS j),
cells AS (
  SELECT j,
         ('0x' || substr(md5(term || '|' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
           % {_CMS_WIDTH} AS bucket,
         count(*) AS cnt
  FROM terms, rows_j
  GROUP BY 1, 2
),
probes(term) AS (VALUES {_CMS_PROBE_VALUES}),
pcells AS (
  SELECT term, j,
         ('0x' || substr(md5(term || '|' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
           % {_CMS_WIDTH} AS bucket
  FROM probes, rows_j
),
est AS (
  SELECT term, min(coalesce(cnt, 0)) AS cms_estimate
  FROM pcells LEFT JOIN cells USING (j, bucket)
  GROUP BY term
),
ex AS (SELECT term, count(*) AS exact_count FROM terms GROUP BY term)
SELECT est.term AS probe,
       CAST(coalesce(ex.exact_count, 0) AS BIGINT) AS exact_count,
       CAST(est.cms_estimate AS BIGINT) AS cms_estimate,
       est.cms_estimate >= coalesce(ex.exact_count, 0) AS over_ok
FROM est LEFT JOIN ex ON est.term = ex.term
ORDER BY probe
"""


# ---------------------------------------------------------------------------
# text_novelty_surprise — unigram LM surprisal per document: mean
# -ln(p(token)) under the corpus unigram model. The cheap statistical
# novelty/outlier score (high = rare vocabulary, low = boilerplate) —
# the unigram end of the perplexity-filter family used in corpus
# curation (CCNet-style), computable without any external LM.
# Scale: one explode->groupBy(term) shuffle builds the frequency
# table (vocab-sized, size-guard broadcast back), one per-doc
# aggregate. Cross-engine: ln() differs by <=1 ulp between libms and
# the per-doc sum is order-free float addition — both sit ~1e-13
# relative, far under the 1e-4 floor truncation (same acceptance as
# pagerank's inflow sums).
# ---------------------------------------------------------------------------


def text_novelty_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("term")
    )
    # tokenize ONCE (round-9 pattern): per-(doc, term) counts are the
    # single token-scale shuffle. r16 (VERDICT r15 #1 sweep): the r15
    # corpus-total window over the frequency frame single-partitioned
    # |vocab| rows — and vocab SCALES WITH THE DATA (Heaps' law), the
    # same shape q11/q15 had to drop. Pin dtc once (lazy
    # localCheckpoint; it has three consumers: freq, the corpus total,
    # and the scoring join — the pin guarantees the token-scale explode
    # runs exactly once regardless of column-pruning de-identification),
    # then N is a PLAIN aggregate of the pin (sum of int64 counts —
    # partial aggregation, order-free, bit-identical) broadcast onto
    # the vocab frame. No data-scaled single partition. k * (-ln p) is
    # one rounding where the occurrence-sum was k-1 — strictly more
    # accurate; the oracle computes the identical reduced expression.
    dtc = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("k")
    ).localCheckpoint(eager=False)
    n_tot = dtc.agg(F.sum("k").alias("N"))
    freq = (
        dtc.groupBy("term")
        .agg(F.sum("k").alias("tf"))
        .crossJoin(F.broadcast(n_tot))
    )
    scored = dtc.join(
        maybe_broadcast(freq, sf_dir, "documents"), "term"
    ).withColumn("s", F.col("k") * -F.log(F.col("tf") / F.col("N")))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            (F.floor(F.sum("s") / F.sum("k") * 10000) / 10000).alias(
                "surprise"
            ),
        )
        .orderBy("doc_id")
    )


_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
),
d AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS k
      FROM toks GROUP BY doc_id, term),
freq AS (SELECT term, CAST(sum(k) AS BIGINT) AS tf,
                CAST(sum(sum(k)) OVER () AS BIGINT) AS n
         FROM d GROUP BY term)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_tokens,
       floor(sum(k * -ln(tf / CAST(n AS DOUBLE))) / sum(k) * 10000) / 10000
         AS surprise
FROM d JOIN freq USING (term)
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text_novelty_trigram — trigram-LM surprisal per document: mean
# -ln P(w3 | w1 w2) under the corpus trigram MLE, the higher-order
# companion of text_novelty_surprise (unigram). P(w3|w1w2) =
# c(w1w2w3) / c(w1w2·) where the denominator counts the CONTEXT as it
# appears in trigram slots — exact integer ratios, so the only
# cross-engine noise is ln()'s <=1 ulp, far under the 1e-4 floor.
# Documents with fewer than 3 tokens have no trigram slots and are
# excluded (explode of the guarded empty shingle array drops them) —
# the oracle's empty range() does the same.
# Scale: two groupBy shuffles on gram keys (trigram + context vocab)
# and one join back on the exploded stream — the same shape as
# text_contamination; frequency tables are size-guard broadcast.
# ---------------------------------------------------------------------------


def text_novelty_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tris = docs.select(
        "doc_id", F.explode(X.word_ngrams(F.col("text"), 3)).alias("tri")
    ).withColumn("ctx", F.regexp_replace(F.col("tri"), " [^ ]+$", ""))
    # Tokenize ONCE (the round-9 pattern): the per-(doc, tri) count is
    # the single trigram-scale shuffle; tri/ctx frequencies re-aggregate
    # it and the scoring side joins back on the same subtree — the old
    # form re-derived the explode for all three consumers. Numerics:
    # k * (-ln x) is one rounding where the occurrence-sum was k-1, so
    # the reduced form is strictly MORE accurate; the oracle computes
    # the identical reduced expression.
    dtc = tris.groupBy("doc_id", "tri", "ctx").agg(F.count("*").alias("k"))
    # r15 optimization: the tri/ctx frequency tables were separate
    # aggregate branches joined back onto dtc — the executed plan showed
    # the trigram explode re-derived for all three consumers (6 scans,
    # 14 exchanges, zero ReusedExchange: column pruning de-identifies
    # the branch subtrees, so AQE reuse never fires). Frequencies are
    # now WINDOW sums over the single dtc lineage — c3 = sum(k) over
    # (partition by tri), c2 = sum(k) over (partition by ctx): same
    # integers into the identical s expression, one scan, two gram-key
    # window shuffles instead of two aggregate branches + two joins.
    # At 100 TB each window partition is a gram's postings (bounded by
    # document frequency), the same key distribution the old aggregate
    # shuffles had.
    from pyspark.sql import Window as W

    scored = (
        dtc.withColumn("c3", F.sum("k").over(W.partitionBy("tri")))
        .withColumn("c2", F.sum("k").over(W.partitionBy("ctx")))
        .withColumn("s", F.col("k") * -F.log(F.col("c3") / F.col("c2")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_trigrams"),
            (F.floor(F.sum("s") / F.sum("k") * 10000) / 10000).alias(
                "surprise_tri"
            ),
        )
        .orderBy("doc_id")
    )


_TRIGRAM_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS tk FROM documents
),
tris AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS tri
  FROM toks
),
w AS (SELECT doc_id, tri, regexp_replace(tri, ' [^ ]+$', '') AS ctx FROM tris),
d AS (SELECT doc_id, tri, ctx, CAST(count(*) AS BIGINT) AS k
      FROM w GROUP BY doc_id, tri, ctx),
tf AS (SELECT tri, CAST(sum(k) AS BIGINT) AS c3 FROM d GROUP BY tri),
cf AS (SELECT ctx, CAST(sum(k) AS BIGINT) AS c2 FROM d GROUP BY ctx)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_trigrams,
       floor(sum(k * -ln(c3 / CAST(c2 AS DOUBLE))) / sum(k) * 10000) / 10000
         AS surprise_tri
FROM d JOIN tf USING (tri) JOIN cf USING (ctx)
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text_bpe_train_merges — distributed BPE tokenizer training (first 4
# merge rules over the documents word corpus). The oracle UNROLLS the
# training loop: each round's pair counts, argmax (ties by pair text),
# and literal merge replace are replayed in SQL, so a green row proves
# the full iterative training — counts, tie-breaks, and merge
# application — is bit-identical across engines.
# Scale: one pair-count shuffle per round, map-only merges, winner
# propagated by a 1-row broadcast — no driver collect (see
# operators/text.bpe_train_merges).
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 4


def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import bpe_train_merges

    words = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
    )
    return bpe_train_merges(words, "w", rounds=_BPE_ROUNDS).select(
        "round", "pair", "merged", F.col("n").cast("long").alias("n")
    )


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    parts = ["""
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
seq0 AS (
  SELECT array_to_string(
           list_transform(string_split(w, ''), c -> '\u00b7' || c || '\u00b7'),
           ' ') AS seq,
         freq
  FROM words
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
p{r} AS (
  SELECT t[i] || ' ' || t[i + 1] AS pair, sum(freq) AS n
  FROM (SELECT string_split(seq, ' ') AS t, freq FROM seq{r - 1}),
       UNNEST(range(1, len(t))) AS u(i)
  GROUP BY 1
),
top{r} AS (SELECT pair, n FROM p{r} ORDER BY n DESC, pair LIMIT 1),
seq{r} AS (
  SELECT replace(seq, (SELECT pair FROM top{r}),
                 (SELECT replace(pair, '\u00b7 \u00b7', '') FROM top{r})) AS seq,
         freq
  FROM seq{r - 1}
)""")
    selects = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, pair, replace(pair, '\u00b7 \u00b7', '') AS merged, "
        f"CAST(n AS BIGINT) AS n FROM top{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n" + selects + "\nORDER BY round"


# ---------------------------------------------------------------------------
# text_bpe_encode_stats — tokenizer APPLICATION with a compression
# contract: train the same 4-round merge schedule as
# text_bpe_train_merges, materialize the word -> post-merge token-count
# dictionary, and encode the corpus by joining every document word
# against it — per language: word/char/BPE-token totals, the
# chars-per-token compression ratio (floored to 4 decimals), and a
# boolean `compresses` contract (merges can only shrink, so BPE tokens
# <= chars must hold). The oracle UNROLLS train + apply: a green row
# proves the full train-then-encode composition — merge schedule,
# dictionary, join, per-lang sums — is bit-identical across engines.
#
# Scale: the merge loop runs over the vocabulary (one word-count
# shuffle up front, then dict-sized rounds); encoding is a
# vocabulary-sized broadcast join against the raw word stream plus one
# per-lang aggregate — the production tokenizer-apply shape, nothing
# per-token reaches the driver.
# ---------------------------------------------------------------------------


def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import bpe_word_tokens

    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = bpe_word_tokens(
        docs.select(F.explode(F.split("text", " ")).alias("w")),
        "w",
        rounds=_BPE_ROUNDS,
    )
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
            (
                F.floor(F.sum(F.length("w")) / F.sum("n_tokens") * 10000)
                / 10000
            ).alias("chars_per_token"),
            (F.sum("n_tokens") <= F.sum(F.length("w"))).alias("compresses"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# text_bpe_roundtrip — the tokenizer ROUND-TRIP contract (VERDICT r06
# ask #4, the reference's test_finance_transformer.py-style invariant
# discipline applied to the tokenizer): decode(encode(word)) == word
# for every vocabulary word, plus a per-language compression-ratio
# bound. Merges are pure re-groupings of the character stream, so the
# decode leg (strip markers + separators) must reproduce the word
# byte-for-byte; chars_per_token >= 1 because every token carries at
# least one character. Both contracts ride as literal booleans the
# oracle pins TRUE, and n_roundtrip_fail is pinned 0 — the oracle
# unrolls the identical train+apply+decode pipeline, so a green row
# proves the full composition is bit-identical across engines.
#
# Scale: same plan as text_bpe_encode_stats — dictionary-sized merge
# loop, two map-side literal replaces for the decode, one broadcast
# join against the word stream, one per-lang aggregate.
# ---------------------------------------------------------------------------


def text_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import bpe_word_dict

    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = bpe_word_dict(
        docs.select(F.explode(F.split("text", " ")).alias("w")),
        "w",
        rounds=_BPE_ROUNDS,
    )
    fail = F.sum(F.when(F.col("decoded") != F.col("w"), 1).otherwise(0))
    ratio = F.floor(F.sum(F.length("w")) / F.sum("n_tokens") * 10000) / 10000
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            fail.cast("long").alias("n_roundtrip_fail"),
            (fail == 0).alias("roundtrip_ok"),
            ratio.alias("chars_per_token"),
            (ratio >= 1.0).alias("compression_ok"),
        )
        .orderBy("lang")
    )


def _bpe_roundtrip_oracle(rounds: int = _BPE_ROUNDS) -> str:
    head = _bpe_encode_oracle(rounds)
    # reuse the unrolled train CTEs, swap the final vocab + aggregate
    head = head[: head.index(",\nvocab AS (")]
    return head + f""",
vocab AS (
  SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tokens,
         replace(replace(seq, ' ', ''), '·', '') AS decoded
  FROM seq{rounds}
),
docwords AS (
  SELECT lang, w
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(CASE WHEN decoded <> d.w THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip_fail,
       sum(CASE WHEN decoded <> d.w THEN 1 ELSE 0 END) = 0 AS roundtrip_ok,
       floor(sum(length(d.w)) / sum(n_tokens) * 10000) / 10000
         AS chars_per_token,
       floor(sum(length(d.w)) / sum(n_tokens) * 10000) / 10000 >= 1.0
         AS compression_ok
FROM docwords d JOIN vocab USING (w)
GROUP BY lang
ORDER BY lang"""


def _bpe_encode_oracle(rounds: int = _BPE_ROUNDS) -> str:
    parts = ["""
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
seq0 AS (
  SELECT w,
         array_to_string(
           list_transform(string_split(w, ''), c -> '·' || c || '·'),
           ' ') AS seq,
         freq
  FROM words
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
p{r} AS (
  SELECT t[i] || ' ' || t[i + 1] AS pair, sum(freq) AS n
  FROM (SELECT string_split(seq, ' ') AS t, freq FROM seq{r - 1}),
       UNNEST(range(1, len(t))) AS u(i)
  GROUP BY 1
),
top{r} AS (SELECT pair, n FROM p{r} ORDER BY n DESC, pair LIMIT 1),
seq{r} AS (
  SELECT w,
         replace(seq, (SELECT pair FROM top{r}),
                 (SELECT replace(pair, '· ·', '') FROM top{r})) AS seq,
         freq
  FROM seq{r - 1}
)""")
    parts.append(f""",
vocab AS (
  SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tokens
  FROM seq{rounds}
),
docwords AS (
  SELECT lang, w
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(d.w)) AS BIGINT) AS n_chars,
       CAST(sum(n_tokens) AS BIGINT) AS n_bpe_tokens,
       floor(sum(length(d.w)) / sum(n_tokens) * 10000) / 10000
         AS chars_per_token,
       sum(n_tokens) <= sum(length(d.w)) AS compresses
FROM docwords d JOIN vocab USING (w)
GROUP BY lang
ORDER BY lang""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# hybrid_search_rrf — hybrid retrieval with reciprocal-rank fusion, the
# standard RAG/corpus-search composition: a lexical ranking (BM25 over
# each query doc's top-3 salient terms — "more-like-this") and a dense
# ranking (exact cosine over the aligned embedding) are fused per
# candidate as 1/(60+lex_rank) + 1/(60+vec_rank) and the top-10 emitted.
#
# Cross-engine exactness: BM25 contributions floor-truncate to INTEGER
# ten-thousandths before the per-query sum (order-free integer adds, no
# float reduction ambiguity), both rankings break ties on candidate id,
# and RRF is computed from integer ranks with the identical expression
# tree — so the fused ordering is bit-deterministic.
#
# Scale: the lexical leg is the text_bm25_top_terms plan (corpus-sized
# shuffles, vocab re-aggregation, broadcast scalars) plus a term
# equi-join against the tiny query-term set; the dense leg broadcasts
# the query block (brute_force_topk) — swap in the IVF/LSH variants for
# billion-vector corpora, the fusion stage is unchanged.
# ---------------------------------------------------------------------------

_RRF_K = 60
_HY_QUERIES, _HY_CORPUS, _HY_TERMS, _HY_TOPK = 5, 200, 3, 10


def hybrid_search_rrf(
    spark: SparkSession,
    sf_dir: str,
    dense_index: str = "brute",
    n_probe: int = 4,
) -> DataFrame:
    """Hybrid lexical+dense retrieval fused with RRF (1/(60+rank)).

    ``dense_index`` selects the dense leg (VERDICT r05 #8 — the scale
    swap is a parameter, not prose): ``"brute"`` (default, the exact
    oracle-checked demo path) ranks every corpus vector per query;
    ``"ivf"`` routes the dense leg through the stride-centroid IVF
    index (``operators.similarity.ivf_topk``) — candidates come from
    the ``n_probe`` nearest inverted lists only, which is the
    billion-vector posture (candidate generation is a bucketed
    equi-join, never all-pairs). With ``n_probe`` >= the centroid
    count the probed lists cover the whole corpus and the IVF leg is
    provably identical to brute force (pinned in
    tests/test_llm_ops.py); at production probe counts the usual IVF
    recall trade-off applies to the fused ranking.
    """
    from pyspark.sql.window import Window

    from etl_ml_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    if dense_index not in ("brute", "ivf"):
        raise ValueError(f"dense_index must be 'brute' or 'ivf', got {dense_index!r}")

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < _HY_CORPUS)
    tf = (
        docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # count(when(tf>0,1)) == count(*) but keeps tf referenced so this
    # branch's subtree stays identical to the shared tf pipeline and
    # Catalyst reuses ONE exchange instead of re-tokenizing the corpus
    # (see text_bm25_top_terms for the full note).
    df_ = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, 1)).alias("df")
    )
    scalars = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    # r15 optimization: pin the BM25 postings once — `scored` feeds
    # both the query-term extraction (5-doc filter + window) and the
    # corpus-side candidate scoring, and the branches prune differently
    # enough that the executed plan re-derived the tf pipeline + three
    # joins per consumer (16 scans / 41 exchanges, only 6 reused). The
    # postings frame is (doc, term, s_i) — integer-scored and narrow;
    # materializing it once is the same bytes the reused shuffle files
    # already cost (the _pin_partitioning trade). Measured 0.83x
    # interleaved at sf0.1 (1.46s -> 1.20s medians,
    # scripts/r15_ab4.json); rows unchanged (oracle-green).
    scored = (
        tf.join(maybe_broadcast(df_, sf_dir, "documents"), "term")
        .join(maybe_broadcast(dl, sf_dir, "documents"), "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            "term",
            F.floor(idf * F.col("tf") * (_BM25_K1 + 1) / denom * 10000)
            .cast("long")
            .alias("s_i"),
        )
        .localCheckpoint(eager=False)
    )
    wq = Window.partitionBy("doc_id").orderBy(F.desc("s_i"), "term")
    qterms = (
        scored.filter(F.col("doc_id") < _HY_QUERIES)
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _HY_TERMS)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    lex_hits = (
        F.broadcast(qterms)
        .join(scored.select(F.col("doc_id").alias("c_id"), "term", "s_i"), "term")
        .groupBy("q_id", "c_id")
        .agg(F.sum("s_i").alias("lex_i"))
    )
    full = (
        docs.select(F.col("doc_id").alias("c_id"))
        .crossJoin(F.broadcast(spark.range(_HY_QUERIES).select(F.col("id").alias("q_id"))))
        .join(lex_hits, ["q_id", "c_id"], "left")
        .fillna({"lex_i": 0})
    )
    wl = Window.partitionBy("q_id").orderBy(F.desc("lex_i"), "c_id")
    lex_rank = full.select(
        "q_id", "c_id", F.row_number().over(wl).alias("lex_rank")
    )
    emb = t(spark, sf_dir, "embeddings", heavy=True).filter(
        F.col("vec_id") < _HY_CORPUS
    )
    dense_queries = emb.filter(F.col("vec_id") < _HY_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dense_corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    if dense_index == "brute":
        dense_topk = brute_force_topk(dense_queries, dense_corpus, k=_HY_CORPUS)
    else:
        centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_vec"),
        )
        dense_topk = ivf_topk(
            dense_queries, dense_corpus, centroids, k=_HY_CORPUS, n_probe=n_probe
        )
    vec_rank = dense_topk.select("q_id", "c_id", F.col("rank").alias("vec_rank"))
    fused = (
        lex_rank.join(vec_rank, ["q_id", "c_id"])
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn(
            "rrf",
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank"))
            + F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf"), "c_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= _HY_TOPK)
        .select(
            "q_id",
            "rank",
            "c_id",
            "lex_rank",
            "vec_rank",
            (F.floor(F.col("rrf") * 1000000) / 1000000).alias("rrf"),
        )
        .orderBy("q_id", "rank")
    )


_HYBRID_SQL = f"""
WITH tfr AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term
  FROM documents WHERE doc_id < {_HY_CORPUS}
),
tfc AS (SELECT doc_id, term, count(*) AS tf FROM tfr GROUP BY 1, 2),
dl  AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tfc GROUP BY 1),
dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
scalars AS (SELECT count(*) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
            FROM dl),
scored AS (
  SELECT t.doc_id, t.term,
         CAST(floor(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * t.tf * ({_BM25_K1} + 1)
               / (t.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / avgdl))
               * 10000) AS BIGINT) AS s_i
  FROM tfc t JOIN dfc USING (term) JOIN dl USING (doc_id) CROSS JOIN scalars
),
qterms AS (
  SELECT doc_id AS q_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY s_i DESC, term) AS rk
    FROM scored WHERE doc_id < {_HY_QUERIES}
  ) WHERE rk <= {_HY_TERMS}
),
lex_hits AS (
  SELECT q.q_id, s.doc_id AS c_id, CAST(sum(s.s_i) AS BIGINT) AS lex_i
  FROM qterms q JOIN scored s USING (term)
  GROUP BY 1, 2
),
lex_full AS (
  SELECT q.q_id, i.c_id, coalesce(h.lex_i, 0) AS lex_i
  FROM (SELECT doc_id AS c_id FROM documents WHERE doc_id < {_HY_CORPUS}) i
  CROSS JOIN (SELECT unnest(range({_HY_QUERIES})) AS q_id) q
  LEFT JOIN lex_hits h ON h.q_id = q.q_id AND h.c_id = i.c_id
),
lex_rank AS (
  SELECT q_id, c_id,
         row_number() OVER (PARTITION BY q_id ORDER BY lex_i DESC, c_id) AS lex_rank
  FROM lex_full
),
vq AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < {_HY_QUERIES}),
vc AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv
       FROM embeddings WHERE vec_id < {_HY_CORPUS}),
vec_rank AS (
  SELECT q_id, c_id,
         row_number() OVER (
           PARTITION BY q_id
           ORDER BY list_cosine_similarity(qv, cv) DESC, c_id) AS vec_rank
  FROM vq CROSS JOIN vc
),
fused AS (
  SELECT l.q_id, l.c_id, l.lex_rank, v.vec_rank,
         1.0 / ({_RRF_K} + l.lex_rank) + 1.0 / ({_RRF_K} + v.vec_rank) AS rrf
  FROM lex_rank l JOIN vec_rank v ON l.q_id = v.q_id AND l.c_id = v.c_id
  WHERE l.c_id != l.q_id
)
SELECT q_id, rank, c_id, lex_rank, vec_rank,
       floor(rrf * 1000000) / 1000000 AS rrf
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, c_id)
             AS rank
      FROM fused)
WHERE rank <= {_HY_TOPK}
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# corpus_stats_battery — the one-row dataset card every corpus release
# ships: volume (docs, chars), diversity (languages, sources), hygiene
# (exact-duplicate rate), and central tendency (mean + exact median
# length). All integer-exact: the dup rate is parts-per-million by
# integer division, the mean is milli-chars by integer division, and
# the median is the NEAREST-RANK p50 computed by a cumulative-frequency
# walk over the distinct length grid (the verify-skill pattern —
# interpolated percentiles are not oracle-safe). Scale: two bounded
# aggregations (corpus scalars; length grid |distinct n_chars| rows) —
# the only window runs over the length grid, never the corpus.
# ---------------------------------------------------------------------------


def corpus_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    scalars = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct_texts"),
    )
    grid = docs.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.withColumn("cum", F.sum("cnt").over(wcum))
    # nearest-rank p50: the smallest length whose cumulative frequency
    # reaches ceil(n/2) = (n+1) div 2 — INTEGER division on both
    # engines; float division would select the upper median for even n
    # r15 optimization: n_docs for the rank threshold comes from a
    # window sum over the length grid itself (sum of grid counts IS the
    # doc count) instead of broadcasting the scalars frame in — the
    # diamond re-derived the expensive 3x-countDistinct scalars
    # aggregate for the p50 branch. Same integer threshold.
    p50 = (
        cum.withColumn("n_docs", F.sum("cnt").over(Window.partitionBy()))
        .filter(F.col("cum") >= F.expr("(n_docs + 1) DIV 2"))
        .agg(F.min("n_chars").alias("p50_chars"))
    )
    return scalars.crossJoin(F.broadcast(p50)).select(
        "n_docs",
        "total_chars",
        "n_langs",
        "n_sources",
        F.expr("(n_docs - n_distinct_texts) * 1000000 DIV n_docs").alias(
            "dup_ppm"
        ),
        F.expr("total_chars * 1000 DIV n_docs").alias("mean_chars_milli"),
        "p50_chars",
    )


_CORPUS_STATS_SQL = """
WITH scalars AS (
  SELECT count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
  FROM documents
),
grid AS (
  SELECT n_chars, count(*) AS cnt FROM documents GROUP BY 1
),
cum AS (
  SELECT n_chars, sum(cnt) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM grid
),
p50 AS (
  SELECT CAST(min(n_chars) AS BIGINT) AS p50_chars
  FROM cum CROSS JOIN scalars
  WHERE cum >= (n_docs + 1) // 2
)
SELECT n_docs, total_chars, n_langs, n_sources,
       (n_docs - n_distinct_texts) * 1000000 // n_docs AS dup_ppm,
       total_chars * 1000 // n_docs AS mean_chars_milli,
       p50_chars
FROM scalars CROSS JOIN p50
"""


# ---------------------------------------------------------------------------
# phrase_search_documents — positional phrase match, the exact-phrase
# leg a search stack runs next to BM25: the corpus' top-3 bigrams (by
# frequency, lexicographic tiebreak) are located in every document
# with match counts and first hit position. The bigram stream is a
# per-row HOF projection (transform over sequence — no window, no
# Python); the top-3 selection is one aggregation + TakeOrdered; the
# match scan is a broadcast semi-join of the 3-phrase set against the
# bigram stream. At 100 TB the same plan serves ad-hoc phrase queries:
# broadcast the (tiny) phrase list, aggregate per (phrase, doc).
# ---------------------------------------------------------------------------


def phrase_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("a")
    )
    big = (
        docs.filter(F.size("a") >= 2)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("a") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(F.col("a"), i), F.element_at(F.col("a"), i + 1)
                    ),
                )
            ).alias("pos0", "bigram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "bigram")
    )
    top3 = (
        big.groupBy("bigram")
        .agg(F.count("*").alias("corpus_freq"))
        .orderBy(F.desc("corpus_freq"), "bigram")
        .limit(3)
    )
    return (
        big.join(F.broadcast(top3), "bigram")
        .groupBy(F.col("bigram").alias("phrase"), "doc_id", "corpus_freq")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("pos").cast("int").alias("first_pos"),
        )
        .select("phrase", "doc_id", "n_matches", "first_pos", "corpus_freq")
        .orderBy("phrase", "doc_id")
    )


_PHRASE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS a FROM documents
),
big AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos, a[u.i] || ' ' || a[u.i + 1] AS bigram
  FROM toks, UNNEST(range(1, len(a))) AS u(i)
  WHERE len(a) >= 2
),
top3 AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS corpus_freq
  FROM big GROUP BY 1
  ORDER BY corpus_freq DESC, bigram
  LIMIT 3
)
SELECT b.bigram AS phrase, b.doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(b.pos) AS INT) AS first_pos,
       t.corpus_freq
FROM big b JOIN top3 t USING (bigram)
GROUP BY 1, 2, t.corpus_freq
ORDER BY phrase, doc_id
"""


# ---------------------------------------------------------------------------
# text_vocab_coverage — tokenizer vocabulary coverage / OOV rate: fix
# the top-V corpus vocabulary (V=500, freq desc / token asc — fully
# ordered so the cut is deterministic) and measure, per language, how
# much of the token stream it covers. The question every fixed-vocab
# tokenizer/pipeline asks before training: which slices of the mix are
# poorly served by the vocabulary (high OOV => more fallback bytes /
# worse compression for that language).
#
# Scale: one vocab count shuffle (map-side combined to |vocab| partial
# rows), a distributed sort+limit for the cut, a broadcast join of the
# V-row vocab against the token stream, one per-lang aggregate. OOV
# rate emitted as integer ppm (exact integer division).
# ---------------------------------------------------------------------------

_VOCAB_V = 500


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(X.tokens(F.col("text"))).alias("token")
    )
    # tokenize ONCE (the round-9 tokenize-once pattern): the
    # per-(lang, token) count is the single token-scale shuffle; the
    # vocab side re-aggregates it by token and the coverage side joins
    # back on the same subtree, so the explode runs once when Catalyst
    # reuses the exchange and the re-aggregations are vocab-scale.
    ltc = toks.groupBy("lang", "token").agg(F.count("*").alias("k"))
    vocab = (
        ltc.groupBy("token")
        .agg(F.sum("k").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(_VOCAB_V)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        ltc.join(F.broadcast(vocab), "token", "left")
        .groupBy("lang")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("k")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.countDistinct(
                F.when(F.col("in_vocab").isNull(), F.col("token"))
            )
            .cast("long")
            .alias("n_oov_types"),
        )
        .withColumn(
            "oov_ppm", F.expr("n_oov * 1000000 DIV n_tokens").cast("long")
        )
        .orderBy("lang")
    )


_VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT lang, unnest({_TOKS_DUCK}) AS token FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS freq FROM toks GROUP BY token
  ) ORDER BY freq DESC, token LIMIT {_VOCAB_V}
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(count(DISTINCT CASE WHEN v.token IS NULL THEN t.token END)
            AS BIGINT) AS n_oov_types,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS oov_ppm
FROM toks t LEFT JOIN vocab v USING (token)
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# text_gopher_rules — the Gopher/C4-style quality-rule battery (Rae et
# al. 2021 §A1.1; public heuristics): five named document-quality rules
# evaluated corpus-wide, one row per rule with pass/fail counts and the
# pass rate in ppm. All predicates are EXACT integer arithmetic
# (cross-multiplied ratios, never float division), so no document can
# straddle a threshold across engines.
#
# Rules: word count in [50, 100k]; mean word length in [3, 10];
# >= 2 distinct common-English stopwords; symbol chars <= 5%;
# digit chars <= 5%.
#
# Scale: one map-only projection per document (no explode — word counts
# come from split sizes, char classes from regexp_replace lengths) and
# a single 1-row aggregate unpivoted to the 5-rule report.
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "of", "and", "to", "in", "is", "that")


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    n_words = F.size(toks)
    sum_wlen = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    stop_hits = sum(
        [F.array_contains(toks, s).cast("int") for s in _GOPHER_STOPS],
        F.lit(0),
    )
    n_sym = F.length(
        F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", "")
    )
    n_dig = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    n_chars = F.length(F.col("text"))
    per = docs.select(
        (n_words.between(50, 100000)).alias("r_word_count"),
        (
            (3 * n_words <= sum_wlen) & (sum_wlen <= 10 * n_words)
        ).alias("r_mean_word_len"),
        (stop_hits >= 2).alias("r_stopwords"),
        (20 * n_sym <= n_chars).alias("r_symbol_ratio"),
        (20 * n_dig <= n_chars).alias("r_digit_ratio"),
    )
    rules = [
        "r_word_count",
        "r_mean_word_len",
        "r_stopwords",
        "r_symbol_ratio",
        "r_digit_ratio",
    ]
    agg = per.agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum(F.when(F.col(r), 1).otherwise(0)).alias(f"p_{r}")
            for r in rules
        ],
    )
    stack = ", ".join(f"'{r}', p_{r}" for r in rules)
    return (
        agg.selectExpr(
            "n_docs", f"stack({len(rules)}, {stack}) AS (rule, n_pass)"
        )
        .select(
            "rule",
            F.col("n_pass").cast("long").alias("n_pass"),
            (F.col("n_docs") - F.col("n_pass")).cast("long").alias("n_fail"),
            F.expr("n_pass * 1000000 DIV n_docs").cast("long").alias(
                "pass_ppm"
            ),
        )
        .orderBy("rule")
    )


def _gopher_oracle() -> str:
    stops_sum = " + ".join(
        f"CASE WHEN list_contains({_TOKS_DUCK}, '{s}') THEN 1 ELSE 0 END"
        for s in _GOPHER_STOPS
    )
    rules = {
        "r_word_count": "n_words BETWEEN 50 AND 100000",
        "r_mean_word_len": "3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words",
        "r_stopwords": "stop_hits >= 2",
        "r_symbol_ratio": "20 * n_sym <= n_chars",
        "r_digit_ratio": "20 * n_dig <= n_chars",
    }
    branches = "\nUNION ALL\n".join(
        f"SELECT '{r}' AS rule, CAST(sum(CASE WHEN {p} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_pass, CAST(sum(CASE WHEN {p} THEN 0 ELSE 1 END) "
        f"AS BIGINT) AS n_fail, CAST(sum(CASE WHEN {p} THEN 1 ELSE 0 END) "
        f"* 1000000 // count(*) AS BIGINT) AS pass_ppm FROM per"
        for r, p in rules.items()
    )
    return f"""
WITH per AS (
  SELECT len({_TOKS_DUCK}) AS n_words,
         length(regexp_replace(trim(text), '\\s+', '', 'g')) AS sum_wlen,
         {stops_sum} AS stop_hits,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_sym,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_dig,
         length(text) AS n_chars
  FROM documents
)
SELECT * FROM ({branches})
ORDER BY rule
"""


# ---------------------------------------------------------------------------
# split_decontamination_stats — cross-split contamination audit: after
# the deterministic hash split (80/20 train/held-out), how many
# held-out documents share word 5-grams with ANY training document?
# This is the decontamination gate every benchmark/eval split must
# pass before the train side ships (published pipelines use 8-13-gram
# overlap; 5 here for the synthetic corpus). Rides the same
# distinct-gram-hash equi-join as text_contamination — never a text
# comparison — then folds to per-language rates.
# Scale: both sides explode to distinct (id, 60-bit gram hash) pairs,
# meet in ONE equi-join, and the output is |langs| rows. BOTH sides of
# that join are corpus fractions (80% train / 20% held-out), so the
# join SHUFFLES on the gram hash — no broadcast hint (broadcasting the
# train grams would collect ~80% of the corpus's distinct grams to the
# driver; fixed in r13 per VERDICT r12 #1, pinned by
# tests/test_plans.py::test_split_decontam_gram_join_not_broadcast).
# At 100 TB the gram join shuffles token-scale data once, same as the
# dedup family.
# ---------------------------------------------------------------------------


def split_decontamination_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import (
        contamination_pairs,
        token_hash60,
    )

    docs = t(spark, sf_dir, "documents")
    h = token_hash60(F.col("doc_id").cast("string")) % 10
    train = docs.filter(h < 8)
    test = docs.filter(h >= 8)
    pairs = contamination_pairs(test, train, n=5, min_shared=1)
    per_doc = pairs.groupBy("corpus_id").agg(
        F.count("*").alias("n_partners"), F.sum("n_shared").alias("shared")
    )
    j = test.select("doc_id", "lang").join(
        per_doc, F.col("doc_id") == F.col("corpus_id"), "left"
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").alias("n_test"),
            F.count("corpus_id").alias("n_contaminated"),
            (
                F.floor(F.count("corpus_id") * 10000 / F.count("*")) / 10000
            ).alias("contamination_rate"),
            F.coalesce(F.sum("shared"), F.lit(0)).cast("long").alias(
                "shared_grams"
            ),
        )
        .orderBy("lang")
    )


_DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 AS b,
         {_TOKS_DUCK} AS tk
  FROM documents
),
grams AS (
  SELECT doc_id, b,
         unnest(list_distinct(list_transform(range(1, len(tk) - 3),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                 || ' ' || tk[i+4]))) AS gram
  FROM toks
),
hashed AS (
  SELECT doc_id, b, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM grams
),
train AS (SELECT doc_id AS bench_id, gh FROM hashed WHERE b < 8),
test_g AS (SELECT doc_id AS corpus_id, gh FROM hashed WHERE b >= 8),
pairs AS (
  SELECT corpus_id, bench_id, count(*) AS n_shared
  FROM test_g JOIN train USING (gh)
  GROUP BY 1, 2
),
per_doc AS (
  SELECT corpus_id, count(*) AS n_partners, sum(n_shared) AS shared
  FROM pairs GROUP BY 1
),
test_docs AS (SELECT doc_id, lang FROM toks WHERE b >= 8)
SELECT d.lang,
       count(*) AS n_test,
       count(p.corpus_id) AS n_contaminated,
       floor(count(p.corpus_id) * 10000 / count(*)) / 10000
         AS contamination_rate,
       CAST(coalesce(sum(p.shared), 0) AS BIGINT) AS shared_grams
FROM test_docs d LEFT JOIN per_doc p ON d.doc_id = p.corpus_id
GROUP BY d.lang
ORDER BY d.lang
"""


# ---------------------------------------------------------------------------
# decontam_gram_index_replay — cross-run decontamination via a
# PERSISTED benchmark gram index (VERDICT r12 next #7): the fixed-eval-
# suite path builds the benchmark's distinct-gram-hash table ONCE
# (operators/decontam_index.py), appends only the previously-unseen
# grams when a new eval set ships (anti-join, linear in the NEW set,
# never a rebuild), and gates each corpus run with one equi-join
# against the small parquet index — killing the per-query benchmark
# re-tokenization the batch operators pay. Replayed here as two index
# generations (holdout bucket 8 builds, bucket 9 appends) gating the
# train split; output folds to per-language contamination stats with
# the two generations' committed gram counts riding along, so the
# value hash pins BOTH the incremental-append arithmetic and the gate.
# Scale: the index is eval-suite-sized (MBs at 1e6 benchmark docs) —
# the gate join's build side is tiny and AQE broadcasts it from REAL
# size stats; no forced hint anywhere (the r12/r13 lesson). The
# corpus side tokenizes ONCE (the gram explode feeding the gate
# join + id-keyed count); the verdict spine and the per-lang rollup
# add two more column-pruned (doc_id[, lang]) scans of the train
# split — metadata-width reads, no re-tokenization.
# ---------------------------------------------------------------------------


def decontam_gram_index_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.decontam_index import (
        append_gram_index,
        build_gram_index,
        gate_against_index,
        read_gram_index,
        token_hash60,
    )
    from etl_ml_pipeline_spark.queries.similarity_q import (
        _run_scoped_index_dir,
    )

    docs = t(spark, sf_dir, "documents")
    b = token_hash60(F.col("doc_id").cast("string")) % 10
    train = docs.filter(b < 8)
    wave1 = docs.filter(b == 8)
    wave2 = docs.filter(b == 9)
    path = _run_scoped_index_dir("decontam_gram")
    n_base = build_gram_index(wave1, path, n=5)
    n_new = append_gram_index(wave2, path, n=5)
    verdicts = gate_against_index(
        train, read_gram_index(spark, path), n=5, min_shared=1
    )
    j = train.select("doc_id", "lang").join(
        verdicts, F.col("doc_id") == F.col("id")
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
            F.sum("n_shared").cast("long").alias("shared_grams"),
        )
        .withColumn("idx_grams_base", F.lit(n_base).cast("long"))
        .withColumn("idx_grams_appended", F.lit(n_new).cast("long"))
        .orderBy("lang")
    )


_DECONTAM_INDEX_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 AS b,
         {_TOKS_DUCK} AS tk
  FROM documents
),
grams AS (
  SELECT doc_id, lang, b,
         unnest(list_distinct(list_transform(range(1, len(tk) - 3),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                 || ' ' || tk[i+4]))) AS gram
  FROM toks
),
hashed AS (
  SELECT doc_id, lang, b,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
  FROM grams
),
idx_base AS (SELECT DISTINCT gh FROM hashed WHERE b = 8),
idx_appended AS (
  SELECT DISTINCT gh FROM hashed WHERE b = 9
  AND gh NOT IN (SELECT gh FROM idx_base)
),
idx AS (SELECT gh FROM idx_base UNION ALL SELECT gh FROM idx_appended),
train_hits AS (
  SELECT h.doc_id, count(*) AS n_shared
  FROM (SELECT DISTINCT doc_id, gh FROM hashed WHERE b < 8) h
  JOIN idx USING (gh)
  GROUP BY h.doc_id
),
train_docs AS (SELECT doc_id, lang FROM toks WHERE b < 8)
SELECT d.lang,
       count(*) AS n_train,
       CAST(count(t.doc_id) AS BIGINT) AS n_contaminated,
       CAST(coalesce(sum(t.n_shared), 0) AS BIGINT) AS shared_grams,
       (SELECT count(*) FROM idx_base) AS idx_grams_base,
       (SELECT count(*) FROM idx_appended) AS idx_grams_appended
FROM train_docs d LEFT JOIN train_hits t ON d.doc_id = t.doc_id
GROUP BY d.lang
ORDER BY d.lang
"""


# ---------------------------------------------------------------------------
# quality_scorer_agreement — inter-scorer reliability audit: per
# language, the 2x2 confusion between the engine's gate heuristic
# (quality_score >= 0.4 — the decision every governance chain makes)
# and the independent chars-per-token fluency label (3..12 non-space
# chars per token — quality_calibration_bins' ground-ish truth), with
# observed agreement and Cohen's kappa. Kappa is the number that says
# whether the two scorers agree beyond what their base rates force —
# a kappa collapse in one language is the canonical signal that the
# gate heuristic stopped measuring quality there (e.g. tokenization
# mismatch). All confusion counts are exact integers; po/pe/kappa are
# ratios of those integers with identical double op order both
# engines, floored to the 1e-4 grid.
# Scale: one map-side pass (two boolean labels fused into the scan) +
# one groupBy(lang); output is |langs| rows at any corpus size.
# ---------------------------------------------------------------------------


def quality_scorer_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import (
        quality_score,
        token_count,
    )

    docs = t(spark, sf_dir, "documents")
    n_tok = token_count(F.col("text"))
    n_nonspace = F.length(F.regexp_replace("text", r"\s", ""))
    labeled = docs.filter(n_tok > 0).select(
        "lang",
        (quality_score(F.col("text")) >= 0.4).cast("long").alias("a"),
        (
            (n_nonspace >= 3 * n_tok) & (n_nonspace <= 12 * n_tok)
        ).cast("long").alias("b"),
    )
    g = labeled.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (F.col("n") * F.col("n"))
    kappa = F.when(pe == 1.0, F.lit(1.0)).otherwise((po - pe) / (1 - pe))
    return g.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("n11").cast("long").alias("n_both"),
        F.col("n10").cast("long").alias("n_gate_only"),
        F.col("n01").cast("long").alias("n_label_only"),
        F.col("n00").cast("long").alias("n_neither"),
        (F.floor(po * 10000) / 10000).alias("agreement"),
        (F.floor(kappa * 10000) / 10000).alias("kappa"),
    ).orderBy("lang")


_SCORER_AGREEMENT_SQL = f"""
WITH feats AS (
  SELECT lang,
         len({_TOKS_DUCK}) AS n_tok,
         len(list_distinct({_TOKS_DUCK})) AS n_uniq,
         len(list_filter({_TOKS_DUCK}, tk -> tk IN ({_STOP_SQL_LIST})))
           AS n_stop,
         len(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
  FROM documents
),
labeled AS (
  SELECT lang,
         CASE WHEN (CASE WHEN n_tok >= 10 AND n_tok <= 1000
                         THEN 0.4 ELSE 0.0 END
                    + least(CAST(n_uniq AS DOUBLE) / n_tok, 0.5) * 0.6
                    + CASE WHEN CAST(n_stop AS DOUBLE) / n_tok
                                BETWEEN 0.01 AND 0.5
                           THEN 0.2 ELSE 0.0 END) >= 0.4
              THEN 1 ELSE 0 END AS a,
         CASE WHEN n_nonspace >= 3 * n_tok AND n_nonspace <= 12 * n_tok
              THEN 1 ELSE 0 END AS b
  FROM feats WHERE n_tok > 0
),
g AS (
  SELECT lang,
         count(*) AS n,
         sum(a * b) AS n11,
         sum(a * (1 - b)) AS n10,
         sum((1 - a) * b) AS n01,
         sum((1 - a) * (1 - b)) AS n00
  FROM labeled GROUP BY 1
)
SELECT lang,
       CAST(n AS BIGINT) AS n,
       CAST(n11 AS BIGINT) AS n_both,
       CAST(n10 AS BIGINT) AS n_gate_only,
       CAST(n01 AS BIGINT) AS n_label_only,
       CAST(n00 AS BIGINT) AS n_neither,
       floor((n11 + n00) / n * 10000) / 10000 AS agreement,
       CASE WHEN ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                 / (n * n) = 1.0
            THEN 1.0
            ELSE floor(((n11 + n00) / n
                        - ((n11 + n10) * (n11 + n01)
                           + (n01 + n00) * (n10 + n00)) / (n * n))
                       / (1 - ((n11 + n10) * (n11 + n01)
                               + (n01 + n00) * (n10 + n00)) / (n * n))
                       * 10000) / 10000
       END AS kappa
FROM g
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# text_vocab_growth_curve — Heaps'-law observability: vocabulary size
# as the corpus grows through 10 deterministic hash-bucket slices (the
# curve tokenizer/corpus planning reads before committing a vocab
# budget; a flattening curve says more data stops buying new types).
# One-pass distributed shape: each distinct token contributes its
# FIRST bucket (min over the docs containing it), new-type counts per
# bucket cumulate into the vocab curve, token totals cumulate into the
# x-axis — no per-prefix re-scan of the corpus (the naive form is 10
# passes).
# Scale: one token-scale shuffle (token -> min bucket) + a 10-row
# window. Exact integers everywhere.
# ---------------------------------------------------------------------------


def text_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from etl_ml_pipeline_spark.operators.text import token_hash60, tokens

    docs = t(spark, sf_dir, "documents")
    b = (token_hash60(F.col("doc_id").cast("string")) % 10).alias("bucket")
    toks = docs.select(b, F.explode(tokens(F.col("text"))).alias("tok"))
    first_seen = toks.groupBy("tok").agg(F.min("bucket").alias("bucket"))
    new_types = first_seen.groupBy("bucket").agg(
        F.count("*").alias("new_types")
    )
    tok_counts = toks.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        tok_counts.join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
            "n_tokens",
        )
        .withColumn("vocab_size", F.sum("new_types").over(w))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select("bucket", "new_types", "vocab_size", "cum_tokens")
        .orderBy("bucket")
    )


_VOCAB_GROWTH_SQL = f"""
WITH toks AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10
           AS bucket,
         unnest({_TOKS_DUCK}) AS tok
  FROM documents
),
first_seen AS (
  SELECT tok, min(bucket) AS bucket FROM toks GROUP BY 1
),
new_types AS (
  SELECT bucket, count(*) AS new_types FROM first_seen GROUP BY 1
),
tok_counts AS (
  SELECT bucket, count(*) AS n_tokens FROM toks GROUP BY 1
)
SELECT t.bucket,
       CAST(coalesce(n.new_types, 0) AS BIGINT) AS new_types,
       CAST(sum(coalesce(n.new_types, 0)) OVER (ORDER BY t.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size,
       CAST(sum(t.n_tokens) OVER (ORDER BY t.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens
FROM tok_counts t LEFT JOIN new_types n USING (bucket)
ORDER BY t.bucket
"""


# ---------------------------------------------------------------------------
# quality_calibration_bins — calibration audit for the model-based
# quality filter: bucket the classifier score into deciles and compare
# against an independent heuristic label (3 <= non-space chars per
# token <= 12 — a crude "natural prose" check), per bin. The plot
# every score-gated corpus needs before picking min_score: if the
# rate isn't monotone in the bin, the filter threshold is noise.
# Floats: the score is the 1e-6-floored sigmoid (the pinned
# text_model_quality_score grid), the decile is floor(score*10) of
# that stable grid, the rate is exact-integer arithmetic, and
# min/max of identical double sets are order-independent — no
# accumulation-order hazard anywhere.
# Scale: one token explode + broadcast weight join + two small
# groupBys; the label is a map-side length computation.
# ---------------------------------------------------------------------------


def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.text import hashed_linear_score

    docs = t(spark, sf_dir, "documents")
    weights = spark.range(_QM_BUCKETS).select(
        F.col("id").alias("bucket"),
        (F.col("id") % 97 - 48).cast("double").alias("weight"),
    )
    scored = hashed_linear_score(docs, weights, n_buckets=_QM_BUCKETS)
    s6 = F.floor(F.col("score") * 1e6) / 1e6
    labeled = docs.select(
        "doc_id",
        F.length(F.regexp_replace("text", r"\s", "")).alias("n_nonspace"),
    )
    j = scored.join(labeled, "doc_id").select(
        F.floor(s6 * 10).cast("int").alias("bin"),
        s6.alias("s6"),
        (
            (F.col("n_nonspace") >= 3 * F.col("n_tok"))
            & (F.col("n_nonspace") <= 12 * F.col("n_tok"))
        ).cast("long").alias("good"),
    )
    return (
        j.groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("good").alias("n_good"),
            (F.floor(F.sum("good") * 10000 / F.count("*")) / 10000).alias(
                "good_rate"
            ),
            F.min("s6").alias("min_score"),
            F.max("s6").alias("max_score"),
        )
        .orderBy("bin")
    )


_CALIBRATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS tok FROM documents
),
bucketed AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {_QM_BUCKETS} AS bucket
  FROM toks
),
weights AS (
  SELECT range AS bucket, CAST(range % 97 - 48 AS DOUBLE) AS weight
  FROM range({_QM_BUCKETS})
),
scored AS (
  SELECT b.doc_id,
         count(*) AS n_tok,
         floor(1.0 / (1.0 + exp(-(sum(coalesce(w.weight, 0.0)) / count(*))))
               * 1e6) / 1e6 AS s6
  FROM bucketed b LEFT JOIN weights w USING (bucket)
  GROUP BY 1
),
labeled AS (
  SELECT doc_id, len(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
  FROM documents
),
j AS (
  SELECT CAST(floor(s.s6 * 10) AS INT) AS bin, s.s6,
         CASE WHEN l.n_nonspace >= 3 * s.n_tok
                   AND l.n_nonspace <= 12 * s.n_tok
              THEN 1 ELSE 0 END AS good
  FROM scored s JOIN labeled l USING (doc_id)
)
SELECT bin,
       count(*) AS n_docs,
       CAST(sum(good) AS BIGINT) AS n_good,
       floor(sum(good) * 10000 / count(*)) / 10000 AS good_rate,
       min(s6) AS min_score,
       max(s6) AS max_score
FROM j
GROUP BY bin
ORDER BY bin
"""


QUERIES = {
    "decontam_gram_index_replay": decontam_gram_index_replay,
    "quality_scorer_agreement": quality_scorer_agreement,
    "text_vocab_growth_curve": text_vocab_growth_curve,
    "split_decontamination_stats": split_decontamination_stats,
    "quality_calibration_bins": quality_calibration_bins,
    "corpus_stats_battery": corpus_stats_battery,
    "text_vocab_coverage": text_vocab_coverage,
    "text_gopher_rules": text_gopher_rules,
    "phrase_search_documents": phrase_search_documents,
    "text_token_stats": text_token_stats,
    "hybrid_search_rrf": hybrid_search_rrf,
    "text_bpe_train_merges": text_bpe_train_merges,
    "text_bpe_encode_stats": text_bpe_encode_stats,
    "text_bpe_roundtrip": text_bpe_roundtrip,
    "text_novelty_trigram": text_novelty_trigram,
    "sketch_heavy_hitters_terms": sketch_heavy_hitters_terms,
    "sketch_cms_frequency": sketch_cms_frequency,
    "text_novelty_surprise": text_novelty_surprise,
    "chunk_documents_sliding": chunk_documents_sliding,
    "corpus_clean_funnel": corpus_clean_funnel,
    "text_model_quality_score": text_model_quality_score,
    "text_repetition_stats": text_repetition_stats,
    "text_pii_scrub": text_pii_scrub,
    "text_contamination": text_contamination,
    "text_vocab_topk": text_vocab_topk,
    "text_bm25_top_terms": text_bm25_top_terms,
    "text_bpe_token_stats": text_bpe_token_stats,
    "text_quality_docs": text_quality_docs,
    "text_langid_confusion": text_langid_confusion,
    "text_fingerprint_hist": text_fingerprint_hist,
    "text_winnow_sketch": text_winnow_sketch,
}

ORACLES = {
    "decontam_gram_index_replay": _DECONTAM_INDEX_SQL,
    "quality_scorer_agreement": _SCORER_AGREEMENT_SQL,
    "text_vocab_growth_curve": _VOCAB_GROWTH_SQL,
    "split_decontamination_stats": _DECONTAM_SQL,
    "quality_calibration_bins": _CALIBRATION_SQL,
    "phrase_search_documents": _PHRASE_SQL,
    "corpus_stats_battery": _CORPUS_STATS_SQL,
    "text_vocab_coverage": _VOCAB_COVERAGE_SQL,
    "text_gopher_rules": _gopher_oracle(),
    "hybrid_search_rrf": _HYBRID_SQL,
    "text_bpe_train_merges": _bpe_oracle(),
    "text_bpe_encode_stats": _bpe_encode_oracle(),
    "text_bpe_roundtrip": _bpe_roundtrip_oracle(),
    "text_token_stats": _TOKEN_STATS_SQL,
    "text_novelty_trigram": _TRIGRAM_NOVELTY_SQL,
    "sketch_heavy_hitters_terms": _MG_SQL,
    "sketch_cms_frequency": _CMS_SQL,
    "text_novelty_surprise": _NOVELTY_SQL,
    "chunk_documents_sliding": _CHUNK_SQL,
    "corpus_clean_funnel": _funnel_oracle(),
    "text_model_quality_score": _QM_SQL,
    "text_repetition_stats": _REPETITION_SQL,
    "text_pii_scrub": _PII_SQL,
    "text_contamination": _CONTAMINATION_SQL,
    "text_vocab_topk": _VOCAB_SQL,
    "text_bm25_top_terms": _BM25_SQL,
    "text_bpe_token_stats": _BPE_STATS_SQL,
    "text_quality_docs": _QUALITY_SQL,
    "text_langid_confusion": _LANGID_SQL,
    "text_fingerprint_hist": _FINGERPRINT_SQL,
    "text_winnow_sketch": _WINNOW_SQL,
}
