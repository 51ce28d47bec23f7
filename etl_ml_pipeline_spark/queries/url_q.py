"""URL canonicalization + host-level dedup catalog queries.

The first normalization pass of a CommonCrawl-style corpus build: every
crawler emits the same page under many spellings (scheme case, www,
default ports, param order, tracking params, trailing slashes,
fragments), and host/domain rollups drive crawl budgeting and
per-domain caps. The fixture's ``documents.source`` is not a URL, so —
exactly like the multimodal queries synthesize media bytes — each query
derives a DETERMINISTIC messy URL from (doc_id, source) inside the
plan, with the DuckDB oracle generating byte-identical inputs; what is
under test is ``operators/url.py``'s canonicalization algebra, which is
engine-independent column code.

Scale: URL synthesis + canonicalization are pure map-side projections
over whole-stage-codegen'd built-ins (no Python, no join); each query's
only shuffle is its own final groupBy on (page_key | domain | source) —
at 100 TB that is one map-side-combined aggregation, the minimum any
rollup pays. The page-key space saturates at lcm-of-moduli per source,
so result sizes stay bounded while counts keep growing with SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators import url as U
from etl_ml_pipeline_spark.operators.psl import SUFFIX_SQL_LIST
from etl_ml_pipeline_spark.queries.tables import t

# ---------------------------------------------------------------------------
# Deterministic messy-URL generator (Spark + byte-identical DuckDB CTE).
# Variant axes: scheme case+choice (d%2), www prefix (d%3), host case,
# TLD incl. a co.uk ccTLD (d%4), scheme-default port (d%5), trailing
# slash (d%6), param order (d%2), tracking params (d%3), fragment (d%4).
# Canonicalization collapses everything but (source, d%4, d%7), so each
# page key has ~N/(20*28) true variants at any SF.
# ---------------------------------------------------------------------------


def _with_urls(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    s = lambda c: c.cast("string")
    scheme = F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = F.concat(
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example"),
        s(d % 4),
        F.when(d % 4 == 3, F.lit(".CO.UK")).otherwise(F.lit(".COM")),
    )
    port = F.when(
        d % 5 == 0,
        F.when(d % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/docs/"),
        s(d % 7),
        F.when(d % 6 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.concat(
        F.when(d % 2 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("?a=1&b=2")),
        F.when(
            d % 3 == 1, F.concat(F.lit("&utm_source=x&gclid="), s(d % 5))
        ).otherwise(F.lit("")),
    )
    frag = F.when(d % 4 == 2, F.concat(F.lit("#sec"), s(d % 3))).otherwise(
        F.lit("")
    )
    return docs.withColumn(
        "url", F.concat(scheme, F.lit("://"), host, port, path, query, frag)
    )


_URLGEN_SQL = """
  SELECT doc_id, source,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || source || '.Example' || CAST(doc_id % 4 AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 3 THEN '.CO.UK' ELSE '.COM' END)
         || (CASE WHEN doc_id % 5 = 0
                  THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
                  ELSE '' END)
         || '/docs/' || CAST(doc_id % 7 AS VARCHAR)
         || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '?a=1&b=2' END)
         || (CASE WHEN doc_id % 3 = 1
                  THEN '&utm_source=x&gclid=' || CAST(doc_id % 5 AS VARCHAR)
                  ELSE '' END)
         || (CASE WHEN doc_id % 4 = 2
                  THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
                  ELSE '' END) AS url
  FROM documents
"""

# DuckDB mirror of operators/url.py's canonical algebra (same regexes;
# RE2 and Java regex agree on every construct used — no lookarounds).
_URL_RE_SQL = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"

_CANON_SQL = f"""
  SELECT doc_id, source, scheme,
         host || port_part AS auth,
         host || key_port_part || path || q_part AS page_key
  FROM (
    SELECT doc_id, source, scheme, host,
           CASE WHEN port <> ''
                 AND NOT ((scheme = 'http' AND port = '80')
                          OR (scheme = 'https' AND port = '443'))
                THEN ':' || port ELSE '' END AS port_part,
           -- scheme-insensitive page key: BOTH default ports dropped
           CASE WHEN port <> '' AND port NOT IN ('80', '443')
                THEN ':' || port ELSE '' END AS key_port_part,
           CASE WHEN pstrip = '' THEN '/' ELSE pstrip END AS path,
           CASE WHEN qc <> '' THEN '?' || qc ELSE '' END AS q_part
    FROM (
      SELECT doc_id, source, scheme,
             regexp_replace(regexp_replace(regexp_replace(auth_raw,
                 ':[0-9]+$', ''), '^www\\.', ''), '\\.$', '') AS host,
             regexp_extract(auth_raw, ':([0-9]+)$', 1) AS port,
             regexp_replace(
               CASE WHEN pc = '' THEN '/' ELSE pc END, '/+$', '') AS pstrip,
             array_to_string(list_sort(list_filter(string_split(q_raw, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                     '^(utm_[^=]*|gclid|fbclid|ref)='))), '&') AS qc
      FROM (
        SELECT doc_id, source,
               lower(regexp_extract(url, '{_URL_RE_SQL}', 1)) AS scheme,
               lower(regexp_extract(url, '{_URL_RE_SQL}', 2)) AS auth_raw,
               regexp_replace(regexp_extract(url, '{_URL_RE_SQL}', 3),
                              '/{{2,}}', '/', 'g') AS pc,
               regexp_replace(regexp_extract(url, '{_URL_RE_SQL}', 4),
                              '^\\?', '') AS q_raw
        FROM urls
      )
    )
  )
"""


# ---------------------------------------------------------------------------
# url_canonical_dedup — page-level dedup on the scheme-insensitive
# canonical key: variant count, distinct schemes collapsed, keep-first
# doc. The exact-dedup pattern of dedup_exact_documents applied to the
# crawl identity instead of the content fingerprint.
# ---------------------------------------------------------------------------


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    u = _with_urls(docs)
    c = u.select(
        "doc_id",
        U.url_scheme(F.col("url")).alias("scheme"),
        U.url_dedup_key(F.col("url")).alias("page_key"),
    )
    return (
        c.groupBy("page_key")
        .agg(
            F.count("*").alias("n_variants"),
            F.countDistinct("scheme").alias("n_schemes"),
            F.min("doc_id").alias("keep_doc"),
        )
        .orderBy("page_key")
    )


_CANON_DEDUP_SQL = f"""
WITH urls AS ({_URLGEN_SQL}),
canon AS ({_CANON_SQL})
SELECT page_key,
       count(*) AS n_variants,
       count(DISTINCT scheme) AS n_schemes,
       min(doc_id) AS keep_doc
FROM canon
GROUP BY page_key
ORDER BY page_key
"""


# ---------------------------------------------------------------------------
# url_host_dedup_stats — registered-domain rollup: docs, distinct hosts,
# distinct canonical pages, and the duplication ratio per pay-level
# domain (the crawl-budget / per-domain-cap table). Exercises the
# ccTLD second-level branch (example3.co.uk keeps three labels).
# ---------------------------------------------------------------------------


def url_host_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    u = _with_urls(docs)
    host = U.url_host(F.col("url"))
    c = u.select(
        "doc_id",
        host.alias("host"),
        U.registered_domain(host).alias("domain"),
        U.url_dedup_key(F.col("url")).alias("page_key"),
    )
    return (
        c.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.countDistinct("page_key").alias("n_pages"),
            (
                F.floor(F.count("*") / F.countDistinct("page_key") * 10000)
                / 10000
            ).alias("dup_per_page"),
        )
        .orderBy("domain")
    )


_HOST_STATS_SQL = f"""
WITH urls AS ({_URLGEN_SQL}),
parts AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(
             lower(regexp_extract(url, '{_URL_RE_SQL}', 2)),
             ':[0-9]+$', ''), '^www\\.', ''), '\\.$', '') AS host,
         url
  FROM urls
),
canon AS ({_CANON_SQL}),
dom AS (
  SELECT p.doc_id, p.host, c.page_key,
         CASE WHEN regexp_extract(p.host, '([^.]+\\.[^.]+)$', 1)
                   IN ({SUFFIX_SQL_LIST})
               AND regexp_extract(p.host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) <> ''
              THEN regexp_extract(p.host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
              ELSE regexp_extract(p.host, '([^.]+\\.[^.]+)$', 1) END AS domain
  FROM parts p JOIN canon c USING (doc_id)
)
SELECT domain,
       count(*) AS n_docs,
       count(DISTINCT host) AS n_hosts,
       count(DISTINCT page_key) AS n_pages,
       floor(count(*) / count(DISTINCT page_key) * 10000) / 10000
         AS dup_per_page
FROM dom
GROUP BY domain
ORDER BY domain
"""


# ---------------------------------------------------------------------------
# url_tracking_scrub_stats — per-source audit of the query-string scrub:
# how many URLs carried tracking params, and how many params the
# canonicalizer removed (empties + utm_*/gclid/fbclid/ref). The
# validation table a crawl-cleaning run reports.
# ---------------------------------------------------------------------------


def url_tracking_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    u = _with_urls(docs)
    url = F.col("url")
    raw_q = F.regexp_replace(
        F.regexp_extract(url, U._URL_RE, 4), r"^\?", ""
    )
    raw_params = F.size(F.filter(F.split(raw_q, "&"), lambda p: p != ""))
    qc = U.url_query_canon(url)
    kept = F.when(qc == "", F.lit(0)).otherwise(F.size(F.split(qc, "&")))
    tracked = url.rlike(r"[?&](utm_[^=]*|gclid|fbclid|ref)=").cast("int")
    return (
        u.select(
            "source",
            tracked.alias("tracked"),
            (raw_params - kept).alias("removed"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tracked").alias("n_tracked"),
            F.sum("removed").alias("params_removed"),
        )
        .orderBy("source")
    )


_TRACKING_SQL = f"""
WITH urls AS ({_URLGEN_SQL}),
per AS (
  SELECT source,
         CASE WHEN regexp_matches(url, '[?&](utm_[^=]*|gclid|fbclid|ref)=')
              THEN 1 ELSE 0 END AS tracked,
         len(list_filter(string_split(q_raw, '&'), p -> p <> ''))
           - len(list_filter(string_split(q_raw, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                     '^(utm_[^=]*|gclid|fbclid|ref)='))) AS removed
  FROM (
    SELECT source, url,
           regexp_replace(regexp_extract(url, '{_URL_RE_SQL}', 4),
                          '^\\?', '') AS q_raw
    FROM urls
  )
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(tracked) AS BIGINT) AS n_tracked,
       CAST(sum(removed) AS BIGINT) AS params_removed
FROM per
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# url_blocklist_stats — the URL-filtering stage (round 11): a deny-list
# of registered domains applied by the `url_blocklist` registry
# transform, reported per source as total/kept/blocked (the audit table
# a crawl-cleaning run publishes). The synthesized hosts roll up to
# four registered domains (example{0,1,2}.com + example3.co.uk — the
# ccTLD one exercises the PSL branch); the deny list blocks two of
# them, so every source shows a ~half split. Exercises the TRANSFORM
# itself (not a re-derivation), joined back against per-source totals.
# Scale: the domain check is a map-side InSet beside the
# canonicalization algebra — no join, no shuffle beyond the rollup's
# own groupBy; production-sized blocklists swap to a broadcast
# semi/anti join on the same derived column.
# ---------------------------------------------------------------------------

_BLOCKED_DOMAINS = ("example1.com", "example3.co.uk")


def url_blocklist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.url import UrlBlocklist

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    u = _with_urls(docs)
    kept = UrlBlocklist(
        {"url_col": "url", "domains": list(_BLOCKED_DOMAINS), "mode": "deny"}
    ).transform(u)
    totals = u.groupBy("source").agg(F.count("*").alias("n_total"))
    kept_counts = kept.groupBy("source").agg(F.count("*").alias("n_kept"))
    return (
        totals.join(kept_counts, "source", "left")
        .select(
            "source",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_blocked"
            ),
        )
        .orderBy("source")
    )


_BLOCKLIST_SQL_SET = ", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)

_BLOCKLIST_SQL = f"""
WITH urls AS ({_URLGEN_SQL}),
d AS (
  SELECT source,
         CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
                   IN ({{suffixes}})
               AND regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) <> ''
              THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
              ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS domain
  FROM (
    SELECT source,
           regexp_replace(regexp_replace(regexp_replace(
               lower(regexp_extract(url, '{_URL_RE_SQL}', 2)),
               ':[0-9]+$', ''), '^www\\.', ''), '\\.$', '') AS host
    FROM urls
  )
)
SELECT source,
       count(*) AS n_total,
       CAST(sum(CASE WHEN domain IN ({_BLOCKLIST_SQL_SET}) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN domain IN ({_BLOCKLIST_SQL_SET}) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blocked
FROM d
GROUP BY source
ORDER BY source
""".replace("{suffixes}", SUFFIX_SQL_LIST)


# ---------------------------------------------------------------------------
# crawl_frontier_schedule — per-host politeness scheduling: the crawl
# frontier assigns each host's deduped canonical pages to fetch slots
# spaced by that host's crawl delay (slot k starts at k*delay), so the
# per-host schedule summary is closed-form from the page count: makespan
# = (n_pages-1)*delay, and a 60 s dispatch horizon admits
# floor(60/delay)+1 fetches. Delay is derived deterministically from the
# host string (1 + len % 5 seconds) the way a real frontier buckets
# per-host rate limits when robots.txt offers none.
# Scale: URL synthesis + canonicalization are map-side projections; the
# only shuffle is ONE groupBy(host) with a partial-aggregated distinct
# page count — output is |hosts| rows at any corpus size, and the slot
# assignment never materializes per-page rows (the closed form replaces
# the row_number a naive scheduler would shuffle for).
# ---------------------------------------------------------------------------


def crawl_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    u = _with_urls(docs)
    c = u.select(
        U.url_host(F.col("url")).alias("host"),
        U.url_dedup_key(F.col("url")).alias("page_key"),
    )
    per = c.groupBy("host").agg(
        F.countDistinct("page_key").cast("long").alias("n_pages")
    )
    delay = (F.length("host") % 5 + 1).cast("long")
    within = F.least(
        F.col("n_pages"), (F.floor(F.lit(60) / delay) + 1).cast("long")
    )
    return (
        per.select(
            "host",
            "n_pages",
            delay.alias("delay_s"),
            ((F.col("n_pages") - 1) * delay).alias("makespan_s"),
            within.alias("n_within_60s"),
            (F.col("n_pages") - within).alias("backlog"),
        )
        .orderBy("host")
    )


_FRONTIER_SQL = f"""
WITH urls AS ({_URLGEN_SQL}),
parts AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(
             lower(regexp_extract(url, '{_URL_RE_SQL}', 2)),
             ':[0-9]+$', ''), '^www\\.', ''), '\\.$', '') AS host
  FROM urls
),
canon AS ({_CANON_SQL}),
per AS (
  SELECT p.host, CAST(count(DISTINCT c.page_key) AS BIGINT) AS n_pages
  FROM parts p JOIN canon c USING (doc_id)
  GROUP BY 1
)
SELECT host, n_pages,
       CAST(length(host) % 5 + 1 AS BIGINT) AS delay_s,
       CAST((n_pages - 1) * (length(host) % 5 + 1) AS BIGINT) AS makespan_s,
       CAST(least(n_pages, CAST(floor(60 / (length(host) % 5 + 1)) AS BIGINT)
                           + 1) AS BIGINT) AS n_within_60s,
       CAST(n_pages
            - least(n_pages, CAST(floor(60 / (length(host) % 5 + 1)) AS BIGINT)
                             + 1) AS BIGINT) AS backlog
FROM per
ORDER BY host
"""


# ---------------------------------------------------------------------------
# crawl_ingest_e2e — the image analog of training_data_prep_decontam_e2e
# (VERDICT r14 ask #5): one crawl-ingest cycle under a realistic
# topology, chaining the family's audited pieces end-to-end.
#   frontier slice (doc_id 60..119, messy synthetic URLs)
#     -> canonical URL dedup (keep-first fetch per page_key)
#     -> pHash gate of the survivors against the PERSISTED image index
#        built from the previously-ingested corpus (doc_id < 60, gen 0;
#        the gate reads the index with a gen=0 filter, so the scan is
#        partition-pruned — plan-pinned)
#     -> append the clean survivors as gen 1.
# Output: per-host ingest funnel (fetched -> canonical pages -> image
# dups -> ingested) + the index lifecycle counts, all hash-checked (the
# oracle replays URL canonicalization byte-identically and the image
# verdicts from the analytic dHash bit model, probe x index all-pairs
# at oracle scale only).
# Scale: URL work is map-side algebra + one page_key groupBy; the gate
# is the banded (band_idx, band_value) equi-join with pigeonhole-exact
# Hamming verification (never all-pairs); the append anti-join is
# linear in the clean batch. The full-vector/image bytes never move —
# only 64-bit hashes.
# ---------------------------------------------------------------------------

_CRAWL_IX_BASE = 60    # previously-ingested images: gen 0
_CRAWL_IX_CLASSES = 16  # the archive has seen image classes 0..15 only
_CRAWL_DOCS = 120      # frontier slice end (the analytic image model)
_CRAWL_RADIUS = 1
# Re-crawl fold: fetch d requests the page of doc 60 + (d-60) % 28, so
# the 60-fetch batch covers 28 distinct pages and the URL-dedup stage
# collapses real re-fetches (the page-key moduli — source d%10, host
# d%4, path d%7 — lcm to 140, so WITHOUT the fold a 60-doc slice can
# never produce a canonical collision and the funnel's dedup leg would
# be vacuously pass-through).
_CRAWL_FOLD = 28


def crawl_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.phash_index import (
        append_phash_index,
        build_phash_index,
        gate_against_phash_index,
        read_phash_index,
    )
    from etl_ml_pipeline_spark.queries.similarity_q import (
        _phash_gen_hash,
        _run_scoped_index_dir,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    # previously-ingested corpus -> persisted index, gen 0. Only image
    # classes 0..15 have been archived, so the crawl batch carries BOTH
    # near-dups of archived content (classes < 16 -> gated out) AND
    # genuinely new images (classes >= 16 -> ingested) — the funnel
    # exercises every branch.
    base = docs.filter(
        (F.col("doc_id") < _CRAWL_IX_BASE)
        & (F.col("doc_id") % 24 < _CRAWL_IX_CLASSES)
    ).select("doc_id")
    base_hashed = base.mapInPandas(
        _phash_gen_hash, schema="doc_id: long, dhash: string"
    )
    path = _run_scoped_index_dir("crawl_ix")
    n_base = build_phash_index(base_hashed, path)

    # crawl batch: each fetch requests its folded page's URL (re-crawl
    # duplicates), messy spelling -> canonical keep-first per page
    batch = docs.filter(
        (F.col("doc_id") >= _CRAWL_IX_BASE) & (F.col("doc_id") < _CRAWL_DOCS)
    )
    folded = batch.select(
        F.col("doc_id").alias("fetch_doc"),
        (
            F.lit(_CRAWL_IX_BASE)
            + (F.col("doc_id") - _CRAWL_IX_BASE) % _CRAWL_FOLD
        ).alias("url_doc"),
    )
    src = docs.select(F.col("doc_id").alias("url_doc"), "source")
    ub = folded.join(src, "url_doc").select(
        "fetch_doc", F.col("url_doc").alias("doc_id"), "source"
    )
    c = _with_urls(ub).select(
        F.col("fetch_doc").alias("doc_id"),
        U.url_host(F.col("url")).alias("host"),
        U.url_dedup_key(F.col("url")).alias("page_key"),
    )
    fetched = c.groupBy("host").agg(
        F.count("*").cast("long").alias("n_fetched")
    )
    pages = c.groupBy("host", "page_key").agg(
        F.min("doc_id").alias("keep_doc")
    )
    hashed = (
        pages.select(F.col("keep_doc").alias("doc_id"))
        .mapInPandas(_phash_gen_hash, schema="doc_id: long, dhash: string")
        .localCheckpoint(eager=False)
    )
    # gate BEFORE appending, against gen 0 only (partition-pruned scan)
    verdicts = gate_against_phash_index(
        hashed,
        read_phash_index(spark, path).filter(F.col("gen") == 0),
        radius=_CRAWL_RADIUS,
    ).select(F.col("id").alias("keep_doc"), "duplicate")
    clean_hashed = hashed.join(
        verdicts.filter(~F.col("duplicate")).select(
            F.col("keep_doc").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    n_app = append_phash_index(clean_hashed, path)

    per = (
        pages.join(verdicts, "keep_doc")
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum(F.col("duplicate").cast("long")).alias("n_image_dup"),
            F.sum((~F.col("duplicate")).cast("long")).alias("n_ingested"),
        )
    )
    return (
        fetched.join(per, "host")
        .select(
            "host",
            "n_fetched",
            "n_pages",
            "n_image_dup",
            "n_ingested",
            F.lit(n_base).cast("long").alias("idx_base"),
            F.lit(n_app).cast("long").alias("idx_appended"),
            F.lit(n_base + n_app).cast("long").alias("idx_live"),
        )
        .orderBy("host")
    )


_HOST_RE_SQL = (
    "regexp_replace(regexp_replace(regexp_replace("
    f"lower(regexp_extract(url, '{_URL_RE_SQL}', 2)),"
    " ':[0-9]+$', ''), '^www\\.', ''), '\\.$', '')"
)

_CRAWL_E2E_SQL = f"""
WITH all_urls AS ({_URLGEN_SQL}),
urls AS (
  SELECT b.doc_id, u.source, u.url
  FROM (SELECT doc_id,
               {_CRAWL_IX_BASE} + (doc_id - {_CRAWL_IX_BASE}) % {_CRAWL_FOLD}
                 AS url_doc
        FROM documents
        WHERE doc_id >= {_CRAWL_IX_BASE} AND doc_id < {_CRAWL_DOCS}) b
  JOIN all_urls u ON u.doc_id = b.url_doc
),
canon AS ({_CANON_SQL}),
parts AS (
  SELECT doc_id, {_HOST_RE_SQL} AS host FROM urls
),
fetched AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_fetched
  FROM parts GROUP BY 1
),
pages AS (
  SELECT p.host, c.page_key, min(c.doc_id) AS keep_doc
  FROM canon c JOIN parts p USING (doc_id)
  GROUP BY 1, 2
),
imgdocs AS (
  SELECT doc_id, doc_id % 24 AS k, (doc_id // 24) % 3 AS v
  FROM documents WHERE doc_id < {_CRAWL_DOCS}
),
bits AS (
  SELECT doc_id, p,
         (CASE WHEN ((k*37 + p*11 + ((k+1)*(p+3)) % 13) % 5) = 0
               THEN 1 ELSE 0 END
          + CASE WHEN v >= 1 AND p = (k*3) % 64 THEN 1 ELSE 0 END
          + CASE WHEN v >= 2 AND p = (k*3 + 17) % 64 THEN 1 ELSE 0 END
         ) % 2 AS b
  FROM imgdocs, (SELECT unnest(range(64)) AS p)
),
ham AS (
  SELECT pr.doc_id AS probe_id, ix.doc_id AS ix_id,
         sum(CASE WHEN pr.b <> ix.b THEN 1 ELSE 0 END) AS d
  FROM bits pr
  JOIN bits ix ON pr.p = ix.p AND ix.doc_id < {_CRAWL_IX_BASE}
             AND ix.doc_id % 24 < {_CRAWL_IX_CLASSES}
  WHERE pr.doc_id IN (SELECT keep_doc FROM pages)
  GROUP BY 1, 2
),
dup AS (SELECT DISTINCT probe_id FROM ham WHERE d <= {_CRAWL_RADIUS}),
verd AS (
  SELECT s.host, s.keep_doc, (d.probe_id IS NOT NULL) AS duplicate
  FROM pages s LEFT JOIN dup d ON d.probe_id = s.keep_doc
),
per AS (
  SELECT host,
         CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(CASE WHEN duplicate THEN 1 ELSE 0 END) AS BIGINT)
           AS n_image_dup,
         CAST(sum(CASE WHEN duplicate THEN 0 ELSE 1 END) AS BIGINT)
           AS n_ingested
  FROM verd GROUP BY 1
),
tot AS (
  SELECT
    CAST((SELECT count(*) FROM documents
          WHERE doc_id < {_CRAWL_IX_BASE}
            AND doc_id % 24 < {_CRAWL_IX_CLASSES}) AS BIGINT) AS idx_base,
    CAST((SELECT sum(CASE WHEN duplicate THEN 0 ELSE 1 END) FROM verd)
         AS BIGINT) AS idx_appended
)
SELECT f.host, f.n_fetched, p.n_pages, p.n_image_dup, p.n_ingested,
       t.idx_base, t.idx_appended,
       t.idx_base + t.idx_appended AS idx_live
FROM fetched f
JOIN per p USING (host)
CROSS JOIN tot t
ORDER BY host
"""


QUERIES = {
    "url_canonical_dedup": url_canonical_dedup,
    "crawl_ingest_e2e": crawl_ingest_e2e,
    "crawl_frontier_schedule": crawl_frontier_schedule,
    "url_blocklist_stats": url_blocklist_stats,
    "url_host_dedup_stats": url_host_dedup_stats,
    "url_tracking_scrub_stats": url_tracking_scrub_stats,
}

ORACLES = {
    "url_canonical_dedup": _CANON_DEDUP_SQL,
    "crawl_ingest_e2e": _CRAWL_E2E_SQL,
    "crawl_frontier_schedule": _FRONTIER_SQL,
    "url_blocklist_stats": _BLOCKLIST_SQL,
    "url_host_dedup_stats": _HOST_STATS_SQL,
    "url_tracking_scrub_stats": _TRACKING_SQL,
}
