"""Text-retrieval operators over the ``documents`` table: TF-IDF terms,
BM25 search, fixed-window chunking, and inverted posting lists.

The reference has no retrieval surface (its text path is NL→SQL, reference
``sap_sql_engine.py:365-455``); these are the search-side operators a
training-data pipeline runs next to dedup — score corpora against probe
queries (contamination triage, quality mining), chunk documents for
embedding/packing, and build the inverted index that serves both.

Everything is built-in Spark SQL expressions over the same whitespace
tokenization the dedup/textanalysis ladder uses, so the DuckDB oracles
replicate results bit-for-bit:

- integer statistics (tf, df, dl, n_docs) are exact on both engines;
- doubles derive from those integers through identical expression trees;
- the one cross-row float sum (BM25's per-term total) is quantized to
  BIGINT first (floor(score*1e6)) so the sum is associative and the
  result independent of execution order — the same trick
  ``embedding_outlier`` uses for centroids.

Scale shapes are noted per operator; the common theme: the only full-corpus
shuffle any of them needs is the (token- or doc-)keyed aggregation that
defines the statistic, and BM25 filters the token stream to the query's
terms BEFORE anything shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cachereg import cache_eager
from ..sources.loader import spread, table

TFIDF_TOP_K = 3
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "join", "window")  # probe query over the corpus
CHUNK_SIZE = 64  # tokens per chunk
CHUNK_OVERLAP = 16
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP
POSTINGS_TOP_DOCS = 10
# BM25 quantization: term scores are O(10); floor(s*1e6) keeps the exact
# BIGINT sum under 2^63 to ~10^11 matched terms per doc
BM25_Q = 1_000_000


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) stream — same whitespace tokenization as the dedup
    ladder, spread across cores before the explode (single-file scans
    otherwise run the whole map stage in one task)."""
    return spread(docs).select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )


_O_TOKENS = r"""
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP_K`` terms per doc by ``tf * (ln((1+N)/(1+df)) + 1)``
    (the smoothed-idf variant that never zeroes out corpus-wide terms).

    Scale shape: two aggregations — (doc,token) tf and (token) df — the
    second derived from the first (already token-clustered, so the df
    aggregate is a narrow regroup of one-row-per-doc-token partials, never
    the raw stream). df joins back BROADCAST (a vocabulary is millions of
    rows — megabytes — even at 100 TB corpus scale); the top-k is a
    row_number window over the doc-keyed side. N is a driver-side metadata
    count, embedded as a literal so the idf is a pushable constant
    expression, not a 1-row-aggregate join."""
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()  # parquet row-group metadata probe
    # tf feeds both the scored rows and the df regroup; materialize it once
    # (eager, so the two consumers share one computation instead of each
    # re-running the tokenize+aggregate subtree — at 100 TB, write the tf
    # relation and build df from the written table)
    tf = cache_eager(
        _tokens(docs).groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf") * (
        F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df").cast("double")))
        + F.lit(1.0)
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("token").asc()
        )
    )
    return (
        tf.join(F.broadcast(df), "token")
        .withColumn("score", F.round(score, 4))
        .withColumn("rn", rn)
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .select("doc_id", "token", "tf", "df", "score", F.col("rn").alias("rank"))
    )


def _oracle_tfidf(n_docs_sql: str = "(SELECT count(*) FROM documents)") -> str:
    return f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM ({_O_TOKENS}) t GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         round(tf.tf * (ln((1.0 + {n_docs_sql}) / (1.0 + CAST(df.df AS DOUBLE))) + 1.0), 4) AS score
  FROM tf JOIN df USING (token)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
  FROM scored
)
SELECT doc_id, token, tf, df, score, rank FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


ORACLE_TFIDF = _oracle_tfidf()


# ---------------------------------------------------------------------------
# BM25 search: score every matching document against a fixed probe query


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 of ``BM25_QUERY`` over the corpus.

    Scale shape: the token stream is filtered to the query's terms BEFORE
    any shuffle — the surviving stream is |query| postings lists, a tiny
    fraction of the corpus — so both aggregations (per-term df, per
    (doc,term) tf) run on that residue. Document length dl is a map-side
    ``size(split(...))`` (no explode), and the global (N, avgdl) pair is a
    driver scalar probe folded into the scoring expression as literals.
    Per-term scores quantize to BIGINT before the per-doc sum so the
    cross-row float add is associative (hash-stable on any plan)."""
    docs = table(spark, sf_dir, "documents")
    terms = list(BM25_QUERY)
    toks = _tokens(docs).filter(F.col("token").isin(terms))
    return _bm25_scored(docs, toks)


def _bm25_scored(docs: DataFrame, toks: DataFrame) -> DataFrame:
    """BM25 scoring over an already term-filtered token stream ``toks`` —
    the body shared by the fixed-tuple probe (q_bm25_search) and the
    raw-query-string serving path (q_bm25_raw_query)."""
    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")).alias("sdl"),
    ).first()
    n_docs, sum_dl = int(stats["n"]), int(stats["sdl"])
    avgdl = sum_dl / n_docs  # exact-int division == SQL CAST/CAST division
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df from the tf relation (one row per doc,term): a narrow regroup of
    # the already-aggregated residue, not a second pass over the stream
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    dl = spread(docs).select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("dl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfpart = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
    )
    term_q = F.floor(idf * tfpart * BM25_Q).cast("bigint")
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .withColumn("q", term_q)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.round(F.sum("q") / F.lit(float(BM25_Q)), 6).alias("bm25"),
        )
    )


def _oracle_bm25() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
WITH g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS avgdl
           FROM documents),
toks AS (SELECT doc_id, token FROM ({_O_TOKENS}) t WHERE token IN ({terms})),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS dl
       FROM documents)
SELECT tf.doc_id,
       count(*) AS matched_terms,
       round(CAST(sum(CAST(floor(
           ln(1.0 + (g.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * ({BM25_K1} + 1)) /
              (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / g.avgdl)))
           * {BM25_Q}) AS BIGINT)) AS BIGINT) / CAST({BM25_Q} AS DOUBLE), 6) AS bm25
FROM tf
JOIN df USING (token)
JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN g
GROUP BY tf.doc_id
"""


ORACLE_BM25 = _oracle_bm25()


# ---------------------------------------------------------------------------
# out-of-corpus serving: a RAW query string through the BM25 leg. The fixed
# BM25_QUERY tuple is a pre-tokenized probe compiled into the plan; real
# serving receives a STRING and the engine tokenizes it — same whitespace
# tokenizer as the corpus — then the term filter is a broadcast semi-join
# against the derived term relation instead of a literal IN list.

BM25_RAW_QUERY_STR = "fast hash join beats a slow sort merge"


def q_bm25_raw_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 of a raw query STRING over the corpus — the serving
    path: the query text is tokenized ON-ENGINE (explode(split(...)) on a
    constructed 1-row relation, the corpus tokenizer verbatim, distinct
    to collapse repeated terms), and the corpus token stream is filtered
    by a broadcast LEFT SEMI join against that bounded term relation.
    Scoring is :func:`_bm25_scored`, byte-identical to the gated
    q_bm25_search body.

    Scale shape: same as q_bm25_search — the semi-join's broadcast side
    is |query terms| rows, so the token stream still collapses to the
    query's postings lists before any shuffle."""
    docs = table(spark, sf_dir, "documents")
    qterms = (
        spark.range(1)
        .select(
            F.explode(
                F.split(F.trim(F.lit(BM25_RAW_QUERY_STR)), r"\s+")
            ).alias("token")
        )
        .distinct()
    )
    toks = _tokens(docs).join(F.broadcast(qterms), "token", "left_semi")
    return _bm25_scored(docs, toks)


def _oracle_bm25_raw() -> str:
    return f"""
WITH g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS avgdl
           FROM documents),
qterms AS (SELECT DISTINCT unnest(regexp_split_to_array(trim('{BM25_RAW_QUERY_STR}'), '\\s+')) AS token),
toks AS (SELECT doc_id, token FROM ({_O_TOKENS}) t
         WHERE token IN (SELECT token FROM qterms)),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS dl
       FROM documents)
SELECT tf.doc_id,
       count(*) AS matched_terms,
       round(CAST(sum(CAST(floor(
           ln(1.0 + (g.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * ({BM25_K1} + 1)) /
              (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / g.avgdl)))
           * {BM25_Q}) AS BIGINT)) AS BIGINT) / CAST({BM25_Q} AS DOUBLE), 6) AS bm25
FROM tf
JOIN df USING (token)
JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN g
GROUP BY tf.doc_id
"""


ORACLE_BM25_RAW = _oracle_bm25_raw()


# ---------------------------------------------------------------------------
# fixed-window document chunking (the pre-embedding / pre-packing step)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token windows per document
    (``CHUNK_SIZE``/``CHUNK_OVERLAP``), emitted as (doc_id, chunk_id,
    start_token, n_tokens, md5 fingerprint of the chunk text).

    Scale shape: pure map — sequence + slice + explode inside one codegen
    stage, ZERO shuffles; writes would stream straight to the sink
    partitioned however the scan was. The fingerprint stands in for the
    chunk payload so the result stays narrow here; a real pipeline would
    carry the text column to its embedding/packing stage."""
    docs = table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    starts = F.expr(
        f"sequence(1, greatest(size(toks) - {CHUNK_OVERLAP}, 1), {CHUNK_STRIDE})"
    )
    chunk = F.expr(f"slice(toks, start, {CHUNK_SIZE})")
    return (
        toks.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.col("start").cast("bigint").alias("start_token"),
            chunk.alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "start_token",
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_fp"),
        )
    )


ORACLE_DOC_CHUNKS = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, toks, CAST(start AS BIGINT) AS start
  FROM t, unnest(range(1, greatest(len(toks) - {CHUNK_OVERLAP}, 1) + 1, {CHUNK_STRIDE})) u(start)
)
SELECT doc_id,
       (start - 1) // {CHUNK_STRIDE} AS chunk_id,
       start AS start_token,
       CAST(len(list_slice(toks, start, start + {CHUNK_SIZE} - 1)) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(toks, start, start + {CHUNK_SIZE} - 1), ' ')) AS chunk_fp
FROM s
"""


# ---------------------------------------------------------------------------
# inverted posting lists (the index-build sink)


def q_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token posting statistics: document frequency, total term
    frequency, and the top-``POSTINGS_TOP_DOCS`` documents by (tf desc,
    doc_id asc) as a comma-joined list — the build step of an inverted
    index, capped so hot tokens emit bounded rows.

    Scale shape: ONE full-volume shuffle — the (doc,token) tf aggregation —
    then everything stays token-clustered: the df/total_tf regroup and the
    top-docs window both reuse the same token hash partitioning (no second
    exchange of the raw stream). A boilerplate token's window sort is
    linear in its df and bounded output (the cap); at real scale the same
    df-cap the jaccard path applies would drop stop-tokens entirely."""
    docs = table(spark, sf_dir, "documents")
    # shared by the stats regroup and the top-docs window (see tfidf note)
    tf = cache_eager(
        _tokens(docs).groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    rn = F.row_number().over(
        Window.partitionBy("token").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    )
    top = (
        tf.withColumn("rn", rn)
        .filter(F.col("rn") <= POSTINGS_TOP_DOCS)
        .groupBy("token")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(-tf AS ntf, doc_id))), "
                "s -> CAST(s.doc_id AS STRING)), ',')"
            ).alias("top_docs")
        )
    )
    return stats.join(top, "token").select("token", "df", "total_tf", "top_docs")


ORACLE_POSTING_LISTS = f"""
WITH tf AS (
  SELECT token, doc_id, count(*) AS tf
  FROM ({_O_TOKENS}) t GROUP BY 1, 2
),
stats AS (
  SELECT token, count(*) AS df, sum(tf) AS total_tf FROM tf GROUP BY 1
),
ranked AS (
  SELECT token, doc_id, tf,
         row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id ASC) AS rn
  FROM tf
),
top AS (
  SELECT token,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY tf DESC, doc_id ASC) AS top_docs
  FROM ranked WHERE rn <= {POSTINGS_TOP_DOCS} GROUP BY token
)
SELECT token, df, CAST(total_tf AS BIGINT) AS total_tf, top_docs
FROM stats JOIN top USING (token)
"""


# ---------------------------------------------------------------------------
# count-min sketch frequency estimation — the bounded-memory structure for
# hot-key / heavy-hitter detection when the vocabulary doesn't fit anywhere
# (streaming token floods, skew probes before a join). The sketch is
# CMS_DEPTH x CMS_WIDTH counters regardless of corpus size; estimates are
# one-sided (est >= exact, overestimate ~ 2N/width w.h.p. per row, min over
# depth rows tightens it). Hash family is the repo's md5 bridge with a
# per-row salt, so the DuckDB oracle computes the IDENTICAL sketch and the
# gate verifies estimate AND exact twin bit-for-bit — plus the est >= exact
# invariant, which the query exposes as an output column.
#
# Scale shape: ONE shuffle of (row, bucket) int pairs with map-side combine
# collapsing to <= depth*width rows per map partition; probes then hit the
# d*w-row sketch with a broadcast lookup. No vocabulary-sized state exists
# anywhere in the plan.

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_PROBES = ("spark", "join", "window", "data", "quality")


def _cms_bucket_spark(row: int, token_col: str = "token") -> F.Column:
    return F.expr(
        f"CAST(conv(substr(md5(concat('cms{row}|', {token_col})), 1, 8), 16, 10) AS BIGINT) "
        f"% {CMS_WIDTH}"
    )


def q_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates with the exact counts beside them."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    rows_arr = F.array(
        *[
            F.struct(F.lit(i).alias("r"), _cms_bucket_spark(i).alias("b"))
            for i in range(CMS_DEPTH)
        ]
    )
    sketch = (
        toks.select(F.explode(rows_arr).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], ["term"])
    probe_buckets = probes.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("r"), _cms_bucket_spark(i, "term").alias("b"))
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select("term", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    est = (
        probe_buckets.join(sketch, ["r", "b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )
    exact = (
        toks.join(F.broadcast(probes), toks["token"] == probes["term"])
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, "term", "left")
        .select(
            "term",
            F.coalesce(F.col("exact_count"), F.lit(0)).alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.coalesce(F.col("exact_count"), F.lit(0))).alias(
                "overestimate"
            ),
        )
    )


def _cms_bucket_sql(row: int, token_expr: str = "token") -> str:
    return (
        f"CAST(('0x' || substr(md5('cms{row}|' || {token_expr}), 1, 8)) AS BIGINT) "
        f"% {CMS_WIDTH}"
    )


def _oracle_cms() -> str:
    probe_values = ", ".join(f"('{t}')" for t in CMS_PROBES)
    bucket_rows = " UNION ALL ".join(
        f"SELECT {i} AS r, {_cms_bucket_sql(i)} AS b, token FROM toks"
        for i in range(CMS_DEPTH)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT term, {i} AS r, {_cms_bucket_sql(i, 'term')} AS b FROM probes"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH toks AS ({_O_TOKENS}),
sketch AS (
  SELECT r, b, count(*) AS c FROM ({bucket_rows}) GROUP BY r, b
),
probes(term) AS (VALUES {probe_values}),
pb AS ({probe_rows}),
est AS (
  SELECT term, min(COALESCE(c, 0)) AS cms_estimate
  FROM pb LEFT JOIN sketch USING (r, b) GROUP BY term
),
exact AS (
  SELECT token AS term, count(*) AS exact_count
  FROM toks WHERE token IN (SELECT term FROM probes) GROUP BY token
)
SELECT term,
       CAST(COALESCE(exact_count, 0) AS BIGINT) AS exact_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - COALESCE(exact_count, 0) AS BIGINT) AS overestimate
FROM est LEFT JOIN exact USING (term)
"""


ORACLE_TOKEN_CMS = _oracle_cms()


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch — CMS's cardinality sibling: per-source
# distinct-token estimates from 256 one-byte registers, vs the exact
# countDistinct twin. Two cross-engine-determinism tricks make the gate
# hashable:
#   - the rank function is ALL-INTEGER: rho = bit_count((v & -v) - 1) + 1
#     (lowest-set-bit position via bit_count — no log2/pow floats);
#   - the harmonic sum is computed as an exact BIGINT numerator
#     sum(2^(52-r)) over the 52-capped registers (absent buckets contribute
#     2^52), so the only floating-point steps are one correctly-rounded
#     cast and one correctly-rounded division by a shared literal — bit-
#     identical on both engines by IEEE semantics, no pow()/ln() involved.
# The query emits the RAW estimator plus the exact-integer inputs of the
# standard small-range LinearCounting correction (the empty-register count
# V): the correction itself is m*ln(m/V), and ln() is only 1-ulp-accurate
# on the JVM — not bit-stable across engines — so it belongs to the CALLER
# (computed in the test from V, as real HLL clients do), while every
# gate-hashed column stays integer-derived. Registers are max-mergeable,
# so the same sketch unions across partitions/days for free.

HLL_BUCKETS = 256  # p = 8
HLL_RMAX = 52
# alpha_m * m^2 * 2^52 as a shared decimal literal: both engines parse the
# same shortest-repr decimal to the same IEEE double
_HLL_ALPHA_M = 0.7213 / (1 + 1.079 / HLL_BUCKETS)
HLL_CONST = repr(_HLL_ALPHA_M * HLL_BUCKETS * HLL_BUCKETS * float(2**HLL_RMAX))


def hll_registers(toks: DataFrame) -> DataFrame:
    """(source, bucket, r) HLL registers for a (source, token) stream.
    Factored so the mergeability property — max-merging per-shard
    registers equals whole-stream registers, the algebra that makes the
    sketch distribute — is testable directly."""
    h = F.expr("CAST(conv(substr(md5(token), 1, 15), 16, 10) AS BIGINT)")
    # h DIV (integer division) — a `/` here is double division, which
    # silently rounds above 2^53 and would desync the registers
    hashed = toks.select("source", h.alias("h")).select(
        "source",
        F.expr(f"h % {HLL_BUCKETS}").alias("bucket"),
        F.expr(f"h DIV {HLL_BUCKETS}").alias("v"),
    ).withColumn(
        "rho",
        F.least(
            F.when(F.col("v") == 0, F.lit(HLL_RMAX)).otherwise(
                F.expr("bit_count((v & -v) - 1) + 1")
            ),
            F.lit(HLL_RMAX),
        ),
    )
    return hashed.groupBy("source", "bucket").agg(F.max("rho").alias("r"))


def hll_estimate_from(regs: DataFrame) -> DataFrame:
    """(source, hll_raw_estimate, n_empty_regs) from a register relation —
    the estimate algebra factored out so any (source, token) domain
    (tokens, user ids, URLs) reuses the same sketch."""
    per_source = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - r)")).alias("s_present"),
    )
    s_num = (
        F.col("s_present")
        + (F.lit(HLL_BUCKETS) - F.col("n_present")) * F.lit(2**HLL_RMAX).cast("bigint")
    )
    est = F.floor(F.lit(float(HLL_CONST)) / s_num.cast("double")).cast("bigint")
    return per_source.select(
        "source",
        est.alias("hll_raw_estimate"),
        (F.lit(HLL_BUCKETS) - F.col("n_present"))
        .cast("bigint")
        .alias("n_empty_regs"),
    )


def q_token_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate per source with all-integer registers and exact twin."""
    docs = table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    estimates = hll_estimate_from(hll_registers(toks))
    exact = toks.groupBy("source").agg(
        F.countDistinct("token").alias("exact_distinct")
    )
    return (
        estimates.join(exact, "source")
        .select(
            "source",
            "exact_distinct",
            "hll_raw_estimate",
            "n_empty_regs",
        )
    )


def hll_corrected(raw: int, n_empty: int) -> int:
    """Client-side small-range correction (LinearCounting): what an HLL
    consumer applies to the query's raw estimate. Kept out of the gated
    query because ln() is not bit-stable across engines."""
    import math

    if raw <= 2.5 * HLL_BUCKETS and n_empty > 0:
        return round(HLL_BUCKETS * math.log(HLL_BUCKETS / n_empty))
    return raw


ORACLE_TOKEN_HLL = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
hashed AS (
  SELECT source,
         h % {HLL_BUCKETS} AS bucket,
         CAST(h // {HLL_BUCKETS} AS BIGINT) AS v
  FROM (
    SELECT source,
           CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h,
           token
    FROM toks
  )
),
rho AS (
  SELECT source, bucket,
         least(CASE WHEN v = 0 THEN {HLL_RMAX}
                    ELSE bit_count((v & -v) - 1) + 1 END, {HLL_RMAX}) AS rho
  FROM hashed
),
regs AS (
  SELECT source, bucket, max(rho) AS r FROM rho GROUP BY 1, 2
),
per_source AS (
  SELECT source,
         count(*) AS n_present,
         sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - r)) AS s_present
  FROM regs GROUP BY source
),
est AS (
  SELECT source,
         CAST(floor({HLL_CONST} / CAST(s_present + ({HLL_BUCKETS} - n_present) * (CAST(1 AS BIGINT) << {HLL_RMAX}) AS DOUBLE)) AS BIGINT) AS hll_raw_estimate,
         CAST({HLL_BUCKETS} - n_present AS BIGINT) AS n_empty_regs
  FROM per_source
),
exact AS (
  SELECT source, count(DISTINCT token) AS exact_distinct FROM toks GROUP BY source
)
SELECT source,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       hll_raw_estimate,
       n_empty_regs
FROM est JOIN exact USING (source)
"""


def q_hll_merge_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes HLL the 100 TB distinct counter, PROVEN
    in-engine as a gated one-row report: max-merging the per-source
    register sets must reproduce the whole-stream register set exactly
    (max is associative/commutative — partial sketches from any shard
    layout merge to the same global sketch), so the merged estimate IS
    the direct estimate. Emits the register-mismatch count (0 is the
    invariant the gate hashes) alongside both raw estimates and the
    exact global distinct for calibration.

    Scale shape: two register builds over one token stream (production
    keeps only the per-shard one and merges — the second build exists
    here to prove the merge), each a (key, bucket) max-aggregation with
    map-side combine; the compare and the estimate are 256-row
    metadata ops."""
    docs = table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    merged = (
        hll_registers(toks)
        .groupBy("bucket")
        .agg(F.max("r").alias("rm"))
    )
    direct = hll_registers(toks.withColumn("source", F.lit("__all__"))).select(
        "bucket", F.col("r").alias("rd")
    )
    cmp = merged.join(direct, "bucket", "full_outer")
    mismatches = F.sum(
        (
            F.col("rm").isNull()
            | F.col("rd").isNull()
            | (F.col("rm") != F.col("rd"))
        ).cast("bigint")
    )

    def raw_est(sum_col: F.Column, present_col: F.Column) -> F.Column:
        s_num = sum_col + (F.lit(HLL_BUCKETS) - present_col) * F.lit(
            2**HLL_RMAX
        ).cast("bigint")
        return F.floor(F.lit(float(HLL_CONST)) / s_num.cast("double")).cast(
            "bigint"
        )

    stats = cmp.agg(
        mismatches.alias("n_register_mismatch"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - rm)")).alias("sm"),
        F.count("rm").alias("pm"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - rd)")).alias("sd"),
        F.count("rd").alias("pd"),
    )
    exact = toks.agg(F.countDistinct("token").alias("exact_distinct"))
    return stats.crossJoin(F.broadcast(exact)).select(
        "n_register_mismatch",
        raw_est(F.col("sm"), F.col("pm")).alias("merged_raw_estimate"),
        raw_est(F.col("sd"), F.col("pd")).alias("direct_raw_estimate"),
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
    )


ORACLE_HLL_MERGE = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
hashed AS (
  SELECT source,
         h % {HLL_BUCKETS} AS bucket,
         CAST(h // {HLL_BUCKETS} AS BIGINT) AS v
  FROM (
    SELECT source,
           CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h
    FROM toks
  )
),
rho AS (
  SELECT source, bucket,
         least(CASE WHEN v = 0 THEN {HLL_RMAX}
                    ELSE bit_count((v & -v) - 1) + 1 END, {HLL_RMAX}) AS rho
  FROM hashed
),
per_source_regs AS (
  SELECT source, bucket, max(rho) AS r FROM rho GROUP BY source, bucket
),
merged AS (SELECT bucket, max(r) AS rm FROM per_source_regs GROUP BY bucket),
direct AS (SELECT bucket, max(rho) AS rd FROM rho GROUP BY bucket),
cmp AS (
  SELECT COALESCE(m.bucket, d.bucket) AS bucket, rm, rd
  FROM merged m FULL OUTER JOIN direct d ON m.bucket = d.bucket
),
stats AS (
  SELECT CAST(sum(CASE WHEN rm IS NULL OR rd IS NULL OR rm <> rd THEN 1 ELSE 0 END) AS BIGINT) AS n_register_mismatch,
         sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - rm)) AS sm, count(rm) AS pm,
         sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - rd)) AS sd, count(rd) AS pd
  FROM cmp
),
exact AS (SELECT count(DISTINCT token) AS exact_distinct FROM toks)
SELECT n_register_mismatch,
       CAST(floor({HLL_CONST} / CAST(sm + ({HLL_BUCKETS} - pm) * (CAST(1 AS BIGINT) << {HLL_RMAX}) AS DOUBLE)) AS BIGINT) AS merged_raw_estimate,
       CAST(floor({HLL_CONST} / CAST(sd + ({HLL_BUCKETS} - pd) * (CAST(1 AS BIGINT) << {HLL_RMAX}) AS DOUBLE)) AS BIGINT) AS direct_raw_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM stats, exact
"""


# ---------------------------------------------------------------------------
# Exact heavy hitters (two-pass candidate pruning, no full-vocabulary shuffle)

HH_K = 30  # heavy hitter := token whose count * HH_K >= stream length N


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (count >= N/HH_K of the token stream) in two
    passes with no full-vocabulary shuffle — the scale shape for frequency
    mining where the long tail of singleton tokens, not the hitters,
    dominates a plain groupBy(token)'s exchange.

    Pass 1 (candidates, shuffle-free): ``mapInPandas`` consumes each
    partition's full Arrow batch iterator, accumulates per-partition token
    counts, and emits only tokens with local_count * K >= partition_length
    — at most K rows per partition, so the candidate relation is <= K * P
    rows total. Pigeonhole guarantees zero false negatives: if a token's
    global count * K >= N but its local count * K < N_p in EVERY
    partition, summing gives count * K < N — contradiction. (Python lane
    is Arrow-vectorized ``value_counts``, not per-row.)

    Pass 2 (exact recount): broadcast the tiny candidate set, semi-join it
    into the token stream BEFORE the exchange (map-side filter), aggregate
    exact counts, and apply the global threshold. False positives from
    pass 1 die here, so the result is exact and partition-independent —
    which is what lets a DuckDB oracle with a plain GROUP BY/HAVING verify
    it bit-for-bit.

    At 100 TB: two scans of the raw stream (both map-side-filtered or
    map-only), one broadcast of <= K*P rows, one aggregation over only
    candidate-matching tokens. Compare: one-pass groupBy ships every
    distinct (partition, token) pair through the exchange."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(docs).select("token")

    def _local_candidates(batches):
        import collections

        import pandas as pd

        counts: collections.Counter = collections.Counter()
        total = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            total += int(vc.sum())
            for tok, c in vc.items():
                counts[tok] += int(c)
        yield pd.DataFrame(
            {"token": [t for t, c in counts.items() if c * HH_K >= total]}
        )

    cands = toks.mapInPandas(_local_candidates, schema="token string").distinct()
    n = toks.count()
    return (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("hh_count"))
        .filter(F.col("hh_count") * HH_K >= F.lit(n))
        .select(
            "token",
            "hh_count",
            (F.col("hh_count") * F.lit(1.0) / F.lit(n)).alias("share"),
        )
    )


ORACLE_TOKEN_HEAVY_HITTERS = f"""
WITH toks AS ({_O_TOKENS}),
n AS (SELECT count(*) AS n FROM toks)
SELECT token,
       count(*) AS hh_count,
       count(*) * 1.0 / (SELECT n FROM n) AS share
FROM toks
GROUP BY token
HAVING count(*) * {HH_K} >= (SELECT n FROM n)
"""


# ---------------------------------------------------------------------------
# mergeable histogram quantiles: the quantile arm of the sketch algebra
# (HLL = distinct counts, CMS = frequencies, this = percentiles). An
# equi-width integer-bin histogram is trivially mergeable (merge = vector
# add), so per-shard partials roll up to the exact global histogram on
# any shard layout — proven in-engine the same way hll_merge_check proves
# register max-merge — and a quantile read off the merged histogram is
# wrong by at most one bin width.

QH_BIN_CENTS = 500_000  # $5,000 bins over o_totalprice
QH_PCTS = (50, 95, 99)


def q_quantile_histogram_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row report: shard-merged histogram == direct histogram
    (mismatch count, 0 is the invariant), plus histogram-estimated
    p50/p95/p99 next to the exact type-1 order statistics for
    calibration — |est_hi - exact| <= one bin width by construction.

    Scale shape: the histogram build is one map-side-combined (shard,
    bin) aggregation over the pruned orders scan; everything after runs
    on the ~100-bin relation. The exact quantiles come from a
    pre-aggregated (cents, count) cumulative sum — the per-row global
    rank collapses to a distinct-price-sized relation BEFORE the one
    ordered window, so no task ever sorts the full table. All cells are
    exact integers (FLOATS.md class A; quantile = smallest value whose
    cumulative count reaches ceil(p*n/100))."""
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    vals = cache_eager(
        table(spark, sf_dir, "orders").select(
            cents.alias("cents"),
            F.expr("o_orderkey % 8").alias("shard"),
        )
    )
    binned = vals.select(
        "shard", F.expr(f"cents div {QH_BIN_CENTS}").alias("bin")
    )
    sharded = (
        binned.groupBy("shard", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("bin")
        .agg(F.sum("c").cast("bigint").alias("cm"))
    )
    direct = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cd"))
    cmp = sharded.join(direct, "bin", "full_outer")
    mismatch = F.sum(
        (
            F.col("cm").isNull()
            | F.col("cd").isNull()
            | (F.col("cm") != F.col("cd"))
        ).cast("bigint")
    )
    stats = cmp.agg(
        mismatch.alias("shard_merge_mismatch"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    total = vals.agg(F.count(F.lit(1)).alias("n_orders"))
    cum = sharded.select(
        "bin",
        F.sum("cm")
        .over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
    ).crossJoin(F.broadcast(total))
    est_cols = [
        F.min(
            F.when(
                F.col("cum") * 100 >= F.col("n_orders") * p, F.col("bin")
            )
        ).alias(f"b{p}")
        for p in QH_PCTS
    ]
    ests = cum.agg(*est_cols)
    # exact order statistics WITHOUT ranking every row: aggregate to
    # (cents, count) first (map-side combined, distinct-price-sized),
    # then one ordered window over that small relation — the cumulative
    # count at each distinct value equals the row_number of its LAST
    # duplicate, so "smallest cents with cum*100 >= n*p" is the same
    # type-1 order statistic the per-row rank would give.
    ccum = (
        vals.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cc"))
        .select(
            "cents",
            F.sum("cc")
            .over(
                Window.orderBy("cents").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("crn"),
        )
        .crossJoin(F.broadcast(total))
    )
    exact_cols = [
        F.min(
            F.when(
                F.col("crn") * 100 >= F.col("n_orders") * p, F.col("cents")
            )
        ).alias(f"e{p}")
        for p in QH_PCTS
    ]
    exacts = ccum.agg(*exact_cols)
    out = [
        "n_orders",
        "n_bins",
        "shard_merge_mismatch",
    ]
    sel = total.crossJoin(stats).crossJoin(ests).crossJoin(exacts)
    cols = [F.col(c) for c in out]
    for p in QH_PCTS:
        cols.append(
            F.expr(f"(b{p} + 1) * {QH_BIN_CENTS}")
            .cast("bigint")
            .alias(f"p{p}_est_hi_cents")
        )
        cols.append(F.col(f"e{p}").cast("bigint").alias(f"p{p}_exact_cents"))
    return sel.select(*cols)


def _oracle_quantile_hist() -> str:
    est = ", ".join(
        f"CAST((min(CASE WHEN cum * 100 >= n_orders * {p} THEN bin END) + 1) "
        f"* {QH_BIN_CENTS} AS BIGINT) AS p{p}_est_hi_cents"
        for p in QH_PCTS
    )
    exact = ", ".join(
        f"CAST(min(CASE WHEN rn * 100 >= n_orders * {p} THEN cents END) "
        f"AS BIGINT) AS p{p}_exact_cents"
        for p in QH_PCTS
    )
    return f"""
WITH vals AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderkey % 8 AS shard
  FROM orders
),
total AS (SELECT count(*) AS n_orders FROM vals),
binned AS (SELECT shard, cents // {QH_BIN_CENTS} AS bin FROM vals),
sharded AS (
  SELECT bin, CAST(sum(c) AS BIGINT) AS cm FROM (
    SELECT shard, bin, count(*) AS c FROM binned GROUP BY 1, 2
  ) GROUP BY bin
),
direct AS (SELECT bin, count(*) AS cd FROM binned GROUP BY 1),
cmp AS (
  SELECT CAST(sum(CASE WHEN cm IS NULL OR cd IS NULL OR cm != cd
                       THEN 1 ELSE 0 END) AS BIGINT) AS shard_merge_mismatch,
         count(*) AS n_bins
  FROM sharded FULL OUTER JOIN direct USING (bin)
),
cum AS (
  SELECT bin, sum(cm) OVER (ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, n_orders
  FROM sharded CROSS JOIN total
),
ests AS (SELECT {est} FROM cum),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn, n_orders
  FROM vals CROSS JOIN total
),
exacts AS (SELECT {exact} FROM ranked)
SELECT n_orders, n_bins, shard_merge_mismatch,
       {", ".join(f"p{p}_est_hi_cents, p{p}_exact_cents" for p in QH_PCTS)}
FROM total CROSS JOIN cmp CROSS JOIN ests CROSS JOIN exacts
"""


ORACLE_QUANTILE_HIST = _oracle_quantile_hist()


# ---------------------------------------------------------------------------
# HLL set algebra: intersection estimation by inclusion-exclusion over the
# SAME mergeable registers the distinct counter uses. |A ∩ B| has no direct
# HLL form — |A| + |B| - |A ∪ B| is how production sketch stacks answer
# cross-segment overlap questions without re-scanning either side; the
# union sketch is just the bucketwise max-merge (the proven-associative op).


def q_hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-domain overlap between the even- and odd-indexed sources:
    HLL estimates for A, B, A ∪ B (max-merged registers), the
    inclusion-exclusion intersection estimate, the exact counterparts,
    and the intersection error in basis points.

    One register build per side from one token scan; the union sketch
    merges REGISTERS (256 rows), never re-reads data — the exact twin
    exists only to grade the estimate. All-integer registers; the two
    floor(const/double) estimates per side are the gated q_token_hll
    recipe unchanged."""
    docs = spread(table(spark, sf_dir, "documents"))
    side = F.when(
        F.substring("source", 4, 8).cast("int") % 2 == 0, "A"
    ).otherwise("B")
    toks = docs.select(
        side.alias("source"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    regs = cache_eager(hll_registers(toks))
    regs_u = regs.groupBy("bucket").agg(F.max("r").alias("r")).select(
        F.lit("U").alias("source"), "bucket", "r"
    )
    # full HLL algorithm, not just the raw estimator: at small cardinality
    # the raw harmonic mean overestimates badly (measured 199 vs exact 31
    # here) — the standard small-range branch switches to linear counting
    # m*ln(m/V) over the V empty registers. One ln per side row (class C),
    # floored to an integer estimate on both engines.
    m = float(HLL_BUCKETS)
    corrected = F.when(
        (F.col("hll_raw_estimate") <= F.lit(2.5 * m))
        & (F.col("n_empty_regs") > 0),
        F.floor(
            F.lit(m) * F.log(F.lit(m) / F.col("n_empty_regs").cast("double"))
        ).cast("bigint"),
    ).otherwise(F.col("hll_raw_estimate"))
    ests = hll_estimate_from(regs.unionByName(regs_u)).withColumn(
        "est", corrected
    )
    one = ests.groupBy().pivot("source", ["A", "B", "U"]).sum("est")
    sides = cache_eager(toks.distinct())
    exact = (
        sides.groupBy("token")
        .agg(F.countDistinct("source").alias("ns"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_union"),
            F.sum((F.col("ns") == 2).cast("bigint"))
            .cast("bigint")
            .alias("exact_intersection"),
        )
    )
    return (
        one.crossJoin(F.broadcast(exact))  # 1-row x 1-row scalar attach
        .selectExpr(
            "CAST(A AS BIGINT) AS est_a",
            "CAST(B AS BIGINT) AS est_b",
            "CAST(U AS BIGINT) AS est_union",
            "CAST(greatest(A + B - U, 0) AS BIGINT) AS est_intersection",
            "exact_union",
            "exact_intersection",
            "CAST(abs(greatest(A + B - U, 0) - exact_intersection) * 10000 "
            "DIV nullif(exact_intersection, 0) AS BIGINT) AS err_bp",
        )
    )


ORACLE_HLL_INTERSECTION = f"""
WITH toks AS (
  SELECT CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
              THEN 'A' ELSE 'B' END AS source,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
hashed AS (
  SELECT source, h % {HLL_BUCKETS} AS bucket,
         CAST(h // {HLL_BUCKETS} AS BIGINT) AS v
  FROM (SELECT source,
               CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h
        FROM toks)
),
rho AS (
  SELECT source, bucket,
         least(CASE WHEN v = 0 THEN {HLL_RMAX}
                    ELSE bit_count((v & -v) - 1) + 1 END, {HLL_RMAX}) AS rho
  FROM hashed
),
regs AS (SELECT source, bucket, max(rho) AS r FROM rho GROUP BY 1, 2),
all_regs AS (
  SELECT source, bucket, r FROM regs
  UNION ALL
  SELECT 'U' AS source, bucket, max(r) AS r FROM regs GROUP BY 2
),
raw AS (
  SELECT source,
         CAST(floor({HLL_CONST} / CAST(sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - r))
              + ({HLL_BUCKETS} - count(*)) * (CAST(1 AS BIGINT) << {HLL_RMAX})
              AS DOUBLE)) AS BIGINT) AS raw_e,
         CAST({HLL_BUCKETS} - count(*) AS BIGINT) AS v
  FROM all_regs GROUP BY source
),
est AS (
  SELECT source,
         CASE WHEN raw_e <= {2.5 * HLL_BUCKETS} AND v > 0
              THEN CAST(floor({float(HLL_BUCKETS)} *
                   ln({float(HLL_BUCKETS)} / CAST(v AS DOUBLE))) AS BIGINT)
              ELSE raw_e END AS e
  FROM raw
),
one AS (
  SELECT max(CASE WHEN source = 'A' THEN e END) AS a,
         max(CASE WHEN source = 'B' THEN e END) AS b,
         max(CASE WHEN source = 'U' THEN e END) AS u
  FROM est
),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_union,
         CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_intersection
  FROM (SELECT token, count(DISTINCT source) AS ns FROM toks GROUP BY 1)
)
SELECT CAST(a AS BIGINT) AS est_a,
       CAST(b AS BIGINT) AS est_b,
       CAST(u AS BIGINT) AS est_union,
       CAST(greatest(a + b - u, 0) AS BIGINT) AS est_intersection,
       exact_union,
       exact_intersection,
       CAST(abs(greatest(a + b - u, 0) - exact_intersection) * 10000
            // nullif(exact_intersection, 0) AS BIGINT) AS err_bp
FROM one, exact
"""


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion (RRF) of the lexical (BM25) and
# semantic (fitted-IVF ANN) rankers — the standard serving pattern for RAG
# and training-data curation (Cormack et al., SIGIR'09: fused score =
# sum over rankers of 1/(k + rank), robust to incomparable score scales
# because it only consumes RANKS). Both input rankers are themselves
# oracle-gated queries, composed unchanged; the fusion is integer-quantized
# (micro units, integer division) with deterministic tie-breaks so the
# DuckDB oracle re-derives both rank lists AND the fusion bit-for-bit.

RRF_K = 60  # the standard RRF damping constant
RRF_Q = 1_000_000  # micro quantization: score term = RRF_Q DIV (RRF_K + rank)
HYBRID_LEX_K = 20  # lexical candidate-list depth
HYBRID_TOPN = 10  # fused results emitted


def rrf_fuse(lex: DataFrame, sem: DataFrame) -> DataFrame:
    """Fuse two 1-based rank lists — ``lex (doc_id, lr)`` and ``sem
    (vec_id, sr)`` — by reciprocal-rank fusion: full-outer join on id (a
    doc may appear in either list alone; absence contributes 0, emitted
    as the rank-0 sentinel so every output column stays non-null BIGINT),
    fused score = sum of ``RRF_Q DIV (RRF_K + rank)`` in exact micro
    units, final rank by (score desc, doc_id) over the bounded (<=
    |lex|+|sem| rows) union. Factored out of q_hybrid_search_rrf so the
    planted test can fuse hand-built rank lists."""
    fused = lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer").select(
        F.coalesce(lex["doc_id"], sem["vec_id"]).alias("doc_id"),
        F.coalesce(F.col("lr"), F.lit(0)).cast("bigint").alias("lex_rank"),
        F.coalesce(F.col("sr"), F.lit(0)).cast("bigint").alias("sem_rank"),
        (
            F.coalesce(F.expr(f"{RRF_Q} DIV ({RRF_K} + lr)"), F.lit(0))
            + F.coalesce(F.expr(f"{RRF_Q} DIV ({RRF_K} + sr)"), F.lit(0))
        )
        .cast("bigint")
        .alias("rrf_micro"),
    )
    # bounded relation (candidate lists only) — constant-key window is the
    # adjudicated two-phase top-K convention (vocab_oov_report)
    w0 = Window.partitionBy(F.lit(0)).orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("hybrid_rank", F.row_number().over(w0).cast("bigint"))
        .filter(F.col("hybrid_rank") <= HYBRID_TOPN)
        .orderBy("hybrid_rank")
    )


def _hybrid_rank_lists(spark: SparkSession, sf_dir: str):
    """The two gated rankers' bounded rank lists — lex (doc_id, lr) from
    bm25_search top-HYBRID_LEX_K, sem (vec_id, sr) from ann_ivf_fitted —
    shared by the fusion query and the RRF-k sensitivity sweep."""
    from .similarity import q_ann_ivf_fitted

    w0 = Window.partitionBy(F.lit(0))
    lex = (
        q_bm25_search(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(HYBRID_LEX_K)
        .select(
            "doc_id",
            F.row_number()
            .over(w0.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
            .alias("lr"),
        )
    )
    sem = q_ann_ivf_fitted(spark, sf_dir).select(
        "vec_id",
        F.row_number()
        .over(w0.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()))
        .alias("sr"),
    )
    return lex, sem


def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid BM25 + ANN retrieval via reciprocal-rank fusion.

    Lexical leg: the gated ``bm25_search`` scores (probe BM25_QUERY),
    top-HYBRID_LEX_K by (bm25 desc, doc_id) — ``orderBy().limit()`` is a
    parallel TakeOrderedAndProject, then ranks assigned on the bounded
    survivors. Semantic leg: the gated ``ann_ivf_fitted`` top-K (the
    on-engine-trained IVF serving path; probe = QUERY_VEC_ID's embedding,
    under the corpus convention vec_id == doc_id), ranked by (cosine
    desc, vec_id). Fusion: :func:`rrf_fuse`.

    Scale shape: each leg keeps its own gated plan (BM25 filters the
    token stream to the query's terms before any shuffle; IVF probes 2
    cells of the assigned corpus); the fusion itself only ever touches
    the two bounded candidate lists."""
    lex, sem = _hybrid_rank_lists(spark, sf_dir)
    return rrf_fuse(lex, sem)


RRF_K_SWEEP = (10, RRF_K, 200)


def q_hybrid_rrf_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitivity of the fused ranking to the RRF damping constant: per
    candidate k, the fused winner and how much of the default-k (60)
    top-HYBRID_TOPN list survives. A low k lets a single high rank
    dominate (lexical-winner-take-all), a high k blends toward list
    membership; a stable top-1/large overlap across the sweep means the
    fusion — not the constant — is doing the work.

    Scale shape: BOTH rankers run once (the same bounded lists the
    fusion query uses); the sweep re-scores the <=30-row fused relation
    per k — pure bounded algebra."""
    lex, sem = _hybrid_rank_lists(spark, sf_dir)
    fused = lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer").select(
        F.coalesce(lex["doc_id"], sem["vec_id"]).alias("doc_id"),
        F.coalesce(F.col("lr"), F.lit(0)).cast("bigint").alias("lr"),
        F.coalesce(F.col("sr"), F.lit(0)).cast("bigint").alias("sr"),
    )
    cached = cache_eager(fused)  # <= HYBRID_LEX_K + TOPK rows
    ks = ", ".join(str(k) for k in RRF_K_SWEEP)
    scored = cached.selectExpr(
        "doc_id", "lr", "sr", f"explode(array({ks})) AS rrf_k"
    ).selectExpr(
        "rrf_k",
        "doc_id",
        f"CASE WHEN lr > 0 THEN {RRF_Q} DIV (rrf_k + lr) ELSE 0 END"
        f" + CASE WHEN sr > 0 THEN {RRF_Q} DIV (rrf_k + sr) ELSE 0 END"
        " AS rrf_micro",
    )
    w_k = Window.partitionBy("rrf_k").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("hr", F.row_number().over(w_k))
    topn = ranked.filter(F.col("hr") <= HYBRID_TOPN)
    base = topn.filter(F.col("rrf_k") == RRF_K).select(
        F.col("doc_id").alias("bdoc")
    )
    return (
        topn.join(F.broadcast(base), topn["doc_id"] == base["bdoc"], "left")
        .groupBy("rrf_k")
        .agg(
            F.expr("min_by(doc_id, hr)").alias("top1"),
            F.expr("sum(CASE WHEN bdoc IS NULL THEN 0 ELSE 1 END)").alias(
                "ov"
            ),
        )
        .selectExpr(
            "CAST(rrf_k AS BIGINT) AS rrf_k",
            "CAST(top1 AS BIGINT) AS top1_doc_id",
            f"CAST(ov AS BIGINT) AS overlap_with_default_top{HYBRID_TOPN}",
        )
        .orderBy("rrf_k")
    )


def _oracle_rrf_k_sweep() -> str:
    from .similarity import ORACLE_ANN_IVF_FITTED

    ks = ", ".join(f"({k})" for k in RRF_K_SWEEP)
    return f"""
WITH lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lr
  FROM ({ORACLE_BM25}) t
  ORDER BY bm25 DESC, doc_id LIMIT {HYBRID_LEX_K}
),
sem AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS sr
  FROM ({ORACLE_ANN_IVF_FITTED}) t
),
fused AS (
  SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
         coalesce(l.lr, 0) AS lr, coalesce(s.sr, 0) AS sr
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
),
scored AS (
  SELECT k.rrf_k, f.doc_id,
         CASE WHEN lr > 0 THEN {RRF_Q} // (rrf_k + lr) ELSE 0 END
           + CASE WHEN sr > 0 THEN {RRF_Q} // (rrf_k + sr) ELSE 0 END
           AS rrf_micro
  FROM fused f CROSS JOIN (VALUES {ks}) k(rrf_k)
),
ranked AS (
  SELECT rrf_k, doc_id, rrf_micro,
         row_number() OVER (PARTITION BY rrf_k
                            ORDER BY rrf_micro DESC, doc_id) AS hr
  FROM scored
),
topn AS (SELECT * FROM ranked WHERE hr <= {HYBRID_TOPN}),
base AS (SELECT doc_id AS bdoc FROM topn WHERE rrf_k = {RRF_K})
SELECT CAST(t.rrf_k AS BIGINT) AS rrf_k,
       CAST(arg_min(t.doc_id, t.hr) AS BIGINT) AS top1_doc_id,
       CAST(sum(CASE WHEN b.bdoc IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS overlap_with_default_top{HYBRID_TOPN}
FROM topn t LEFT JOIN base b ON t.doc_id = b.bdoc
GROUP BY t.rrf_k
ORDER BY t.rrf_k
"""


ORACLE_HYBRID_RRF_K_SWEEP = _oracle_rrf_k_sweep()


def _oracle_hybrid_rrf() -> str:
    from .similarity import ORACLE_ANN_IVF_FITTED

    return f"""
WITH lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lr
  FROM ({ORACLE_BM25}) t
  ORDER BY bm25 DESC, doc_id LIMIT {HYBRID_LEX_K}
),
sem AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS sr
  FROM ({ORACLE_ANN_IVF_FITTED}) t
),
fused AS (
  SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
         coalesce(l.lr, 0) AS lex_rank,
         coalesce(s.sr, 0) AS sem_rank,
         coalesce({RRF_Q} // ({RRF_K} + l.lr), 0)
           + coalesce({RRF_Q} // ({RRF_K} + s.sr), 0) AS rrf_micro
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank,
       CAST(rrf_micro AS BIGINT) AS rrf_micro,
       CAST(hybrid_rank AS BIGINT) AS hybrid_rank
FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS hybrid_rank
  FROM fused
)
WHERE hybrid_rank <= {HYBRID_TOPN}
ORDER BY hybrid_rank
"""


ORACLE_HYBRID_RRF = _oracle_hybrid_rrf()


# ---------------------------------------------------------------------------
# out-of-corpus hybrid serving: the full RAG query shape — a raw query
# STRING through the BM25 leg and a literal out-of-corpus query VECTOR
# through the IVF leg, fused by the same integer RRF. The corpus-member
# hybrid (q_hybrid_search_rrf) grades the fusion against known rankers;
# this one is the fusion a serving endpoint actually answers.


def q_hybrid_query_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for a NOVEL query: lexical leg =
    :func:`q_bm25_raw_query` (raw string BM25_RAW_QUERY_STR, tokenized
    on-engine) top-HYBRID_LEX_K; semantic leg =
    ``ann_query_vector_topk`` (literal vector OOC_QUERY_VEC, not a row
    of ``embeddings``) top-K under the frozen IVF codebook; fusion =
    :func:`rrf_fuse` (vec_id == doc_id corpus convention).

    Scale shape: each leg keeps its own gated serving plan (postings-
    list residue / N_PROBE cells); the fusion only touches the two
    bounded candidate lists."""
    from .similarity import q_ann_query_vector_topk

    w0 = Window.partitionBy(F.lit(0))
    lex = (
        q_bm25_raw_query(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(HYBRID_LEX_K)
        .select(
            "doc_id",
            F.row_number()
            .over(w0.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
            .alias("lr"),
        )
    )
    sem = q_ann_query_vector_topk(spark, sf_dir).select(
        "vec_id",
        F.row_number()
        .over(w0.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()))
        .alias("sr"),
    )
    return rrf_fuse(lex, sem)


def _oracle_hybrid_query() -> str:
    from .similarity import ORACLE_ANN_QUERY_VECTOR

    return f"""
WITH lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lr
  FROM ({ORACLE_BM25_RAW}) t
  ORDER BY bm25 DESC, doc_id LIMIT {HYBRID_LEX_K}
),
sem AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS sr
  FROM ({ORACLE_ANN_QUERY_VECTOR}) t
),
fused AS (
  SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
         coalesce(l.lr, 0) AS lex_rank,
         coalesce(s.sr, 0) AS sem_rank,
         coalesce({RRF_Q} // ({RRF_K} + l.lr), 0)
           + coalesce({RRF_Q} // ({RRF_K} + s.sr), 0) AS rrf_micro
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank,
       CAST(rrf_micro AS BIGINT) AS rrf_micro,
       CAST(hybrid_rank AS BIGINT) AS hybrid_rank
FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS hybrid_rank
  FROM fused
)
WHERE hybrid_rank <= {HYBRID_TOPN}
ORDER BY hybrid_rank
"""


ORACLE_HYBRID_QUERY = _oracle_hybrid_query()


QUERIES = {
    "hll_intersection_estimate": q_hll_intersection_estimate,
    "hybrid_search_rrf": q_hybrid_search_rrf,
    "hybrid_rrf_k_sweep": q_hybrid_rrf_k_sweep,
    "bm25_raw_query": q_bm25_raw_query,
    "hybrid_query_search": q_hybrid_query_search,
    "tfidf_top_terms": q_tfidf_top_terms,
    "quantile_histogram_check": q_quantile_histogram_check,
    "bm25_search": q_bm25_search,
    "doc_chunks": q_doc_chunks,
    "posting_lists": q_posting_lists,
    "token_cms_estimate": q_token_cms,
    "token_hll_distinct": q_token_hll,
    "hll_merge_check": q_hll_merge_check,
    "token_heavy_hitters": q_token_heavy_hitters,
}

ORACLES = {
    "hybrid_search_rrf": ORACLE_HYBRID_RRF,
    "hybrid_rrf_k_sweep": ORACLE_HYBRID_RRF_K_SWEEP,
    "bm25_raw_query": ORACLE_BM25_RAW,
    "hybrid_query_search": ORACLE_HYBRID_QUERY,
    "tfidf_top_terms": ORACLE_TFIDF,
    "quantile_histogram_check": ORACLE_QUANTILE_HIST,
    "bm25_search": ORACLE_BM25,
    "doc_chunks": ORACLE_DOC_CHUNKS,
    "posting_lists": ORACLE_POSTING_LISTS,
    "token_cms_estimate": ORACLE_TOKEN_CMS,
    "token_hll_distinct": ORACLE_TOKEN_HLL,
    "hll_intersection_estimate": ORACLE_HLL_INTERSECTION,
    "hll_merge_check": ORACLE_HLL_MERGE,
    "token_heavy_hitters": ORACLE_TOKEN_HEAVY_HITTERS,
}
