"""Text-analysis operators over the ``documents`` table.

These are the training-data-pipeline operators the rebuild adds beyond the
reference surface (BASELINE.json north star; no counterpart in the reference
repo — its only text processing is UPPER/LIKE matching,
``sap_semantic_model.json:8008``). All computation is built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd) — no Python UDFs
in any hot path, so a 100 TB corpus streams through scan->project->agg
without serialization walls.

Determinism: every operator is expressible in ANSI SQL and hash-matches a
DuckDB oracle (regex semantics kept to the common Java/RE2 subset; doubles
rounded at the output boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cachereg import cache_eager
from ..sources.loader import spread, table

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic. Chosen to be regex-safe in both Java regex and RE2.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}


def _norm_text() -> F.Column:
    """lower + collapse whitespace — the shared normalization."""
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")


def token_stats_from(docs: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("token_count"),
        F.length(F.trim(F.col("text"))).alias("char_count"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).alias(
            "subword_count"
        ),
        F.round(
            F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


ORACLE_TOKEN_STATS = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS token_count,
       CAST(length(trim(text)) AS INT) AS char_count,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS subword_count,
       round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\s+')), 4) AS avg_token_len
FROM documents
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword proxy
    (runs of letters OR digits OR single punctuation — the classic
    pre-tokenizer regex)."""
    return token_stats_from(table(spark, sf_dir, "documents"))


def quality_score_from(docs: DataFrame) -> DataFrame:
    t = F.trim(F.col("text"))
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    words = F.size(F.split(t, r"\s+"))
    stop = F.regexp_count(
        F.lower(t), F.lit(r"\b(the|and|of|to|a|in|is|it)\b")
    )
    quality = F.round(
        (alpha / n_chars) * F.lit(0.5)
        + F.least(F.lit(1.0), stop.cast("double") / words * F.lit(10)) * F.lit(0.3)
        + F.least(F.lit(1.0), words.cast("double") / F.lit(100)) * F.lit(0.2),
        4,
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_obs"),
        F.round(alpha / n_chars, 4).alias("alpha_ratio"),
        punct.alias("punct_count"),
        F.round(stop.cast("double") / words, 4).alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


ORACLE_QUALITY_SCORE = r"""
WITH base AS (
  SELECT doc_id,
         trim(text) AS t,
         CAST(length(trim(text)) AS INT) AS n_chars_obs,
         CAST(length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS INT) AS alpha,
         CAST(len(regexp_extract_all(trim(text), '[.,;:!?]')) AS INT) AS punct_count,
         len(regexp_split_to_array(trim(text), '\s+')) AS words,
         CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|a|in|is|it)\b')) AS INT) AS stop
  FROM documents
)
SELECT doc_id,
       n_chars_obs,
       round(CAST(alpha AS DOUBLE) / n_chars_obs, 4) AS alpha_ratio,
       punct_count,
       round(CAST(stop AS DOUBLE) / words, 4) AS stopword_ratio,
       round((CAST(alpha AS DOUBLE) / n_chars_obs) * 0.5
             + least(1.0, CAST(stop AS DOUBLE) / words * 10) * 0.3
             + least(1.0, CAST(words AS DOUBLE) / 100) * 0.2, 4) AS quality_score
FROM base
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, alpha ratio, punctuation density, stopword
    ratio — the standard cheap quality signals for corpus filtering."""
    return quality_score_from(table(spark, sf_dir, "documents"))


def language_id_from(docs: DataFrame) -> DataFrame:
    low = F.lower(F.col("text"))
    scores = {
        lang: F.regexp_count(low, F.lit(r"\b(" + "|".join(words) + r")\b"))
        for lang, words in LANG_MARKERS.items()
    }
    en, de, fr, es = scores["en"], scores["de"], scores["fr"], scores["es"]
    best = F.greatest(en, de, fr, es)
    predicted = (
        F.when(best == 0, "unknown")
        .when(en == best, "en")
        .when(de == best, "de")
        .when(fr == best, "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        "lang",
        en.alias("score_en"),
        de.alias("score_de"),
        fr.alias("score_fr"),
        es.alias("score_es"),
        predicted.alias("predicted_lang"),
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: score = marker-word hits per language,
    predict argmax (deterministic tie-break: en > de > fr > es > unknown).
    """
    return language_id_from(table(spark, sf_dir, "documents"))


def _marker_re(lang: str) -> str:
    return r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"


ORACLE_LANGUAGE_ID = rf"""
WITH s AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(lower(text), '{_marker_re("en")}')) AS INT) AS score_en,
         CAST(len(regexp_extract_all(lower(text), '{_marker_re("de")}')) AS INT) AS score_de,
         CAST(len(regexp_extract_all(lower(text), '{_marker_re("fr")}')) AS INT) AS score_fr,
         CAST(len(regexp_extract_all(lower(text), '{_marker_re("es")}')) AS INT) AS score_es
  FROM documents
)
SELECT doc_id, lang, score_en, score_de, score_fr, score_es,
       CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'unknown'
            WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
            WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
            WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
            ELSE 'es' END AS predicted_lang
FROM s
"""


def fingerprint_col() -> F.Column:
    """Document fingerprint: md5 over normalized text. Used by exact dedup;
    at 100 TB this is the shuffle key for duplicate clustering."""
    return F.md5(_norm_text())


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint (md5 over normalized text) plus prefix bucket."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_col().alias("fingerprint"),
        F.substring(fingerprint_col(), 1, 8).alias("fingerprint_prefix"),
    )


ORACLE_FINGERPRINT = r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
       substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 8) AS fingerprint_prefix
FROM documents
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling
#
# Training pipelines downsample majority strata (e.g. English web text) and
# keep more of minority strata. Sampling must be DETERMINISTIC (reruns and
# retries pick the same rows — no rand()) and cheap (a pushable filter on a
# hash of the key, no shuffle). Rates here: keep 20% of 'en', 60% of
# everything else.

SAMPLE_RATE_EN = 20
SAMPLE_RATE_OTHER = 60

# 32-bit md5 prefix of the doc_id -> uniform bucket in [0, 100)
_BUCKET_SPARK = (
    "pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT), 100)"
)
_BUCKET_DUCK = "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100)"


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic stratified sample: one narrow filter, zero
    shuffles, fully pushable — the 100 TB shape (rand()-based sampling is
    neither deterministic nor retry-stable)."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    rate = F.when(F.col("lang") == "en", F.lit(SAMPLE_RATE_EN)).otherwise(
        F.lit(SAMPLE_RATE_OTHER)
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        bucket.cast("int").alias("bucket"),
        rate.alias("sample_rate"),
    ).filter(F.col("bucket") < F.col("sample_rate"))


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source,
       CAST({_BUCKET_DUCK} AS INT) AS bucket,
       CASE WHEN lang = 'en' THEN {SAMPLE_RATE_EN} ELSE {SAMPLE_RATE_OTHER} END AS sample_rate
FROM documents
WHERE {_BUCKET_DUCK} < CASE WHEN lang = 'en' THEN {SAMPLE_RATE_EN} ELSE {SAMPLE_RATE_OTHER} END
"""


# ---------------------------------------------------------------------------
# clean-corpus funnel: quality filter + language filter + exact dedup,
# composed into ONE single-shuffle aggregation — the end-to-end counts a
# pipeline run reports per source.

QUALITY_KEEP = 0.5


def quality_expr() -> F.Column:
    """The corpus-filter quality blend (rounded to 4) — the same formula
    ``q_corpus_clean_stats`` and the release funnel gate on, factored so
    the two stay in lockstep."""
    t = F.trim(F.col("text"))
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    words = F.size(F.split(t, r"\s+"))
    stop = F.regexp_count(F.lower(t), F.lit(r"\b(the|and|of|to|a|in|is|it)\b"))
    return F.round(
        (alpha / n_chars) * F.lit(0.5)
        + F.least(F.lit(1.0), stop.cast("double") / words * F.lit(10)) * F.lit(0.3)
        + F.least(F.lit(1.0), words.cast("double") / F.lit(100)) * F.lit(0.2),
        4,
    )


# DuckDB mirror of quality_expr() (bit-identical expression tree)
O_QUALITY_EXPR = (
    r"round((CAST(length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    r" / length(trim(text))) * 0.5"
    r" + least(1.0, CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|a|in|is|it)\b')) AS DOUBLE)"
    r" / len(regexp_split_to_array(trim(text), '\s+')) * 10) * 0.3"
    r" + least(1.0, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 100) * 0.2, 4)"
)


def q_corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source funnel: total docs -> docs passing quality+language
    filters -> distinct surviving fingerprints (what exact dedup would
    keep). One groupBy(source) = one shuffle; every signal is a built-in
    expression computed in the same scan pass."""
    docs = table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    words = F.size(F.split(t, r"\s+"))
    stop = F.regexp_count(F.lower(t), F.lit(r"\b(the|and|of|to|a|in|is|it)\b"))
    quality = F.round(
        (alpha / n_chars) * F.lit(0.5)
        + F.least(F.lit(1.0), stop.cast("double") / words * F.lit(10)) * F.lit(0.3)
        + F.least(F.lit(1.0), words.cast("double") / F.lit(100)) * F.lit(0.2),
        4,
    )
    keep = (quality >= QUALITY_KEEP) & (F.col("lang") != "unknown")
    return (
        docs.select(
            "source",
            keep.alias("keep"),
            F.when(keep, fingerprint_col()).alias("kept_fp"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum(F.col("keep").cast("bigint")).alias("filtered_docs"),
            F.countDistinct("kept_fp").alias("kept_docs"),
        )
    )


ORACLE_CORPUS_CLEAN = rf"""
WITH scored AS (
  SELECT source, lang,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         round((CAST(length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS DOUBLE)
                / length(trim(text))) * 0.5
               + least(1.0, CAST(len(regexp_extract_all(lower(trim(text)), '\b(the|and|of|to|a|in|is|it)\b')) AS DOUBLE)
                            / len(regexp_split_to_array(trim(text), '\s+')) * 10) * 0.3
               + least(1.0, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 100) * 0.2,
               4) AS quality
  FROM documents
)
SELECT source,
       count(*) AS total_docs,
       CAST(sum(CASE WHEN quality >= {QUALITY_KEEP} AND lang <> 'unknown' THEN 1 ELSE 0 END) AS BIGINT) AS filtered_docs,
       count(DISTINCT CASE WHEN quality >= {QUALITY_KEEP} AND lang <> 'unknown' THEN fp END) AS kept_docs
FROM scored
GROUP BY source
"""


# ---------------------------------------------------------------------------
# repetition scoring (Gopher-style repetition filters)
#
# Two standard signals for machine-generated / boilerplate text: the
# duplicate-2-gram fraction (1 - distinct 2-grams / total 2-grams) and the
# top-token fraction (occurrences of the most frequent token / all tokens).
# Both are computed ENTIRELY map-side with array higher-order functions —
# per-row codegen, zero shuffles, embarrassingly parallel at 100 TB. The
# top-token mode scan is O(distinct x total) per row, fine for web-scale
# documents (<~100k tokens); for pathological single-doc books switch to the
# explode + groupBy(doc_id, token) shape.

REPETITION_DUP2_FLAG = 0.5  # Gopher uses ~0.2 for real text; the synthetic
# corpus is a tiny-vocabulary word soup, so the flag threshold is looser


def repetition_score_from(docs: DataFrame) -> DataFrame:
    d = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    n = F.size(F.col("toks"))
    grams2 = F.expr(
        "transform(sequence(1, greatest(size(toks) - 1, 1), 1), "
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))"
    )
    top_cnt = F.expr(
        "array_max(transform(array_distinct(toks), t -> size(filter(toks, x -> x = t))))"
    )
    dup2 = F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams2)) / F.size(grams2), 4
    )
    return d.select(
        "doc_id",
        n.alias("token_count"),
        dup2.alias("dup_2gram_frac"),
        F.round(top_cnt / n, 4).alias("top_token_frac"),
        (dup2 >= REPETITION_DUP2_FLAG).alias("repetitive"),
    )


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-2-gram and top-token fractions, map-side."""
    return repetition_score_from(table(spark, sf_dir, "documents"))


ORACLE_REPETITION_SCORE = rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, toks,
         list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                        i -> concat_ws(' ', toks[i], toks[i + 1])) AS grams2
  FROM base
)
SELECT doc_id,
       len(toks) AS token_count,
       round(1.0 - CAST(len(list_distinct(grams2)) AS DOUBLE) / len(grams2), 4) AS dup_2gram_frac,
       round(CAST(list_max(list_transform(list_distinct(toks),
                   t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / len(toks), 4) AS top_token_frac,
       round(1.0 - CAST(len(list_distinct(grams2)) AS DOUBLE) / len(grams2), 4) >= {REPETITION_DUP2_FLAG} AS repetitive
FROM g
"""


# ---------------------------------------------------------------------------
# PII scan + redaction
#
# Regex surface is kept to the Java-regex ∩ RE2 subset so Spark and the
# DuckDB oracle match: no lookarounds, no backrefs. Pure per-row projection
# — zero shuffles. The synthetic corpus contains no PII (all counts 0 on the
# gate), so the detection path is additionally pinned by a planted-PII unit
# test that runs BOTH engines over the same literal rows.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"


def pii_scan_from(docs: DataFrame) -> DataFrame:
    t = F.col("text")
    emails = F.regexp_count(t, F.lit(PII_EMAIL_RE))
    phones = F.regexp_count(t, F.lit(PII_PHONE_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]"), PII_PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        emails.alias("email_count"),
        phones.alias("phone_count"),
        (emails + phones).alias("pii_count"),
        ((emails + phones) > 0).alias("has_pii"),
        redacted.alias("redacted_text"),
    )


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scan (emails/phones/ids) with per-doc hit counts."""
    return pii_scan_from(table(spark, sf_dir, "documents"))


ORACLE_PII_SCAN = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT) AS email_count,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS INT) AS phone_count,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) + len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS INT) AS pii_count,
       (len(regexp_extract_all(text, '{PII_EMAIL_RE}')) + len(regexp_extract_all(text, '{PII_PHONE_RE}'))) > 0 AS has_pii,
       regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g'), '{PII_PHONE_RE}', '[PHONE]', 'g') AS redacted_text
FROM documents
"""


# ---------------------------------------------------------------------------
# corpus composition report: share of docs and chars per (lang, source)
#
# The mix report that drives sampling-weight decisions. Shares need a global
# total — computed as a window over the AGGREGATED relation (|lang x source|
# rows, a few hundred at any corpus size), never over the raw docs, so the
# single-partition window is a no-op cost. One shuffle for the groupBy.


def q_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling-weight shares of the corpus mix."""
    docs = table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("n_chars"),
    )
    wall = Window.partitionBy()
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "n_chars",
        F.round(F.col("n_docs") / F.sum("n_docs").over(wall), 6).alias("doc_share"),
        F.round(F.col("n_chars") / F.sum("n_chars").over(wall), 6).alias("char_share"),
    )


ORACLE_CORPUS_MIX = """
WITH agg AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang, source
)
SELECT lang, source, n_docs, n_chars,
       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_share,
       round(CAST(n_chars AS DOUBLE) / sum(n_chars) OVER (), 6) AS char_share
FROM agg
"""


# ---------------------------------------------------------------------------
# sequence packing: concatenate-and-chunk into fixed context windows
#
# Training pipelines pack variable-length documents into fixed-size context
# windows. The distributed form: route each doc to a deterministic bucket
# (hash of doc_id — NOT round-robin, so retries are stable), order within
# the bucket by doc_id, take a running token cumsum, and derive the pack id
# and offset from the starting position — the standard concat-then-split
# packing where long docs straddle pack boundaries. One shuffle (bucket
# partitioning); packs are resolved by pure window arithmetic, no loop.
# Buckets keep windows small and independent: at 100 TB you raise
# PACK_BUCKETS to executor-count scale and each bucket packs in isolation.

CONTEXT_TOKENS = 256
PACK_BUCKETS = 8


def q_docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing via bucketed window cumsum (context-window filling)."""
    docs = table(spark, sf_dir, "documents")
    tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bucket = F.expr(
        f"pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT), {PACK_BUCKETS})"
    )
    base = docs.select(
        "doc_id", tok.alias("token_count"), bucket.cast("int").alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("token_count").over(w) - F.col("token_count")
    return base.select(
        "doc_id",
        "bucket",
        "token_count",
        start.alias("pack_start"),
    ).select(
        "doc_id",
        "bucket",
        "token_count",
        F.expr(f"pack_start DIV {CONTEXT_TOKENS}").cast("bigint").alias("pack_id"),
        F.expr(f"pack_start % {CONTEXT_TOKENS}").cast("bigint").alias("pack_offset"),
    )


ORACLE_PACK_SEQUENCES = rf"""
WITH base AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS token_count,
         CAST((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {PACK_BUCKETS}) AS INT) AS bucket
  FROM documents
),
pos AS (
  SELECT doc_id, bucket, token_count,
         CAST(sum(token_count) OVER (PARTITION BY bucket ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - token_count AS BIGINT) AS pack_start
  FROM base
)
SELECT doc_id, bucket, CAST(token_count AS INT) AS token_count,
       pack_start // {CONTEXT_TOKENS} AS pack_id,
       pack_start % {CONTEXT_TOKENS} AS pack_offset
FROM pos
"""


def q_docs_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report per bucket: how much of the training
    context budget the concat-and-chunk deal actually fills. Padding
    waste is wasted FLOPs — every training step pays for CONTEXT_TOKENS
    whether filled or not — and boundary-spanning documents get split
    across sequences (attention truncation), so both are costs a
    pipeline watches before committing a packing layout. Columns per
    bucket: docs, tokens, packs (ceil), padding tokens, fill ratio, and
    how many documents span a pack boundary.

    Composition: the totals are one narrow regroup of the same
    (doc, bucket, token_count) relation the packer uses; the spanning
    count reads the packer's own output (pack_offset + token_count >
    CONTEXT_TOKENS). Integer math everywhere except the single fill
    division at the output boundary."""
    docs = table(spark, sf_dir, "documents")
    tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bucket = F.expr(
        f"pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT), {PACK_BUCKETS})"
    )
    base = docs.select(tok.alias("token_count"), bucket.cast("int").alias("bucket"))
    totals = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").cast("bigint").alias("tokens"),
    )
    n_packs = F.expr(f"(tokens + {CONTEXT_TOKENS} - 1) DIV {CONTEXT_TOKENS}")
    spanning = (
        q_docs_pack_sequences(spark, sf_dir)
        .filter(F.col("pack_offset") + F.col("token_count") > CONTEXT_TOKENS)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("spanning_docs"))
    )
    return (
        totals.join(F.broadcast(spanning), "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            "tokens",
            n_packs.cast("bigint").alias("packs"),
            (n_packs * CONTEXT_TOKENS - F.col("tokens")).cast("bigint").alias(
                "padding_tokens"
            ),
            F.round(
                F.col("tokens") / (n_packs * CONTEXT_TOKENS).cast("double"), 4
            ).alias("fill_ratio"),
            F.coalesce(F.col("spanning_docs"), F.lit(0)).cast("bigint").alias(
                "spanning_docs"
            ),
        )
    )


ORACLE_PACK_EFFICIENCY = rf"""
WITH packed AS ({ORACLE_PACK_SEQUENCES}),
totals AS (
  SELECT bucket, count(*) AS n_docs, CAST(sum(token_count) AS BIGINT) AS tokens
  FROM packed GROUP BY bucket
),
spanning AS (
  SELECT bucket, count(*) AS spanning_docs
  FROM packed WHERE pack_offset + token_count > {CONTEXT_TOKENS}
  GROUP BY bucket
)
SELECT t.bucket, t.n_docs, t.tokens,
       CAST((t.tokens + {CONTEXT_TOKENS} - 1) // {CONTEXT_TOKENS} AS BIGINT) AS packs,
       CAST((t.tokens + {CONTEXT_TOKENS} - 1) // {CONTEXT_TOKENS} * {CONTEXT_TOKENS} - t.tokens AS BIGINT) AS padding_tokens,
       round(t.tokens * 1.0 / ((t.tokens + {CONTEXT_TOKENS} - 1) // {CONTEXT_TOKENS} * {CONTEXT_TOKENS}), 4) AS fill_ratio,
       CAST(COALESCE(s.spanning_docs, 0) AS BIGINT) AS spanning_docs
FROM totals t LEFT JOIN spanning s USING (bucket)
"""


# ---------------------------------------------------------------------------
# target-mix resampling: rebalance the corpus toward target language shares
#
# Data-mixing: given a target of EQUAL shares per language, languages over
# their target get hash-downsampled (deterministic, retry-stable — same
# md5-bucket mechanism as the stratified sample), languages under it are
# kept whole. Per-language totals come from one tiny aggregation that is
# broadcast back onto the corpus: the corpus itself never shuffles — the
# mix filter is a map-side predicate.


def q_docs_target_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing sampler: map-side keep filter toward a target mix."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_docs"))
    wall = Window.partitionBy()
    rates = counts.select(
        "lang",
        F.least(
            F.lit(100),
            F.floor(
                F.lit(100.0)
                * (F.sum("lang_docs").over(wall) / F.count(F.lit(1)).over(wall))
                / F.col("lang_docs")
            ).cast("int"),
        ).alias("keep_pct"),
    )
    bucket = F.expr(_BUCKET_SPARK)
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("keep_pct"))
        .select("doc_id", "lang", "source", "keep_pct")
    )


ORACLE_TARGET_MIX = f"""
WITH counts AS (SELECT lang, count(*) AS lang_docs FROM documents GROUP BY lang),
rates AS (
  SELECT lang,
         least(100, CAST(floor(100.0 * (sum(lang_docs) OVER () * 1.0 / count(*) OVER ())
                               / lang_docs) AS INT)) AS keep_pct
  FROM counts
)
SELECT doc_id, d.lang, source, keep_pct
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {_BUCKET_DUCK} < keep_pct
"""


# ---------------------------------------------------------------------------
# ranked quality: percent_rank + quartile within each source
#
# The corpus-filtering decision is usually RELATIVE ("drop the worst decile
# per source"), not an absolute threshold — per-source ranking normalizes
# away source-level quality offsets. percent_rank and ntile are the two
# window functions the suite did not yet cover; the (score, doc_id) order
# is total (unique tiebreaker), so both are deterministic and the exact
# (rank-1)/(n-1) arithmetic is identical across engines.
#
# Scale shape: one shuffle keyed on source; a skewed giant source makes the
# window sort that partition's cost — at real scale pre-bucket by (source,
# hash(doc_id) range) and rank with a two-pass merge, same as any global
# sort decomposition.


def q_quality_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score percent_rank/ntile distribution columns."""
    docs = table(spark, sf_dir, "documents")
    scored = q_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .select(
            "doc_id",
            "source",
            "quality_score",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )


ORACLE_QUALITY_PERCENT_RANK = rf"""
WITH scored AS ({ORACLE_QUALITY_SCORE}),
j AS (
  SELECT s.doc_id, d.source, s.quality_score
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT doc_id, source, quality_score,
       round(percent_rank() OVER (PARTITION BY source
                                  ORDER BY quality_score ASC, doc_id ASC), 6) AS pct_rank,
       ntile(4) OVER (PARTITION BY source
                      ORDER BY quality_score ASC, doc_id ASC) AS quartile
FROM j
"""


# ---------------------------------------------------------------------------
# Python-lane verification pair: vectorized pandas_udf and Python UDTF
#
# The engine's rule is "built-ins first" — but when Python IS needed, it
# must be just as correct. These two queries put the remaining Python
# execution surfaces under the DuckDB value gate (mapInPandas and
# applyInPandas are covered in operators/multimodal.py):
#
# - ``@pandas_udf``: Arrow-vectorized scalar UDF — one Series in, one
#   Series out, no per-row Python dispatch;
# - ``@udtf``: Python table function — one input row, many output rows,
#   lateral-joined.
#
# Both compute integer/string-exact results a SQL oracle replicates.

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


def _vowel_count_fn(texts: pd.Series) -> pd.Series:
    return texts.str.count(r"[aeiouAEIOU]").astype("int64")


def q_text_vowel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf lane: per-doc vowel statistics, oracle-gated."""
    # wrapped at call time: the decorator parses its DDL return type through
    # the active session, so decorating at import would demand a
    # SparkContext before any caller created one
    vowel_count = pandas_udf(_vowel_count_fn, "long")
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        vowel_count(F.col("text")).alias("n_vowels"),
        F.length(F.trim(F.col("text"))).cast("long").alias("n_chars_obs"),
    )


ORACLE_VOWEL_STATS = r"""
SELECT doc_id,
       CAST(length(text) - length(regexp_replace(text, '[aeiouAEIOU]', '', 'g')) AS BIGINT) AS n_vowels,
       CAST(length(trim(text)) AS BIGINT) AS n_chars_obs
FROM documents
"""

HEAD_TOKENS = 5


class _HeadTokens:
    """Yield (1-based position, token) for the first HEAD_TOKENS whitespace
    tokens of the input text."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        for i, tok in enumerate(text.strip().split()):
            if i >= HEAD_TOKENS:
                break
            yield i + 1, tok


def q_text_head_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via lateral join: first tokens per document, position-indexed."""
    head_tokens = udtf(_HeadTokens, returnType="pos int, token string")
    docs = table(spark, sf_dir, "documents")
    return docs.lateralJoin(
        head_tokens(F.col("text").outer())
    ).select("doc_id", "pos", "token")


ORACLE_HEAD_TOKENS = rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
  FROM documents
  -- empty/whitespace-only text yields NO rows on both engines: Python's
  -- str.split() returns [] there, while an unguarded regexp_split_to_array
  -- would emit a single '' token (latent gate mismatch; ADVICE r3)
  WHERE trim(text) <> ''
)
SELECT doc_id,
       CAST(unnest(range(1, least({HEAD_TOKENS}, len(arr)) + 1)) AS INT) AS pos,
       unnest(list_slice(arr, 1, least({HEAD_TOKENS}, len(arr)))) AS token
FROM base
"""


def q_source_char_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf lane: per-source total characters via a
    pandas Series aggregation (one Series per group in, one scalar out).
    Integer sum — exact on any partitioning — checked against the SQL
    sum oracle."""

    def total_chars_fn(n: pd.Series) -> int:
        return int(n.sum())

    total_chars = pandas_udf(total_chars_fn, "long")
    docs = table(spark, sf_dir, "documents").select(
        "source", F.length(F.trim(F.col("text"))).cast("long").alias("n_chars")
    )
    return docs.groupBy("source").agg(total_chars(F.col("n_chars")).alias("total_chars"))


ORACLE_SOURCE_CHAR_BUDGET = """
SELECT source, CAST(sum(length(trim(text))) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
"""


# ---------------------------------------------------------------------------
# auto-label QA: agreement between the stored `lang` label and the
# language-ID prediction — per-class accuracy plus global Cohen's kappa.
#
# The QA step every auto-labeled corpus needs before the labels feed
# filtering or mixing decisions: a confusion-cell aggregation (ONE shuffle
# of (label, prediction) integer pairs, map-side combined), then the kappa
# from exact integer sufficient statistics. With row/column/diagonal sums
# r_i, c_i, d and N = sum(r_i):
#     kappa = (N*d - sum(r_i*c_i)) / (N^2 - sum(r_i*c_i))
# Products compute in DECIMAL (operands DECIMAL(19,0) -> exact
# DECIMAL(38,0) on both engines — same recipe as quantity_dispersion), and
# the emitted cells are INTEGRAL quotients (kappa_micro = num*1e6 div den,
# accuracy_bp = n_correct*1e4 div n_docs; Spark `div` and DuckDB `//`
# both truncate toward zero) — no double division anywhere, so the value
# is bit-stable across engines/libm to ~1e12 docs (the 1e6 scale factor
# spends 7 of DECIMAL(38,0)'s digits). The per-class relation is bounded
# by |label alphabet|, so the scalar fold is metadata-sized at any corpus
# scale.


def q_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-label QA: exact-integer Cohen's kappa between declared and predicted language."""
    pred = q_language_id(spark, sf_dir).select("doc_id", "lang", "predicted_lang")
    # cells is alphabet²-bounded (tiny) but derives from the full-corpus
    # regex scan; materialize it so per_lang and per_pred don't each
    # re-run the language-ID pass over the corpus
    cells = cache_eager(
        pred.groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("c"))
    )
    per_lang = cells.groupBy("lang").agg(
        F.sum("c").alias("n_docs"),
        F.sum(
            F.when(F.col("predicted_lang") == F.col("lang"), F.col("c")).otherwise(0)
        ).alias("n_correct"),
    )
    per_pred = cells.groupBy("predicted_lang").agg(F.sum("c").alias("col_n"))
    # full outer on the label alphabet: 'unknown' occurs only as a
    # prediction, and a label with zero predictions still contributes
    # row_i * 0 to pe
    margins = per_lang.join(
        per_pred, per_lang["lang"] == per_pred["predicted_lang"], "full_outer"
    ).select(
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("decimal(19,0)").alias("r"),
        F.coalesce(F.col("col_n"), F.lit(0)).cast("decimal(19,0)").alias("col_c"),
        F.coalesce(F.col("n_correct"), F.lit(0)).alias("d"),
    )
    glob = margins.agg(
        F.sum("r").cast("decimal(19,0)").alias("n"),
        F.sum("d").cast("decimal(19,0)").alias("diag"),
        F.sum(F.col("r") * F.col("col_c")).cast("decimal(38,0)").alias("pe_sum"),
    )
    # exact end-to-end: scale the DECIMAL numerator by 1e6 (fits
    # DECIMAL(38,0) to ~1e12 docs) and take the integral quotient — Spark
    # `div` and DuckDB `//` both truncate toward zero, so the emitted cell
    # is integer-derived on both engines (the r4 driver-red fix)
    # nullif guards: n*n = pe_sum only for a degenerate single-cell corpus
    # (every doc one label, predicted identically) and n_docs = 0 can't
    # occur for a grouped row — but under the driver's ANSI-on session a
    # zero divisor would CRASH rather than yield NULL, so guard anyway
    # (FLOATS.md class E); DuckDB's `//` yields NULL on zero, matching.
    kappa_micro = F.expr(
        "((n * diag - pe_sum) * 1000000) div nullif(n * n - pe_sum, 0)"
    ).cast("bigint")
    glob_row = glob.select(kappa_micro.alias("kappa_micro"))
    accuracy_bp = F.expr(
        "(CAST(n_correct AS DECIMAL(38,0)) * 10000) div nullif(n_docs, 0)"
    ).cast("bigint")
    return (
        per_lang.crossJoin(F.broadcast(glob_row))
        .select(
            "lang",
            "n_docs",
            "n_correct",
            accuracy_bp.alias("accuracy_bp"),
            "kappa_micro",
        )
        .orderBy("lang")
    )


ORACLE_LABEL_AGREEMENT = f"""
WITH pred AS ({ORACLE_LANGUAGE_ID}),
cells AS (
  SELECT lang, predicted_lang, count(*) AS c FROM pred GROUP BY 1, 2
),
per_lang AS (
  SELECT lang, sum(c) AS n_docs,
         sum(CASE WHEN predicted_lang = lang THEN c ELSE 0 END) AS n_correct
  FROM cells GROUP BY 1
),
per_pred AS (
  SELECT predicted_lang, sum(c) AS col_n FROM cells GROUP BY 1
),
margins AS (
  SELECT CAST(COALESCE(n_docs, 0) AS DECIMAL(19,0)) AS r,
         CAST(COALESCE(col_n, 0) AS DECIMAL(19,0)) AS col_c,
         COALESCE(n_correct, 0) AS d
  FROM per_lang FULL OUTER JOIN per_pred ON lang = predicted_lang
),
overall AS (
  SELECT CAST(sum(r) AS DECIMAL(19,0)) AS n,
         CAST(sum(d) AS DECIMAL(19,0)) AS diag,
         CAST(sum(r * col_c) AS DECIMAL(38,0)) AS pe_sum
  FROM margins
)
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_correct AS BIGINT) AS n_correct,
       CAST((CAST(n_correct AS HUGEINT) * 10000) // CAST(n_docs AS HUGEINT) AS BIGINT) AS accuracy_bp,
       CAST((CAST(n * diag - pe_sum AS HUGEINT) * 1000000) // CAST(n * n - pe_sum AS HUGEINT) AS BIGINT) AS kappa_micro
FROM per_lang, overall
ORDER BY lang
"""


def q_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 for the auto-label QA pass — the
    drill-down next to ``label_agreement_kappa``'s single global number:
    which classes the language-ID model confuses, read per class before a
    pipeline trusts per-language filtering decisions.

    All emitted cells are integral: with per-class actual total a_k,
    predicted total p_k, and diagonal tp_k (exact confusion-cell counts),
    precision_bp = tp*1e4 div p_k, recall_bp = tp*1e4 div a_k, and
    f1_bp = 2*tp*1e4 div (a_k + p_k) — the micro identity
    F1 = 2TP/(2TP+FP+FN) with denominator a_k + p_k — so no double
    division exists anywhere (FLOATS.md class A). Every divisor is wrapped
    in ``nullif(x, 0)``: a class that is never predicted (e.g. ``zh``,
    which has no LANG_MARKERS entry) has n_predicted = 0, and Spark's
    ANSI mode (the driver's default) would otherwise raise
    DIVIDE_BY_ZERO where DuckDB's ``//`` yields NULL — the nullif makes
    both engines emit NULL under either ANSI setting (FLOATS.md class E,
    evaluation-environment hazard).

    Scale shape: one (label, prediction) confusion-cell aggregation over
    the corpus scan (map-side combined, alphabet²-bounded output); the
    class margins and the report are metadata-sized regroups of those
    cells — same shape as kappa, which shares the cached cells relation
    at the operator level."""
    pred = q_language_id(spark, sf_dir).select("doc_id", "lang", "predicted_lang")
    cells = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    actual = cells.groupBy(F.col("lang").alias("klass")).agg(
        F.sum("c").alias("n_actual"),
        F.sum(
            F.when(F.col("predicted_lang") == F.col("lang"), F.col("c")).otherwise(0)
        ).alias("tp"),
    )
    predicted = cells.groupBy(F.col("predicted_lang").alias("klass")).agg(
        F.sum("c").alias("n_predicted")
    )
    return (
        actual.join(predicted, "klass", "full_outer")
        .select(
            "klass",
            F.coalesce(F.col("n_actual"), F.lit(0)).cast("bigint").alias("n_actual"),
            F.coalesce(F.col("n_predicted"), F.lit(0))
            .cast("bigint")
            .alias("n_predicted"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
        )
        .select(
            "klass",
            "n_actual",
            "n_predicted",
            "tp",
            # bp cells are DOUBLE, not BIGINT: they carry NULL (a class
            # never predicted has no precision), and pandas promotes a
            # NULL-bearing int column to float64 on BOTH engines — the
            # only NULL-in-numeric pattern with green driver precedent
            # (events_anomaly_hours.z_score, revenue_mom_delta.mom_delta)
            # pairs oracle float64 with Spark double. The values stay
            # exact: each is an integral `div` quotient < 2^53.
            F.expr("tp * 10000 div nullif(n_predicted, 0)")
            .cast("double")
            .alias("precision_bp"),
            F.expr("tp * 10000 div nullif(n_actual, 0)")
            .cast("double")
            .alias("recall_bp"),
            F.expr("2 * tp * 10000 div nullif(n_actual + n_predicted, 0)")
            .cast("double")
            .alias("f1_bp"),
        )
        .orderBy("klass")
    )


ORACLE_LABEL_CONFUSION = f"""
WITH pred AS ({ORACLE_LANGUAGE_ID}),
cells AS (
  SELECT lang, predicted_lang, count(*) AS c FROM pred GROUP BY 1, 2
),
actual AS (
  SELECT lang AS klass, sum(c) AS n_actual,
         sum(CASE WHEN predicted_lang = lang THEN c ELSE 0 END) AS tp
  FROM cells GROUP BY 1
),
predicted AS (
  SELECT predicted_lang AS klass, sum(c) AS n_predicted FROM cells GROUP BY 1
),
margins AS (
  SELECT COALESCE(a.klass, p.klass) AS klass,
         CAST(COALESCE(n_actual, 0) AS BIGINT) AS n_actual,
         CAST(COALESCE(n_predicted, 0) AS BIGINT) AS n_predicted,
         CAST(COALESCE(tp, 0) AS BIGINT) AS tp
  FROM actual a FULL OUTER JOIN predicted p ON a.klass = p.klass
)
SELECT klass, n_actual, n_predicted, tp,
       CAST(tp * 10000 // nullif(n_predicted, 0) AS DOUBLE) AS precision_bp,
       CAST(tp * 10000 // nullif(n_actual, 0) AS DOUBLE) AS recall_bp,
       CAST(2 * tp * 10000 // nullif(n_actual + n_predicted, 0) AS DOUBLE) AS f1_bp
FROM margins
ORDER BY klass
"""


# ---------------------------------------------------------------------------
# deterministic quality-weighted sampling: keep a document with probability
# equal to its quality score — the upsample/downsample step a pretraining
# mix applies after scoring. The coin is md5(doc_id)-derived (uniform in
# [0,1), engine-replicable, stable across runs/partitionings), so the
# "sample" is exact, reproducible, and a pure map over the scored relation
# — zero additional shuffles, and the SAME doc set survives on any cluster
# layout.


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli(quality) sampling — an md5 coin per doc, no RNG state."""
    q = q_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    u = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    ) / F.lit(4294967296.0)
    return (
        q.withColumn("__u", u)
        .filter(F.col("__u") < F.col("quality_score"))
        .select(
            "doc_id",
            "quality_score",
            (F.floor(F.col("__u") * F.lit(1000000.0)) / F.lit(1000000.0)).alias("u"),
        )
    )


ORACLE_WEIGHTED_SAMPLE = f"""
WITH q AS ({ORACLE_QUALITY_SCORE}),
coin AS (
  SELECT doc_id, quality_score,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 AS u_exact
  FROM q
)
SELECT doc_id, quality_score,
       floor(u_exact * 1000000) / 1000000 AS u
FROM coin WHERE u_exact < quality_score
"""


# ---------------------------------------------------------------------------
# Efraimidis-Spirakis weighted sampling WITHOUT replacement: the
# one-pass, merge-friendly way to draw a K-doc quality-weighted sample
# at any scale — each doc gets key u^(1/w) (equivalently ln(u)/w) and
# the global top-K by key IS the weighted sample (Efraimidis & Spirakis
# 2006). Bernoulli q_docs_weighted_sample draws each doc independently
# (sample size varies); this draws EXACTLY K, the shape an eval-set or
# annotation-batch builder needs. u is the same md5 coin as the
# Bernoulli lane shifted to (0, 1] (h + 1, so ln never sees 0); the key
# is quantized ONCE per row (floor to micro — the class-C single-ln
# discipline), every comparison after that is integer.

AES_TOP_K = 20


def q_docs_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-AES_TOP_K weighted sample without replacement: rank, doc_id,
    quality_score (the weight), and the quantized E-S key (micro).
    Zero-weight docs are excluded (they cannot be drawn).

    Scale shape: one map-side key derivation over the quality featurize,
    TakeOrderedAndProject for the global top-K, a rank window only on
    the bounded K-row result. The key property that matters at 100 TB:
    top-K by key is MERGEABLE across partitions/shards — the same
    reason the sketch family is."""
    q = q_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    u = (
        "((CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT) + 1) / 4294967296.0D)"
    )
    top = (
        q.filter("quality_score > 0")
        .selectExpr(
            "doc_id",
            "quality_score",
            f"CAST(floor(ln({u}) / quality_score * 1000000.0D) AS BIGINT)"
            " AS key_micro",
        )
        .orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
        .limit(AES_TOP_K)
    )
    w_rank = Window.orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(w_rank).cast("bigint").alias("rank"),
        "doc_id",
        "quality_score",
        "key_micro",
    ).orderBy("rank")


ORACLE_WEIGHTED_TOPK_SAMPLE = f"""
WITH q AS ({ORACLE_QUALITY_SCORE}),
keyed AS (
  SELECT doc_id, quality_score,
         CAST(floor(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1) / 4294967296.0)
              / quality_score * 1000000.0) AS BIGINT) AS key_micro
  FROM q WHERE quality_score > 0
),
top AS (
  SELECT * FROM keyed ORDER BY key_micro DESC, doc_id ASC LIMIT {AES_TOP_K}
)
SELECT CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id ASC) AS BIGINT)
         AS rank,
       doc_id, quality_score, key_micro
FROM top
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Good-Turing frequency smoothing: the frequency-of-frequencies table and
# the adjusted counts r* = (r+1) N_{r+1} / N_r — the classic estimator of
# how much probability mass belongs to UNSEEN tokens (p0 = N_1 / N), the
# number an LM builder checks before choosing a smoothing scheme (raw GT
# on the dense low-r bands; the Gale-Sampson SGT ln-fit is deliberately
# avoided — ln would put the cells in FLOATS.md class C, while this form
# is all-integer class D). Complements kn_bigram_smoothing (which fixes
# the discount) and zipf_slope_fit (the shape of the same tail).

GT_MAX_R = 10


def q_token_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GT_MAX_R LOWEST r-bands PRESENT in the corpus: token types
    seen exactly r times (n_r), types seen r+1 times, the Good-Turing
    adjusted count r* in milli ((r+1) * N_{r+1} * 1000 DIV N_r), and
    (repeated) the corpus totals: token count and the unseen-mass
    estimate N_1/N in permille. "Lowest bands present" rather than a
    fixed r <= GT_MAX_R cut: a generated corpus whose rarest token
    still occurs dozens of times has NO band under 10, and a fixed cut
    would gate a hash over emptiness (the r11 verdict's exact finding)
    — the low end of whatever spectrum exists is where the GT estimator
    is meaningful, at any corpus scale. On sparse spectra n_{r+1} is
    honestly 0 for most present bands (raw GT, no smoothing fit).

    Scale shape: one token explode + (token)-keyed count (the vocabulary
    shuffle every LM statistic pays, map-side combined), one regroup of
    the vocabulary relation to the frequency-of-frequencies table
    (bounded by |distinct counts|), then bounded self-join + 1-row
    totals attach on that metadata-sized relation."""
    docs = spread(table(spark, sf_dir, "documents"))
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    ).filter("t != ''")
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    fof = cache_eager(
        vocab.groupBy("r").agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    )
    glob = fof.agg(
        F.expr("CAST(sum(r * n_r) AS BIGINT)").alias("total_tokens"),
        # no singleton band => the GT unseen-mass estimate is honestly 0
        F.expr(
            "CAST(COALESCE(sum(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT)"
        ).alias("n1"),
    )
    nxt = fof.selectExpr("r - 1 AS r", "n_r AS n_r_plus_1")
    return (
        fof.orderBy("r").limit(GT_MAX_R)
        .join(nxt, "r", "left_outer")
        .crossJoin(F.broadcast(glob))
        .selectExpr(
            "r",
            "n_r",
            "COALESCE(n_r_plus_1, 0) AS n_r_plus_1",
            "CAST((r + 1) * COALESCE(n_r_plus_1, 0) * 1000 DIV n_r"
            " AS BIGINT) AS r_star_milli",
            "total_tokens",
            "CAST(n1 * 1000 DIV total_tokens AS BIGINT)"
            " AS unseen_mass_permille",
        )
        .orderBy("r")
    )


ORACLE_TOKEN_GOOD_TURING = rf"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
),
vocab AS (
  SELECT t, CAST(count(*) AS BIGINT) AS r FROM tok WHERE t != '' GROUP BY 1
),
fof AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM vocab GROUP BY 1
),
gstats AS (
  SELECT CAST(sum(r * n_r) AS BIGINT) AS total_tokens,
         CAST(COALESCE(sum(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT) AS n1
  FROM fof
),
nxt AS (SELECT r - 1 AS r, n_r AS n_r_plus_1 FROM fof),
low AS (SELECT * FROM fof ORDER BY r LIMIT {GT_MAX_R})
SELECT low.r,
       n_r,
       COALESCE(n_r_plus_1, 0) AS n_r_plus_1,
       CAST((low.r + 1) * COALESCE(n_r_plus_1, 0) * 1000 // n_r AS BIGINT)
         AS r_star_milli,
       total_tokens,
       CAST(n1 * 1000 // total_tokens AS BIGINT) AS unseen_mass_permille
FROM low LEFT OUTER JOIN nxt ON low.r = nxt.r, gstats
ORDER BY 1
"""


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: OLS slope of ln(freq) on ln(rank) over
    the token frequency spectrum — the companion diagnostic to
    ``docs_vocab_growth``'s Heaps curve. Natural text sits near slope -1;
    a much flatter slope means templated/duplicated text (the frequency
    mass is spread), a much steeper one means a degenerate vocabulary —
    either way the mix decision reads off this number.

    Determinism (FLOATS.md class C + class A): the two ln() calls are
    quantized ONCE per token row to integer micro-nats; the OLS
    sufficient statistics (n, Sx, Sy, Sxy, Sxx) are then DECIMAL(38,0)
    integer sums (associative on any plan), and the slope is one integral
    quotient: slope_micro = (n*Sxy - Sx*Sy) * 1e6 div (n*Sxx - Sx*Sx) —
    headroom to ~1e11 types per source inside DECIMAL(38,0)/HUGEINT.

    Scale shape: one (source, token) aggregation over the corpus scan
    (map-side combined); ranking + regression run on the vocabulary-
    bounded frequency relation (the per-source window sorts vocab rows,
    not corpus rows); one row per source out."""
    return zipf_slope_from(spread(table(spark, sf_dir, "documents")))


def zipf_slope_from(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    freqs = (
        toks.filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rank = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("c").desc(), "token")
    )
    pts = freqs.withColumn("r", rank).select(
        "source",
        F.floor(F.log(F.col("r").cast("double")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("y"),
    )
    stats = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    return stats.select(
        "source",
        F.col("n").cast("bigint").alias("n_types"),
        # n*sxx = sx*sx exactly when every rank collapses to one x value
        # (single-type vocabulary); ANSI-on would crash on the zero
        # divisor, nullif makes both engines emit NULL (FLOATS.md class E)
        F.expr("((n * sxy - sx * sy) * 1000000) div nullif(n * sxx - sx * sx, 0)")
        .cast("bigint")
        .alias("zipf_slope_micro"),
    ).orderBy("source")


ORACLE_ZIPF_SLOPE = r"""
WITH freqs AS (
  SELECT source, token, count(*) AS c FROM (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
  )
  WHERE token != ''
  GROUP BY source, token
),
pts AS (
  SELECT source,
         CAST(floor(ln(CAST(row_number() OVER (PARTITION BY source ORDER BY c DESC, token) AS DOUBLE)) * 1000000) AS HUGEINT) AS x,
         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS HUGEINT) AS y
  FROM freqs
),
stats AS (
  SELECT source,
         CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_types,
       CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx) AS BIGINT) AS zipf_slope_micro
FROM stats
ORDER BY source
"""


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row-per-source DATASET CARD: the summary table a corpus
    release ships next to the data — volume (docs, tokens, vocabulary),
    exact-duplicate load, label purity (majority declared language and
    its share), and the Zipf slope diagnostic, all in one relation. A
    consumer reads mixing weights and red flags off this card before any
    per-document work; every number is re-derivable because each column
    is the head of an already-gated operator (exact dedup, zipf fit).

    Every cell is integer or string: token/doc/type counts, integral
    basis-point shares, micro-unit slope (FLOATS.md class A over the
    class-C zipf column).

    Scale shape: ONE cached corpus scan feeds all four component
    aggregations (doc stats, token stats, lang counts, and the
    vocabulary-bounded zipf fit), each reduced to |sources| rows before
    a metadata-sized 4-way join — the joins move a handful of rows
    regardless of corpus size."""
    from ..cachereg import cache_eager

    docs = cache_eager(spread(table(spark, sf_dir, "documents")))
    norm_md5 = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    )
    doc_stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(norm_md5).alias("distinct_docs"),
    )
    toks = spread(docs).select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    tok_stats = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").alias("n_types"),
    )
    lang_counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("ln")
    )
    pick = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("ln").desc(), "lang")
    )
    majority = (
        lang_counts.withColumn("pick", pick)
        .filter(F.col("pick") == 1)
        .select(
            "source",
            F.col("lang").alias("majority_lang"),
            F.col("ln").alias("m_ln"),
        )
    )
    zipf = zipf_slope_from(docs).select("source", "zipf_slope_micro")
    return (
        doc_stats.join(tok_stats, "source")
        .join(majority, "source")
        .join(zipf, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_types",
            F.expr("n_tokens div n_docs").cast("bigint").alias("mean_doc_tokens"),
            (F.col("n_docs") - F.col("distinct_docs"))
            .cast("bigint")
            .alias("exact_dup_docs"),
            "majority_lang",
            F.expr("m_ln * 10000 div n_docs").cast("bigint").alias("majority_lang_bp"),
            "zipf_slope_micro",
        )
        .orderBy("source")
    )


ORACLE_DATASET_CARD = rf"""
WITH doc_stats AS (
  SELECT source, count(*) AS n_docs,
         count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS distinct_docs
  FROM documents GROUP BY source
),
tok_stats AS (
  SELECT source, count(*) AS n_tokens, count(DISTINCT t) AS n_types
  FROM (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents
  )
  WHERE t != ''
  GROUP BY source
),
majority AS (
  SELECT source, lang AS majority_lang, ln FROM (
    SELECT source, lang, count(*) AS ln,
           row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS pick
    FROM documents GROUP BY source, lang
  ) WHERE pick = 1
),
zipf AS ({ORACLE_ZIPF_SLOPE.replace("ORDER BY source", "")})
SELECT d.source, n_docs, n_tokens, t.n_types,
       CAST(n_tokens // n_docs AS BIGINT) AS mean_doc_tokens,
       CAST(n_docs - distinct_docs AS BIGINT) AS exact_dup_docs,
       majority_lang,
       CAST(ln * 10000 // n_docs AS BIGINT) AS majority_lang_bp,
       zipf_slope_micro
FROM doc_stats d
JOIN tok_stats t ON d.source = t.source
JOIN majority m ON d.source = m.source
JOIN zipf z ON d.source = z.source
ORDER BY d.source
"""


def q_docs_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document FEATURE MATRIX a quality classifier trains on:
    every text signal the engine computes, joined into one wide
    doc_id-keyed relation — token/char/subword volume, quality ratios,
    language prediction + label agreement, repetition fractions, and the
    bigram-LM log-probs. This is the materialize-once export feeding
    fastText/logreg-style quality models and the ablation dashboards
    next to them; each column is the head of an already-gated query, so
    the matrix inherits their determinism classes unchanged.

    Scale shape: ONE cached corpus scan feeds every component (each
    ``*_from`` builder reads the shared in-memory relation — the
    materialized-once shape; without the cache this export would scan
    the corpus five times), and the join is doc_id-keyed co-partitioned
    all the way. The LM score's model aggregations also read the cache.
    LM columns are NULL for <2-token docs (left join), stated
    identically in the oracle."""
    from ..cachereg import cache_eager

    docs = cache_eager(spread(table(spark, sf_dir, "documents")))
    ts = token_stats_from(docs).select(
        "doc_id", "token_count", "char_count", "subword_count", "avg_token_len"
    )
    qs = quality_score_from(docs).select(
        "doc_id", "alpha_ratio", "stopword_ratio", "quality_score"
    )
    li = language_id_from(docs).select(
        "doc_id",
        "predicted_lang",
        (F.col("predicted_lang") == F.col("lang")).cast("int").alias("lang_match"),
    )
    rep = repetition_score_from(docs).select(
        "doc_id", "dup_2gram_frac", "top_token_frac"
    )
    lm = text_lm_score_from(docs).select(
        "doc_id", "avg_logprob", "min_logprob"
    )
    return (
        ts.join(qs, "doc_id")
        .join(li, "doc_id")
        .join(rep, "doc_id")
        .join(lm, "doc_id", "left")
    )


def _oracle_feature_matrix() -> str:
    return f"""
WITH ts AS ({ORACLE_TOKEN_STATS}),
qs AS ({ORACLE_QUALITY_SCORE}),
li AS ({ORACLE_LANGUAGE_ID}),
rep AS ({ORACLE_REPETITION_SCORE}),
lm AS ({ORACLE_TEXT_LM_SCORE})
SELECT ts.doc_id, ts.token_count, ts.char_count, ts.subword_count, ts.avg_token_len,
       qs.alpha_ratio, qs.stopword_ratio, qs.quality_score,
       li.predicted_lang,
       CAST(li.predicted_lang = li.lang AS INT) AS lang_match,
       rep.dup_2gram_frac, rep.top_token_frac,
       lm.avg_logprob, lm.min_logprob
FROM ts
JOIN qs ON ts.doc_id = qs.doc_id
JOIN li ON ts.doc_id = li.doc_id
JOIN rep ON ts.doc_id = rep.doc_id
LEFT JOIN lm ON ts.doc_id = lm.doc_id
"""


def q_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain shift between sources: KL(P_s1 || P_s2) over unigram
    distributions, in integer micro-nats, for every ordered source pair —
    the quantitative answer to "how different is this corpus slice from
    that one" that drives mixing and domain-adaptation decisions (a near-
    zero KL pair is redundant data; an extreme pair needs its own mixing
    weight). Laplace add-1 smoothing on the reference side keeps the
    quotient finite off-support.

    Determinism (FLOATS.md class C): per (token, pair) row ONE ln of the
    exact rational c1*(T2+V) / (T1*(c2+1)) is floor-quantized to integer
    micro-nats; the weighted sum c1*lnq accumulates in DECIMAL(38,0); the
    final division by T1 is integral. BIGINT->double conversion and the
    IEEE division feeding ln are bit-identical on both engines.

    Scale shape: one (source, token) aggregation over the corpus scan;
    everything after runs on the vocabulary-bounded count relation —
    the pair expansion is |vocab_s1| x |sources| rows (sources are a
    handful), joined per (token, source) with no broadcast hints needed
    beyond the |sources|-row totals."""
    docs = table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    counts = cache_eager(
        toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    vocab_n = counts.select("token").distinct().count()  # scalar metadata probe
    a = counts.join(totals, "source").select(
        F.col("source").alias("s1"), "token", F.col("c").alias("c1"),
        F.col("t").alias("t1"),
    )
    bt = totals.select(F.col("source").alias("s2"), F.col("t").alias("t2"))
    bc = counts.select(
        F.col("source").alias("s2c"),
        F.col("token").alias("tok2"),
        F.col("c").alias("c2"),
    )
    base = a.join(F.broadcast(bt), F.col("s1") != F.col("s2"))
    j = base.join(
        bc,
        (F.col("s2") == F.col("s2c")) & (F.col("token") == F.col("tok2")),
        "left",
    ).select(
        "s1", "s2", "c1", "t1", "t2",
        F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
    )
    # cast each factor to double BEFORE multiplying: the BIGINT products
    # c1*(t2+V) and t1*(c2+1) would overflow (ANSI: error; non-ANSI:
    # silent wrap) once counts approach 2^63 — double*double is one IEEE
    # correctly-rounded op, bit-identical on both engines, and each
    # factor individually is exact in double far past any real corpus
    lnq = F.floor(
        F.log(
            (
                F.col("c1").cast("double")
                * (F.col("t2") + F.lit(vocab_n)).cast("double")
            )
            / (
                F.col("t1").cast("double")
                * (F.col("c2") + 1).cast("double")
            )
        )
        * 1_000_000
    ).cast("decimal(38,0)")
    return (
        j.select("s1", "s2", (F.col("c1").cast("decimal(38,0)") * lnq).alias("w"), "t1")
        .groupBy("s1", "s2")
        .agg(
            F.sum("w").alias("sw"),
            F.max("t1").alias("t1"),
        )
        .select(
            "s1",
            "s2",
            F.expr("sw div t1").cast("bigint").alias("kl_micro_nats"),
        )
        .orderBy("s1", "s2")
    )


ORACLE_SOURCE_KL = r"""
WITH counts AS (
  SELECT source, token, count(*) AS c FROM (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
  )
  WHERE token != ''
  GROUP BY source, token
),
totals AS (SELECT source, sum(c) AS t FROM counts GROUP BY source),
v AS (SELECT count(DISTINCT token) AS vn FROM counts),
j AS (
  SELECT a.source AS s1, bt.source AS s2, a.c AS c1, ta.t AS t1, bt.t AS t2,
         COALESCE(bc.c, 0) AS c2, vn
  FROM counts a
  JOIN totals ta ON a.source = ta.source
  JOIN totals bt ON bt.source != a.source
  LEFT JOIN counts bc ON bc.source = bt.source AND bc.token = a.token
  CROSS JOIN v
),
terms AS (
  SELECT s1, s2, t1,
         CAST(c1 AS HUGEINT) * CAST(floor(ln(
           (CAST(c1 AS DOUBLE) * CAST(t2 + vn AS DOUBLE))
           / (CAST(t1 AS DOUBLE) * CAST(c2 + 1 AS DOUBLE))
         ) * 1000000) AS HUGEINT) AS w
  FROM j
)
SELECT s1, s2, CAST(sum(w) // CAST(max(t1) AS HUGEINT) AS BIGINT) AS kl_micro_nats
FROM terms
GROUP BY s1, s2
ORDER BY s1, s2
"""


# ---------------------------------------------------------------------------
# Total-variation distance matrix: the EXACT companion to
# source_kl_divergence. KL needs add-1 smoothing and a quantized ln;
# TV(P,Q) = 1/2 sum_t |p_t - q_t| is a true metric, bounded in [0,1],
# defined on disjoint supports, and PURE INTEGER here: multiply through
# by Na*Nb and split the support three ways —
#   sum_union |ca*Nb - cb*Na|
#     = sum_shared |ca*Nb - cb*Na| + (Na - sum_shared ca)*Nb
#       + (Nb - sum_shared cb)*Na
# so one inner join on token plus per-source totals gives the exact
# value; tokens appearing in only one source never need a row.


def q_source_unigram_tv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_tokens_a, n_tokens_b, shared_types,
    tv_permille) for every unordered source pair — 0 = identical token
    distributions, 1000 = disjoint support. The mixing-weight planner's
    distance matrix next to KL's directed divergence.

    Scale shape: one (source, token) aggregation over the corpus scan,
    a vocabulary-keyed self-join (bucket size <= |sources| per token),
    a |sources|^2-row pair aggregation, and the metadata-sized pair
    spine cross (BNLJ_ALLOWED class) so fully-disjoint pairs still
    report tv = 1000. All arithmetic DECIMAL(38,0) with one truncating
    DIV."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    freqs = cache_eager(
        toks.groupBy("source", "t").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
    )
    totals = freqs.groupBy("source").agg(
        F.expr("CAST(sum(c) AS BIGINT)").alias("n")
    )
    fa = freqs.select(
        F.col("source").alias("source_a"), "t", F.col("c").alias("ca")
    )
    fb = freqs.select(
        F.col("source").alias("source_b"), "t", F.col("c").alias("cb")
    )
    ta_ = totals.select(
        F.col("source").alias("source_a"), F.col("n").alias("na")
    )
    tb_ = totals.select(
        F.col("source").alias("source_b"), F.col("n").alias("nb")
    )
    shared = (
        fa.join(fb, "t")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(ta_, "source_a")
        .join(tb_, "source_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("shared_types"),
            F.expr(
                "CAST(sum(abs(CAST(ca AS DECIMAL(38,0)) * nb"
                " - CAST(cb AS DECIMAL(38,0)) * na)) AS DECIMAL(38,0))"
            ).alias("d_shared"),
            F.expr("CAST(sum(ca) AS BIGINT)").alias("sca"),
            F.expr("CAST(sum(cb) AS BIGINT)").alias("scb"),
        )
    )
    spine = ta_.crossJoin(tb_).filter(F.col("source_a") < F.col("source_b"))
    return (
        spine.join(shared, ["source_a", "source_b"], "left")
        .selectExpr(
            "source_a",
            "source_b",
            "na AS n_tokens_a",
            "nb AS n_tokens_b",
            "CAST(coalesce(shared_types, 0) AS BIGINT) AS shared_types",
            "CAST((coalesce(d_shared, 0)"
            " + CAST(na - coalesce(sca, 0) AS DECIMAL(38,0)) * nb"
            " + CAST(nb - coalesce(scb, 0) AS DECIMAL(38,0)) * na) * 1000"
            " DIV (CAST(2 AS DECIMAL(38,0)) * na * nb)"
            " AS BIGINT) AS tv_permille",
        )
        .orderBy("source_a", "source_b")
    )


ORACLE_SOURCE_UNIGRAM_TV_MATRIX = r"""
WITH freqs AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents
  )
  WHERE t != ''
  GROUP BY source, t
),
totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM freqs GROUP BY 1),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS shared_types,
         CAST(sum(abs(CAST(a.c AS HUGEINT) * tb.n
                      - CAST(b.c AS HUGEINT) * ta.n)) AS HUGEINT)
           AS d_shared,
         CAST(sum(a.c) AS BIGINT) AS sca,
         CAST(sum(b.c) AS BIGINT) AS scb
  FROM freqs a
  JOIN freqs b ON a.t = b.t AND a.source < b.source
  JOIN totals ta ON ta.source = a.source
  JOIN totals tb ON tb.source = b.source
  GROUP BY 1, 2
),
spine AS (
  SELECT ta.source AS source_a, tb.source AS source_b,
         ta.n AS na, tb.n AS nb
  FROM totals ta JOIN totals tb ON ta.source < tb.source
)
SELECT source_a, source_b,
       na AS n_tokens_a, nb AS n_tokens_b,
       CAST(coalesce(shared_types, 0) AS BIGINT) AS shared_types,
       CAST((coalesce(d_shared, 0)
             + CAST(na - coalesce(sca, 0) AS HUGEINT) * nb
             + CAST(nb - coalesce(scb, 0) AS HUGEINT) * na) * 1000
            // (CAST(2 AS HUGEINT) * na * nb) AS BIGINT) AS tv_permille
FROM spine LEFT JOIN shared USING (source_a, source_b)
ORDER BY source_a, source_b
"""


def q_docs_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth per source: after each document (in
    doc_id order), the cumulative token volume and cumulative DISTINCT
    vocabulary. The curve a corpus builder reads dataset diversity off —
    a flattening vocab curve means new documents stop contributing new
    types (saturation / heavy duplication), while Heaps' law predicts
    V ~ k*N^b with b in [0.4, 0.6] for natural text.

    A windowed COUNT DISTINCT is inexpressible, so the growth comes from
    first-occurrence attribution: each (source, token)'s first document
    is one aggregation; the per-doc count of first-seen types regroups
    those partials; the cumulative curve is a window over the tiny
    doc-level relation. All integers, one token-keyed shuffle."""
    docs = table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "source", "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    first_seen = (
        toks.groupBy("source", "token").agg(F.min("doc_id").alias("first_doc"))
        .groupBy("source", F.col("first_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    per_doc = toks.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("token_count")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_doc.join(first_seen, ["source", "doc_id"], "left")
        .select(
            "source",
            "doc_id",
            "token_count",
            F.coalesce(F.col("new_types"), F.lit(0)).cast("bigint").alias("new_types"),
        )
        .select(
            "source",
            "doc_id",
            "token_count",
            "new_types",
            F.sum("token_count").over(w).cast("bigint").alias("cum_tokens"),
            F.sum("new_types").over(w).cast("bigint").alias("cum_vocab"),
        )
    )


ORACLE_DOCS_VOCAB_GROWTH = r"""
WITH toks AS (
  SELECT source, doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
),
first_seen AS (
  SELECT source, first_doc AS doc_id, count(*) AS new_types FROM (
    SELECT source, token, min(doc_id) AS first_doc FROM toks GROUP BY 1, 2
  ) GROUP BY 1, 2
),
per_doc AS (
  SELECT source, doc_id, count(*) AS token_count FROM toks GROUP BY 1, 2
)
SELECT p.source, p.doc_id,
       CAST(p.token_count AS BIGINT) AS token_count,
       CAST(COALESCE(f.new_types, 0) AS BIGINT) AS new_types,
       CAST(sum(p.token_count) OVER w AS BIGINT) AS cum_tokens,
       CAST(sum(COALESCE(f.new_types, 0)) OVER w AS BIGINT) AS cum_vocab
FROM per_doc p LEFT JOIN first_seen f USING (source, doc_id)
WINDOW w AS (PARTITION BY p.source ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING)
"""


def q_text_heaps_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted Heaps exponent per source: OLS slope of ln(cum_vocab) on
    ln(cum_tokens) over the vocabulary-growth curve points — the
    one-number companion to ``docs_vocab_growth``'s curve (V ~ k*N^b;
    natural text sits near b ~ 0.4-0.6, saturated/duplicated corpora
    flatten toward 0). Also emits ln k in micro (the OLS intercept,
    computed with multiplied-through integers).

    Determinism: identical discipline to ``q_zipf_slope`` (FLOATS.md
    class C + A) — one ln pair per curve point quantized to micro-nats,
    DECIMAL(38,0)/HUGEINT sufficient statistics, integral quotients
    with nullif'd divisors. Intercept: lnk_micro = (sy*sxx - sx*sxy)
    div (n*sxx - sx*sx) — exact in the same grid.

    Scale shape: docs_vocab_growth's plan (one token-keyed shuffle, a
    per-source cumulative window over the doc-grain relation) plus a
    per-source 5-number reduce."""
    growth = q_docs_vocab_growth(spark, sf_dir)
    pts = growth.select(
        "source",
        F.floor(F.log(F.col("cum_tokens").cast("double")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("x"),
        F.floor(F.log(F.col("cum_vocab").cast("double")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("y"),
    )
    stats = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    return stats.select(
        "source",
        F.col("n").cast("bigint").alias("n_points"),
        F.expr(
            "((n * sxy - sx * sy) * 1000000) div nullif(n * sxx - sx * sx, 0)"
        )
        .cast("bigint")
        .alias("heaps_beta_micro"),
        F.expr(
            "(sy * sxx - sx * sxy) div nullif(n * sxx - sx * sx, 0)"
        )
        .cast("bigint")
        .alias("heaps_lnk_micro"),
    ).orderBy("source")


ORACLE_TEXT_HEAPS_EXPONENT = r"""
WITH toks AS (
  SELECT source, doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
),
first_seen AS (
  SELECT source, first_doc AS doc_id, count(*) AS new_types FROM (
    SELECT source, token, min(doc_id) AS first_doc FROM toks GROUP BY 1, 2
  ) GROUP BY 1, 2
),
per_doc AS (
  SELECT source, doc_id, count(*) AS token_count FROM toks GROUP BY 1, 2
),
curve AS (
  SELECT p.source,
         CAST(sum(p.token_count) OVER w AS BIGINT) AS cum_tokens,
         CAST(sum(COALESCE(f.new_types, 0)) OVER w AS BIGINT) AS cum_vocab
  FROM per_doc p LEFT JOIN first_seen f USING (source, doc_id)
  WINDOW w AS (PARTITION BY p.source ORDER BY p.doc_id
               ROWS UNBOUNDED PRECEDING)
),
pts AS (
  SELECT source,
         CAST(floor(ln(CAST(cum_tokens AS DOUBLE)) * 1000000) AS HUGEINT) AS x,
         CAST(floor(ln(CAST(cum_vocab AS DOUBLE)) * 1000000) AS HUGEINT) AS y
  FROM curve
),
stats AS (
  SELECT source,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM pts GROUP BY 1
)
SELECT source,
       CAST(n AS BIGINT) AS n_points,
       CAST(((n * sxy - sx * sy) * 1000000) // nullif(n * sxx - sx * sx, 0)
            AS BIGINT) AS heaps_beta_micro,
       CAST((sy * sxx - sx * sxy) // nullif(n * sxx - sx * sx, 0)
            AS BIGINT) AS heaps_lnk_micro
FROM stats
ORDER BY source
"""


# ---------------------------------------------------------------------------
# unicode text cleaning (control strip + NFC + whitespace collapse)


def q_text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text cleaning: strip C0/DEL control characters (keeping
    \\t \\n \\r as whitespace), Unicode-NFC normalize, collapse ASCII
    whitespace runs, trim — the canonicalization every ingest runs
    before fingerprinting so that byte-different renderings of the same
    text dedup together.

    NFC needs a real Unicode library, so this is an Arrow-batched scalar
    ``pandas_udf`` (vectorized str ops + ``unicodedata``) — and the
    DuckDB oracle runs its OWN NFC (utf8proc) over the same regexes, so
    the gate cross-checks two independent Unicode implementations. The
    whitespace class is the explicit ASCII set on both engines (Python
    ``\\s`` would also eat U+00A0 etc.; RE2's would not — the explicit
    class removes the disagreement).

    Scale shape: pure per-row map, zero shuffles."""
    import pandas as pd

    @F.pandas_udf("string")
    def _clean(texts: pd.Series) -> pd.Series:
        import re
        import unicodedata

        ctrl = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
        ws = re.compile(r"[ \t\n\r\f\v]+")

        def f(t):
            if t is None:
                return None
            t = ctrl.sub("", t)
            t = unicodedata.normalize("NFC", t)
            return ws.sub(" ", t).strip()

        return texts.map(f)

    docs = spread(table(spark, sf_dir, "documents"))
    cleaned = docs.select("doc_id", "text", _clean(F.col("text")).alias("clean"))
    return cleaned.select(
        "doc_id",
        F.length("clean").alias("clean_len"),
        (F.col("clean") != F.col("text")).cast("int").alias("was_changed"),
        F.md5("clean").alias("clean_fingerprint"),
    )


ORACLE_TEXT_CLEAN = r"""
WITH cleaned AS (
  SELECT doc_id, text,
         trim(regexp_replace(
           nfc_normalize(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
           '[ \t\n\r\f\v]+', ' ', 'g')) AS clean
  FROM documents
)
SELECT doc_id,
       CAST(length(clean) AS INT) AS clean_len,
       CAST(clean <> text AS INT) AS was_changed,
       md5(clean) AS clean_fingerprint
FROM cleaned
"""


# ---------------------------------------------------------------------------
# readability: Flesch reading-ease per source from exact integer counts
# (words, sentence-ending punctuation runs, vowel groups as the syllable
# proxy — the standard regex approximation). The only float math is the
# closed-form Flesch formula over exact-integer ratios (FLOATS.md class C:
# IEEE division/multiply/subtract on exactly-represented integers, floored
# once to milli units — bit-identical on both engines).


def q_docs_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading-ease (milli units): corpus-level
    words/sentence and syllables/word ratios from summed exact counts.
    The quality-filter companion to text_quality_score — a source whose
    ease drifts far negative is boilerplate/code, far positive is
    fragment noise.

    Scale shape: pure map-side regexp counts + one source aggregation."""
    docs = spread(table(spark, sf_dir, "documents"))
    counted = docs.select(
        "source",
        F.expr(
            r"size(filter(split(trim(text), '\\s+'), w -> w != ''))"
        ).cast("bigint").alias("w"),
        # readability convention: a text with no terminal punctuation is
        # ONE sentence (fragment), not zero — keeps the ratio total
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        ).cast("bigint").alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
        .cast("bigint")
        .alias("v"),
    )
    return (
        counted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("s").cast("bigint").alias("n_sentences"),
            F.sum("v").cast("bigint").alias("n_vowel_groups"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_words",
            "n_sentences",
            "n_vowel_groups",
            # 206.835 - 1.015*(W/S) - 84.6*(V/W), milli-floored; emitted
            # as DOUBLE on both legs because a word-free source is NULL
            # (nullable BIGINT pairs as float64 in the driver's pandas
            # compare — the precision_bp dtype precedent)
            "CAST(floor((206.835"
            " - 1.015 * (CAST(n_words AS DOUBLE)"
            "            / CAST(n_sentences AS DOUBLE))"
            " - 84.6 * (CAST(n_vowel_groups AS DOUBLE)"
            "           / CAST(nullif(n_words, 0) AS DOUBLE))) * 1000)"
            " AS DOUBLE) AS flesch_milli",
        )
        .orderBy("source")
    )


ORACLE_DOCS_READABILITY = r"""
WITH counted AS (
  SELECT source,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> w != '')) AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS v
  FROM documents
),
agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS n_words,
         CAST(sum(s) AS BIGINT) AS n_sentences,
         CAST(sum(v) AS BIGINT) AS n_vowel_groups
  FROM counted GROUP BY 1
)
SELECT source, n_docs, n_words, n_sentences, n_vowel_groups,
       CAST(floor((206.835
         - 1.015 * (CAST(n_words AS DOUBLE)
                    / CAST(n_sentences AS DOUBLE))
         - 84.6 * (CAST(n_vowel_groups AS DOUBLE)
                   / CAST(nullif(n_words, 0) AS DOUBLE))) * 1000)
        AS DOUBLE) AS flesch_milli
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# per-domain document cap: every web pipeline caps documents per domain so
# one crawl-heavy site cannot dominate the mixture (the CommonCrawl
# "domain cap" rule). Deterministic: the kept set is the K smallest
# md5(doc_id) per source — reproducible on any engine, any partitioning.

DOMAIN_CAP = 40


def q_docs_capped_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source accounting of the DOMAIN_CAP deterministic cap: total
    docs, kept, dropped, and an order-insensitive bit_xor checksum of the
    kept doc_ids (shard_manifest's integrity recipe) so the gate verifies
    the SELECTION, not just the counts.

    Scale shape: one source-keyed sort window (rank by hash) and one
    source aggregation. The production writer applies ``rn <= cap`` as a
    filter — which Spark plans as WindowGroupLimit (partial top-K per
    partition before the shuffle); this accounting query keeps the full
    ranks because it must also count the dropped side."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select("source", "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("rn") <= DOMAIN_CAP).cast("bigint"))
            .cast("bigint")
            .alias("n_kept"),
            F.expr(
                f"bit_xor(CASE WHEN rn <= {DOMAIN_CAP} THEN "
                "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
                " AS BIGINT) ELSE 0 END)"
            ).alias("kept_checksum"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_kept",
            "CAST(n_docs - n_kept AS BIGINT) AS n_dropped",
            f"CAST({DOMAIN_CAP} AS BIGINT) AS cap",
            "kept_checksum",
        )
        .orderBy("source")
    )


ORACLE_DOCS_CAPPED = f"""
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(count(*) - sum(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST({DOMAIN_CAP} AS BIGINT) AS cap,
       bit_xor(CASE WHEN rn <= {DOMAIN_CAP} THEN
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                      AS BIGINT)
               ELSE 0 END) AS kept_checksum
FROM ranked
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# balanced training-shard assignment

N_SHARDS = 8


def q_docs_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to one of ``N_SHARDS`` training shards,
    balanced by TOKEN budget (not doc count): documents are globally
    ranked by descending token count (ties by doc_id) and dealt
    round-robin — the deterministic longest-processing-time-style deal
    that keeps every shard's token sum within one max-document of the
    mean, so no data-parallel worker waits on a fat shard. Returns the
    per-shard accounting (docs, tokens) the deal is judged by.

    Scale shape: token counts are a pure map; the global rank is
    ``with_global_rank`` (range exchange, no single-partition window);
    the shard id is a modulo on the rank; accounting is one 8-group
    aggregation. The same deal writes the shards with
    ``partitionBy(shard)`` — this query IS the plan of that writer."""
    return (
        _sharded(spark, sf_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").cast("bigint").alias("token_sum"),
            F.max("token_count").alias("max_doc_tokens"),
        )
    )


def _sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, token_count, rn, shard): the token-balanced round-robin
    deal shared by the accounting query and the manifest."""
    from .ranks import with_global_rank

    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("token_count"),
    ).withColumn("neg_tokens", -F.col("token_count"))
    ranked = with_global_rank(sized, "neg_tokens", "doc_id")
    return ranked.withColumn("shard", ((F.col("rn") - 1) % N_SHARDS).cast("int"))


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MANIFEST a trainer consumes next to the written shards: per
    shard, the doc/token volume plus an ORDER-INSENSITIVE integrity
    checksum — ``bit_xor`` over a 48-bit md5 hash of each member doc_id.
    XOR is associative/commutative and overflow-free, so the checksum is
    identical on any partitioning or read order; re-deriving it after a
    copy/rewrite detects any lost, duplicated, or misrouted document
    without comparing id lists.

    Scale shape: the deal's global rank plus ONE shard-keyed aggregation
    (map-side combined); the checksum adds a per-row md5 — no extra
    shuffle."""
    return (
        _sharded(spark, sf_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").cast("bigint").alias("token_sum"),
            F.expr(
                "bit_xor(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT))"
            ).alias("id_checksum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


ORACLE_SHARD_MANIFEST = rf"""
WITH sized AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS token_count
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY token_count DESC, doc_id) AS rn
  FROM sized
)
SELECT CAST((rn - 1) % {N_SHARDS} AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum(token_count) AS BIGINT) AS token_sum,
       bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)) AS id_checksum,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM ranked
GROUP BY 1
ORDER BY 1
"""


ORACLE_DOCS_SHARD_ASSIGNMENT = rf"""
WITH sized AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS token_count
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY token_count DESC, doc_id) AS rn
  FROM sized
)
SELECT CAST((rn - 1) % {N_SHARDS} AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum(token_count) AS BIGINT) AS token_sum,
       CAST(max(token_count) AS INT) AS max_doc_tokens
FROM ranked
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Bigram language-model scoring (perplexity-proxy quality signal)

LM_Q = 1_000_000  # per-bigram log-prob quantization (floor to 1e-6)


def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by a bigram language model TRAINED ON THE
    CORPUS ITSELF — the perplexity-style quality signal pipelines use to
    rank text (a KenLM stand-in with the same algebra, no external model):
    ``avg_logprob`` = mean over the doc's bigrams of ln(c2/c1), where c2 =
    corpus count of the bigram and c1 = count of its prefix token as a
    bigram head. MLE without smoothing is total here — every scored bigram
    was counted by the same pass, so c2 >= 1 always. ``min_logprob`` is
    the doc's most surprising transition.

    Cross-engine determinism: each bigram's ln() is computed ONCE in the
    stats relation and floor-quantized to integer micro-nats there; the
    per-doc aggregation then sums integers (associative, plan-independent)
    — the same quantize-before-the-cross-row-sum discipline as BM25.

    Scale shape: one (w1,w2)-keyed aggregation over the bigram stream
    builds the model; the prefix totals are a narrow regroup of those
    partials; the model (vocabulary-bounded — millions of rows at corpus
    scale, megabytes) broadcasts back onto the stream, and the per-doc
    score is one doc_id-keyed aggregation. Docs with < 2 tokens have no
    bigrams and no row, on both engines."""
    return text_lm_score_from(spread(table(spark, sf_dir, "documents")))


def _bigram_lm(docs: DataFrame, *extra_cols: str):
    """(bigrams, stats): the corpus bigram stream with any carried
    columns, and the quantized MLE model (w1, w2, lnq) — shared by
    ``text_lm_score`` and ``lm_perplexity_buckets`` so the two stay in
    lockstep with their oracles' common CTE chain."""
    toks = docs.select(
        *extra_cols, "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    # guard the bigram index list: sequence(1, 0) yields the DESCENDING
    # [1, 0] in Spark and element_at(toks, 0) throws — a 1-token doc must
    # produce an empty list (no row), matching DuckDB's empty range(1, 1)
    bigrams = toks.select(
        *extra_cols, "doc_id",
        F.explode(
            F.expr(
                "transform(CASE WHEN size(toks) >= 2 "
                "THEN sequence(1, size(toks) - 1, 1) ELSE array() END, "
                "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select(
        *extra_cols, "doc_id",
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"),
    )
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    stats = c2.join(c1, "w1").select(
        "w1", "w2",
        F.floor(F.log(F.col("c2") / F.col("c1")) * LM_Q).cast("bigint").alias("lnq"),
    )
    return bigrams, stats


def text_lm_score_from(docs: DataFrame) -> DataFrame:
    bigrams, stats = _bigram_lm(docs)
    return (
        bigrams.join(F.broadcast(stats), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("lnq") / (F.lit(float(LM_Q)) * F.count(F.lit(1))), 6).alias(
                "avg_logprob"
            ),
            F.round(F.min("lnq") / F.lit(float(LM_Q)), 6).alias("min_logprob"),
        )
    )


ORACLE_TEXT_LM_SCORE = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
),
bigrams AS (
  SELECT doc_id, bg['w1'] AS w1, bg['w2'] AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks), 1)),
                                 i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS bg
    FROM toks
  )
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bigrams GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
stats AS (
  SELECT w1, w2,
         CAST(floor(ln(c2 * 1.0 / c1) * {LM_Q}) AS BIGINT) AS lnq
  FROM c2 JOIN c1 USING (w1)
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(sum(lnq) / ({LM_Q}.0 * count(*)), 6) AS avg_logprob,
       round(min(lnq) / {LM_Q}.0, 6) AS min_logprob
FROM bigrams JOIN stats USING (w1, w2)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# boilerplate phrase mining: the CCNet-style cleaning signal a crawl corpus
# needs before near-dup removal — phrases (3-gram shingles) that recur
# across MANY documents of a source are headers/footers/templates, not
# content; they inflate n-gram LMs and dedup false-positive rates. A
# shingle is "boilerplate" when its document frequency reaches
# BP_DF_PCT% of the source's documents.

BP_DF_PCT = 5  # df >= 5% of the source's docs → boilerplate


def q_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate report: how many shingles cross the
    document-frequency threshold, the most widespread one, and what
    fraction of documents carry at least one boilerplate phrase.

    Scale shape: ONE distinct (source, doc_id, shingle) relation (cached;
    shuffle keyed on the shingle triple) feeds both the df aggregation
    (same-key regroup) and the affected-document probe; the boilerplate
    set itself is threshold-pruned to metadata size (df >= 5% of docs
    bounds it by 20x the per-source common-phrase count, and a df >= 2
    floor keeps it pruned even for tiny sources where n_docs <= 20 would
    otherwise let every df=1 shingle qualify — the broadcast stays
    metadata-sized regardless of source size), so it broadcasts back
    onto the shingle relation. The df compare is cross-multiplied
    (``df * 100 >= n_docs * BP_DF_PCT`` — exact for any pct, not just
    divisors of 100) so no quotient exists, and
    every output cell is a count, an integral bp quotient (divisor
    n_docs >= 1 structurally), or a COALESCEd string — no NULL-in-bigint
    (FLOATS.md classes A, D, E)."""
    docs = spread(table(spark, sf_dir, "documents"))
    src = cache_eager(
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    toks = docs.select(
        "source", "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    # guarded index list — same short-doc guard as dedup's shingle helpers
    grams = F.expr(
        "transform(CASE WHEN size(toks) >= 3 "
        "THEN sequence(1, size(toks) - 2, 1) ELSE array() END, "
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), "
        "element_at(toks, i + 2)))"
    )
    dg = cache_eager(
        toks.select("source", "doc_id", F.explode(grams).alias("g")).distinct()
    )
    df_rel = dg.groupBy("source", "g").agg(F.count(F.lit(1)).alias("df"))
    boiler = cache_eager(
        df_rel.join(F.broadcast(src), "source").filter(
            (F.col("df") * 100 >= F.col("n_docs") * BP_DF_PCT)
            & (F.col("df") >= 2)
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("df").desc(), "g")
    )
    top = (
        boiler.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("source", F.col("g").alias("top_gram"), F.col("df").alias("top_df"))
    )
    stats = boiler.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bp")
    )
    affected = (
        dg.join(F.broadcast(boiler.select("source", "g")), ["source", "g"])
        .select("source", "doc_id")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_aff"))
    )
    return (
        src.join(stats, "source", "left")
        .join(top, "source", "left")
        .join(affected, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_bp"), F.lit(0)).cast("bigint").alias(
                "n_boilerplate_grams"
            ),
            F.coalesce(F.col("top_gram"), F.lit("")).alias("top_gram"),
            F.coalesce(F.col("top_df"), F.lit(0)).cast("bigint").alias(
                "top_gram_df"
            ),
            F.expr("COALESCE(n_aff, 0) * 10000 div n_docs")
            .cast("bigint")
            .alias("boilerplate_doc_frac_bp"),
        )
        .orderBy("source")
    )


ORACLE_BOILERPLATE = rf"""
WITH docs AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
src AS (SELECT source, count(*) AS n_docs FROM docs GROUP BY 1),
grams AS (
  SELECT DISTINCT source, doc_id,
         list_aggregate(toks[i:i+2], 'string_agg', ' ') AS g
  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 3
),
df AS (SELECT source, g, count(*) AS df FROM grams GROUP BY 1, 2),
boiler AS (
  SELECT d.source, d.g, d.df
  FROM df d JOIN src s ON d.source = s.source
  WHERE d.df * 100 >= s.n_docs * {BP_DF_PCT} AND d.df >= 2
),
top AS (
  SELECT source, g AS top_gram, df AS top_df,
         row_number() OVER (PARTITION BY source ORDER BY df DESC, g) AS rn
  FROM boiler
),
stats AS (SELECT source, count(*) AS n_bp FROM boiler GROUP BY 1),
affected AS (
  SELECT g2.source, count(DISTINCT g2.doc_id) AS n_aff
  FROM grams g2 JOIN boiler b ON g2.source = b.source AND g2.g = b.g
  GROUP BY 1
)
SELECT s.source,
       s.n_docs,
       CAST(COALESCE(st.n_bp, 0) AS BIGINT) AS n_boilerplate_grams,
       COALESCE(t.top_gram, '') AS top_gram,
       CAST(COALESCE(t.top_df, 0) AS BIGINT) AS top_gram_df,
       CAST(COALESCE(a.n_aff, 0) * 10000 // s.n_docs AS BIGINT)
         AS boilerplate_doc_frac_bp
FROM src s
LEFT JOIN stats st ON s.source = st.source
LEFT JOIN (SELECT * FROM top WHERE rn = 1) t ON s.source = t.source
LEFT JOIN affected a ON s.source = a.source
ORDER BY s.source
"""


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV: the tokenizer-sizing report next to BPE
# training — if the deployment vocabulary keeps only the top-K global
# tokens, what fraction of each source's token stream falls out-of-
# vocabulary? A source with high OOV under the shared vocab is the one
# that needs vocab budget (or its own merges) before training.

VOCAB_KS = (10, 20, 40)  # candidate vocabulary sizes to report


def q_vocab_oov_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, K) out-of-vocabulary rate for top-K global vocabs.

    Scale shape (two-phase top-K, r9): ONE (source, token) aggregation
    over the corpus scan (map-side combined) is the only corpus-sized
    work; the global ranking keeps only the top max(K) tokens via
    ``orderBy().limit(maxK)`` — a parallel TakeOrderedAndProject, no
    single-partition sort of the full vocabulary (Heaps-sublinear but
    still 1e8+ rows at web scale) — then ranks the <= maxK survivors
    with a bounded window and LEFT-broadcasts them onto the per-source
    counts: a token missing from the top-maxK relation has rank > maxK
    >= every K, i.e. it is OOV for all K by construction. The K fan-out
    is a 3-element literal explode. Every cell is a count or an integral
    bp quotient over counts (divisor = the source's token total, >= 1
    for any emitted group; FLOATS.md class A, oracle sums CAST to BIGINT
    per class D)."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    stc = cache_eager(
        toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    )
    g = stc.groupBy("token").agg(F.sum("c").alias("gc"))
    top = g.orderBy(F.col("gc").desc(), "token").limit(max(VOCAB_KS))
    # constant partition key: <= max(K) rows by construction (see
    # vocab_coverage_curve for the rationale)
    rank = top.select(
        "token",
        F.row_number()
        .over(Window.partitionBy(F.lit(0)).orderBy(F.col("gc").desc(), "token"))
        .alias("r"),
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in VOCAB_KS])
    ).alias("k")
    return (
        stc.join(F.broadcast(rank), "token", "left")
        .select("source", "c", "r", ks)
        .groupBy("source", "k")
        .agg(
            F.sum("c").cast("bigint").alias("total_tokens"),
            # NULL rank = outside the top-maxK relation = OOV for all K
            F.sum(
                F.when(
                    F.col("r").isNull() | (F.col("r") > F.col("k")),
                    F.col("c"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .select(
            "source",
            "k",
            "total_tokens",
            "oov_tokens",
            F.expr("oov_tokens * 10000 div total_tokens")
            .cast("bigint")
            .alias("oov_bp"),
        )
        .orderBy("source", "k")
    )


ORACLE_VOCAB_OOV = rf"""
WITH toks AS (
  SELECT source, token FROM (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
  )
  WHERE token != ''
),
stc AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
g AS (SELECT token, sum(c) AS gc FROM stc GROUP BY 1),
rank AS (
  SELECT token, row_number() OVER (ORDER BY gc DESC, token) AS r FROM g
),
fan AS (
  SELECT s.source, s.c, rk.r, k
  FROM stc s JOIN rank rk ON s.token = rk.token
  CROSS JOIN (VALUES {", ".join(f"({k})" for k in VOCAB_KS)}) ks(k)
)
SELECT source, k,
       CAST(sum(c) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN r > k THEN c ELSE 0 END) AS BIGINT) AS oov_tokens,
       CAST(sum(CASE WHEN r > k THEN c ELSE 0 END) * 10000 // sum(c) AS BIGINT)
         AS oov_bp
FROM fan
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# On-engine Naive Bayes language classifier — train AND serve as one
# gated composition (the counts-based sibling of bpe_merge_training /
# kmeans_embedding_fit / ann_ivf_fitted: training is pure integer
# counting, serving is an argmax of quantized log sums, so the full
# train→classify→score pipeline hash-matches a DuckDB oracle).

NB_LN_SCALE = 1_000_000  # micro-nats (the zipf/kl quantization unit)


def q_nb_language_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial Naive Bayes language classifier on the corpus
    (labels: the ``lang`` column; features: unigram tokens), classify
    the same corpus, and report per-language accuracy — the standard
    closed-loop QA for auto-labeling: a language whose docs the
    counts-based model cannot re-identify has labels that unigram
    evidence does not support (the synthetic corpus scores honestly,
    like ``embedding_knn_accuracy``; a planted disjoint-vocabulary test
    pins that separable input scores 1.0).

    Determinism (FLOATS.md classes A + C): the smoothed log-likelihood
    ``ln((c+1)/(T_l+V))`` and the prior ``ln(n_l/N)`` are each floor-
    quantized ONCE per (token, lang) / lang row to integer micro-nats;
    per-doc scores are exact BIGINT sums of count*lnq; the argmax
    tie-breaks lexicographically; accuracy is integral basis points.

    Scale shape: training is ONE (lang, token) count aggregation over
    the corpus scan; the model is a vocabulary-bounded |V| x |langs|
    relation (langs are a handful) that joins back onto the per-doc
    token counts — scoring volume is corpus-tokens x |langs|, linear in
    the corpus; the |langs|-row prior/total relations broadcast. No
    iteration: Naive Bayes trains in one pass, which is why it is the
    scale-friendliest classifier a 100 TB labeling QA loop can run."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    doc_toks = cache_eager(
        toks.groupBy("doc_id", "lang", "token").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    lt = doc_toks.groupBy("lang", "token").agg(F.sum("n").alias("c"))
    totals = lt.groupBy("lang").agg(F.sum("c").alias("t"))
    vocab = lt.select("token").distinct()
    vocab_n = vocab.count()  # scalar metadata probe (kl-divergence precedent)
    # |V| x |langs| smoothed log-likelihood table, c=0 rows included
    ll = (
        vocab.crossJoin(F.broadcast(totals))
        .join(lt, ["lang", "token"], "left")
        .select(
            "lang",
            "token",
            F.expr(
                f"CAST(floor(ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE) "
                f"/ CAST(t + {vocab_n} AS DOUBLE)) * {NB_LN_SCALE}) AS BIGINT)"
            ).alias("lnq"),
        )
    )
    n_docs = docs.count()  # scalar metadata probe
    prior = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nl"))
        .select(
            F.col("lang").alias("cand"),
            "nl",
            F.expr(
                f"CAST(floor(ln(CAST(nl AS DOUBLE) / CAST({n_docs} AS DOUBLE))"
                f" * {NB_LN_SCALE}) AS BIGINT)"
            ).alias("prior_lnq"),
        )
    )
    scores = (
        doc_toks.join(
            ll.select(
                F.col("lang").alias("cand"), "token", "lnq"
            ),
            "token",
        )
        .groupBy("doc_id", "lang", "cand")
        .agg(F.sum(F.col("n") * F.col("lnq")).alias("s"))
        .join(F.broadcast(prior.select("cand", "prior_lnq")), "cand")
        .select(
            "doc_id",
            "lang",
            "cand",
            (F.col("s") + F.col("prior_lnq")).alias("score"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    )
    pred = scores.withColumn("rn", rn).filter(F.col("rn") == 1)
    return (
        pred.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("cand") == F.col("lang"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
        .select(
            "lang",
            "n_docs",
            "n_correct",
            F.expr("n_correct * 10000 div n_docs").cast("bigint").alias(
                "accuracy_bp"
            ),
        )
        .orderBy("lang")
    )


ORACLE_NB_LANGUAGE = rf"""
WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
),
doc_toks AS (
  SELECT doc_id, lang, token, count(*) AS n
  FROM toks WHERE token != '' GROUP BY 1, 2, 3
),
lt AS (SELECT lang, token, sum(n) AS c FROM doc_toks GROUP BY 1, 2),
totals AS (SELECT lang, sum(c) AS t FROM lt GROUP BY 1),
vocab AS (SELECT DISTINCT token FROM lt),
vn AS (SELECT count(*) AS v FROM vocab),
ll AS (
  SELECT totals.lang, vocab.token,
         CAST(floor(ln(CAST(COALESCE(lt.c, 0) + 1 AS DOUBLE)
              / CAST(totals.t + vn.v AS DOUBLE)) * {NB_LN_SCALE}) AS BIGINT)
           AS lnq
  FROM vocab CROSS JOIN totals CROSS JOIN vn
  LEFT JOIN lt ON lt.lang = totals.lang AND lt.token = vocab.token
),
nd AS (SELECT count(*) AS n FROM documents),
prior AS (
  SELECT lang AS cand,
         CAST(floor(ln(CAST(count(*) AS DOUBLE)
              / CAST((SELECT n FROM nd) AS DOUBLE)) * {NB_LN_SCALE}) AS BIGINT)
           AS prior_lnq
  FROM documents GROUP BY lang
),
scores AS (
  SELECT d.doc_id, d.lang, ll.lang AS cand,
         sum(d.n * ll.lnq) + any_value(p.prior_lnq) AS score
  FROM doc_toks d
  JOIN ll ON ll.token = d.token
  JOIN prior p ON p.cand = ll.lang
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, lang, cand,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand) AS rn
  FROM scores
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN cand = lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(sum(CASE WHEN cand = lang THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS accuracy_bp
FROM pred WHERE rn = 1
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# DSIR-style importance resampling: select raw-corpus documents that "look
# like" a target domain by hashed-n-gram importance weights (Xie et al.,
# "Data Selection for Language Models via Importance Resampling", NeurIPS
# 2023 — public). The target here is the corpus's own `lang = 'en'` slice
# standing in for a high-quality target domain; features are unigrams
# hashed into DSIR_B buckets so both feature distributions are
# BUCKET-BOUNDED relations regardless of corpus size.

DSIR_B = 64  # hashed-feature buckets (paper uses 10k; vocab here is tiny)
DSIR_Q = 1_000_000  # per-bucket log-ratio quantization (floor to micro-nats)
DSIR_TOPK = 20


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents by DSIR importance weight toward the `en` target
    slice: weight(d) = sum over d's tokens of ln(p_target(bucket) /
    p_raw(bucket)), add-1 smoothed over DSIR_B hashed buckets. A positive
    weight means the doc is more target-like than the raw average — the
    selection signal importance resampling draws against.

    Determinism (FLOATS.md class C): ONE ln per bucket row — the exact
    rational (ct+1)(Tr+B) / ((cr+1)(Tt+B)) with each factor cast to
    double before one multiply and one divide (bit-identical IEEE on both
    engines) — floor-quantized to integer micro-nats; per-doc weights are
    DECIMAL(38,0) sums of those integers (associative, plan-independent).
    The bucket hash is the md5-hex prefix recipe the dedup family proves
    cross-engine (``conv(substr(md5(t),1,8),16,10) % B``).

    Scale shape: the corpus token stream is scanned twice (bucket
    counting, then scoring), exactly like ``text_lm_score``'s bigram
    stream; BOTH feature distributions live on one DSIR_B-row relation
    (the totals come from a window over those B rows, not a global
    window), which broadcasts back onto the stream; the per-doc weight is
    one doc_id-keyed aggregation and the top-K is TakeOrderedAndProject —
    no global sort materializes. At 100 TB nothing here grows beyond the
    corpus scan: the model is B rows, the output K rows."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "source", "lang",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tokb = toks.withColumn(
        "b",
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
        .cast("bigint") % DSIR_B,
    )
    # ONE aggregation carries both distributions (ct is a conditional
    # count) — no second corpus scan and no bucket join; the totals are
    # windows over this B-row relation
    raw = tokb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        ).alias("ct"),
    )
    w_all = Window.partitionBy()
    lr = cache_eager(
        raw.withColumn("tr", F.sum("cr").over(w_all))
        .withColumn("tt", F.sum("ct").over(w_all))
        .select(
            "b",
            F.floor(
                F.log(
                    (
                        (F.col("ct") + 1).cast("double")
                        * (F.col("tr") + F.lit(DSIR_B)).cast("double")
                    )
                    / (
                        (F.col("cr") + 1).cast("double")
                        * (F.col("tt") + F.lit(DSIR_B)).cast("double")
                    )
                )
                * DSIR_Q
            ).cast("bigint").alias("lr"),
        )
    )
    return (
        tokb.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("lr").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("weight_micro_nats"),
        )
        .orderBy(F.desc("weight_micro_nats"), "doc_id")
        .limit(DSIR_TOPK)
    )


ORACLE_DSIR = rf"""
WITH toks AS (
  SELECT doc_id, source, lang, token,
         CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % {DSIR_B} AS b
  FROM (
    SELECT doc_id, source, lang,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
  ) WHERE token <> ''
),
raw AS (
  SELECT b, count(*) AS cr,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
  FROM toks GROUP BY 1
),
lr AS (
  SELECT b,
         CAST(floor(ln((CAST(ct + 1 AS DOUBLE) * CAST(tr + {DSIR_B} AS DOUBLE))
                       / (CAST(cr + 1 AS DOUBLE) * CAST(tt + {DSIR_B} AS DOUBLE)))
                    * {DSIR_Q}) AS BIGINT) AS lr
  FROM (
    SELECT b, cr, ct,
           sum(cr) OVER () AS tr,
           sum(ct) OVER () AS tt
    FROM raw
  )
)
SELECT t.doc_id, t.source, t.lang,
       count(*) AS n_tokens,
       CAST(sum(lr.lr) AS BIGINT) AS weight_micro_nats
FROM toks t JOIN lr ON t.b = lr.b
GROUP BY 1, 2, 3
ORDER BY weight_micro_nats DESC, doc_id
LIMIT {DSIR_TOPK}
"""


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing: split each language's documents into
# head / middle / tail terciles by LM score (Wenzek et al., "CCNet:
# Extracting High Quality Monolingual Datasets from Web Crawl Data", 2020
# — public; CCNet keeps "head" = lowest-perplexity third). Reuses the
# corpus-trained bigram model of ``text_lm_score``.


def q_lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, tercile) report over the corpus-trained bigram LM:
    bucket 1 = head (highest mean log-prob / lowest perplexity), 3 =
    tail. Output: doc counts and the micro-nat mean-log-prob range each
    bucket spans — the cut sheet a CCNet-style quality filter applies.

    Determinism: per-doc mean log-prob is an EXACT integer floor
    division ((s - pmod(s, n)) / n with the pmod spelled out as
    ((s % n + n) % n) so both engines floor identically on negative
    sums); tercile assignment happens at the (lang, mean) SCORE grain —
    docs sharing a score share a bucket by construction (no tie-split
    ambiguity) — via bucket = 1 + (cum_hi - 1) * 3 // n_lang over the
    cumulative count, all integer arithmetic.

    Scale shape: the model build and doc scoring are ``text_lm_score``'s
    plan (vocabulary-bounded stats broadcast onto the bigram stream, one
    doc_id-keyed aggregation); the tercile windows then run over the
    (lang, mean_micro) DISTINCT-SCORE relation — score-cardinality-
    bounded, orders of magnitude smaller than the corpus — never over
    per-doc rows (the pre-aggregated-cumulative-sum recipe, same as
    ``quantile_histogram_check``'s calibration)."""
    docs = spread(table(spark, sf_dir, "documents"))
    bigrams, stats = _bigram_lm(docs, "lang")
    per_doc = (
        bigrams.join(F.broadcast(stats), ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("lnq").alias("s"),
        )
        .select(
            "lang",
            F.expr(
                "CAST((s - ((s % n + n) % n)) DIV n AS BIGINT)"
            ).alias("mean_micro"),
        )
    )
    scores = per_doc.groupBy("lang", "mean_micro").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_lang = Window.partitionBy("lang")
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.desc("mean_micro"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucketed = (
        scores.withColumn("n_lang", F.sum("cnt").over(w_lang))
        .withColumn("cum_hi", F.sum("cnt").over(w_cum))
        .withColumn(
            "bucket",
            (F.lit(1) + F.expr("(cum_hi - 1) * 3 DIV n_lang")).cast("int"),
        )
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_docs"),
            F.min("mean_micro").alias("lo_micro_nats"),
            F.max("mean_micro").alias("hi_micro_nats"),
        )
        .withColumn(
            "bucket_label",
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail"),
        )
        .orderBy("lang", "bucket")
    )


ORACLE_PERPLEXITY_BUCKETS = rf"""
WITH toks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
bigrams AS (
  SELECT doc_id, lang, bg['w1'] AS w1, bg['w2'] AS w2 FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, greatest(len(toks), 1)),
                                 i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS bg
    FROM toks
  )
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bigrams GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
stats AS (
  SELECT w1, w2,
         CAST(floor(ln(c2 * 1.0 / c1) * {LM_Q}) AS BIGINT) AS lnq
  FROM c2 JOIN c1 USING (w1)
),
per_doc AS (
  SELECT lang,
         (s - ((s % n + n) % n)) // n AS mean_micro
  FROM (
    SELECT doc_id, lang, count(*) AS n, CAST(sum(lnq) AS BIGINT) AS s
    FROM bigrams JOIN stats USING (w1, w2)
    GROUP BY 1, 2
  )
),
scores AS (
  SELECT lang, mean_micro, count(*) AS cnt
  FROM per_doc GROUP BY 1, 2
),
bucketed AS (
  SELECT lang, mean_micro, cnt,
         CAST(1 + (cum_hi - 1) * 3 // n_lang AS INT) AS bucket
  FROM (
    SELECT lang, mean_micro, cnt,
           sum(cnt) OVER (PARTITION BY lang) AS n_lang,
           sum(cnt) OVER (PARTITION BY lang ORDER BY mean_micro DESC
                          ROWS UNBOUNDED PRECEDING) AS cum_hi
    FROM scores
  )
)
SELECT lang, bucket,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(min(mean_micro) AS BIGINT) AS lo_micro_nats,
       CAST(max(mean_micro) AS BIGINT) AS hi_micro_nats,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket_label
FROM bucketed
GROUP BY 1, 2
ORDER BY lang, bucket
"""


# ---------------------------------------------------------------------------
# PMI co-occurrence mining: the skip-bigram count matrix + pointwise mutual
# information ranking that word-embedding pipelines (word2vec/GloVe count
# prep) build as their first pass. Forward window of 2 (offsets +1, +2).

PMI_MIN_COUNT = 5  # pair-count floor: kills noise, bounds the ranked relation
PMI_TOPK = 50


def q_token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K token pairs by PMI = ln(p(x,y) / (p(x) p(y))) over forward
    co-occurrence windows of 2, with a pair-count floor — the collocation
    extraction / embedding-count-matrix pass.

    Determinism (FLOATS.md class C): ONE ln per surviving pair row on the
    exact rational c_xy * Nu^2 / (Np * c_x * c_y), every factor cast to
    double first (left-assoc products, bit-identical IEEE both engines),
    floor-quantized to micro-nats. No cross-row float sums exist.

    Scale shape: pair generation is a pure per-doc array transform (zero
    joins — offsets materialize inside the token array); one pair-keyed
    aggregation is the only corpus-sized shuffle. The unigram relation is
    vocabulary-bounded and broadcasts onto the FLOORED pair relation
    (count >= PMI_MIN_COUNT bounds it to heavy co-occurrences); the 1-row
    Nu/Np totals attach to that floored relation only (bnlj-allowlisted
    1-row scalar attach), and the top-K is TakeOrderedAndProject."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    pairs_all = toks.select(
        F.explode(
            F.expr(
                "flatten(array("
                "transform(CASE WHEN size(t) >= 2 THEN sequence(1, size(t) - 1, 1) "
                "ELSE array() END, i -> struct(element_at(t, i) AS x, element_at(t, i + 1) AS y)), "
                "transform(CASE WHEN size(t) >= 3 THEN sequence(1, size(t) - 2, 1) "
                "ELSE array() END, i -> struct(element_at(t, i) AS x, element_at(t, i + 2) AS y))"
                "))"
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    pair_counts = cache_eager(
        pairs_all.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_pair"))
    )
    uni = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    uni = cache_eager(uni)
    totals = (
        uni.agg(F.sum("cu").alias("nu"))
        .crossJoin(pair_counts.agg(F.sum("c_pair").alias("np")))
    )
    floored = pair_counts.filter(F.col("c_pair") >= PMI_MIN_COUNT)
    joined = (
        floored.join(
            F.broadcast(uni.select(F.col("token").alias("x"), F.col("cu").alias("cx"))),
            "x",
        )
        .join(
            F.broadcast(uni.select(F.col("token").alias("y"), F.col("cu").alias("cy"))),
            "y",
        )
        .crossJoin(F.broadcast(totals))
    )
    return (
        joined.select(
            "x", "y", "c_pair",
            F.floor(
                F.log(
                    (
                        F.col("c_pair").cast("double")
                        * F.col("nu").cast("double")
                        * F.col("nu").cast("double")
                    )
                    / (
                        F.col("np").cast("double")
                        * F.col("cx").cast("double")
                        * F.col("cy").cast("double")
                    )
                )
                * 1_000_000
            ).cast("bigint").alias("pmi_micro_nats"),
        )
        .orderBy(F.desc("pmi_micro_nats"), "x", "y")
        .limit(PMI_TOPK)
    )


ORACLE_TOKEN_PMI = rf"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
pairs_all AS (
  SELECT p['x'] AS x, p['y'] AS y FROM (
    SELECT unnest(list_concat(
      list_transform(range(1, greatest(len(t), 1)),
                     i -> {{'x': t[i], 'y': t[i + 1]}}),
      list_transform(range(1, greatest(len(t) - 1, 1)),
                     i -> {{'x': t[i], 'y': t[i + 2]}})
    )) AS p
    FROM toks
  )
),
pair_counts AS (SELECT x, y, count(*) AS c_pair FROM pairs_all GROUP BY 1, 2),
uni AS (
  SELECT token, count(*) AS cu FROM (
    SELECT unnest(t) AS token FROM toks
  ) GROUP BY 1
),
totals AS (
  SELECT (SELECT sum(cu) FROM uni) AS nu,
         (SELECT sum(c_pair) FROM pair_counts) AS np
)
SELECT p.x, p.y, p.c_pair,
       CAST(floor(ln((CAST(p.c_pair AS DOUBLE) * CAST(t.nu AS DOUBLE) * CAST(t.nu AS DOUBLE))
                     / (CAST(t.np AS DOUBLE) * CAST(ux.cu AS DOUBLE) * CAST(uy.cu AS DOUBLE)))
                  * 1000000) AS BIGINT) AS pmi_micro_nats
FROM pair_counts p
JOIN uni ux ON ux.token = p.x
JOIN uni uy ON uy.token = p.y
CROSS JOIN totals t
WHERE p.c_pair >= {PMI_MIN_COUNT}
ORDER BY pmi_micro_nats DESC, p.x, p.y
LIMIT {PMI_TOPK}
"""


# ---------------------------------------------------------------------------
# per-source token entropy: the corpus-diversity diagnostic next to
# zipf_slope_fit and source_kl_divergence — low-entropy sources are
# templated/repetitive, high-entropy ones lexically diverse.


def q_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy H = -sum p ln p of each source's unigram
    distribution, in integer micro-nats, plus vocab size and volume.

    Determinism (FLOATS.md class C): per (source, token) row one ln of
    c/t floor-quantized to micro-nats; -sum(c * lnq) accumulates in
    DECIMAL(38,0); the final division by t is integral.

    Scale shape: one (source, token) aggregation over the corpus scan;
    everything after runs on the vocabulary-bounded count relation."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("source").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("vocab")
    )
    lnq = F.floor(
        F.log(F.col("c").cast("double") / F.col("t").cast("double")) * 1_000_000
    ).cast("decimal(38,0)")
    return (
        counts.join(F.broadcast(totals), "source")
        .select(
            "source", "t", "vocab",
            (F.col("c").cast("decimal(38,0)") * lnq).alias("w"),
        )
        .groupBy("source")
        .agg(
            F.max("t").cast("bigint").alias("n_tokens"),
            F.max("vocab").cast("bigint").alias("vocab_size"),
            F.expr("CAST(-sum(w) DIV max(t) AS BIGINT)").alias(
                "entropy_micro_nats"
            ),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_ENTROPY = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
),
counts AS (
  SELECT source, token, count(*) AS c FROM toks WHERE token <> '' GROUP BY 1, 2
),
totals AS (
  SELECT source, sum(c) AS t, count(*) AS vocab FROM counts GROUP BY 1
)
SELECT c.source,
       CAST(max(t.t) AS BIGINT) AS n_tokens,
       CAST(max(t.vocab) AS BIGINT) AS vocab_size,
       CAST(-sum(c.c * CAST(floor(ln(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE))
                                  * 1000000) AS BIGINT))
            // max(t.t) AS BIGINT) AS entropy_micro_nats
FROM counts c JOIN totals t ON c.source = t.source
GROUP BY c.source
ORDER BY c.source
"""


# ---------------------------------------------------------------------------
# robust length-outlier detection: the Gopher/RefinedWeb-style cleaning rule
# that flags documents whose token count sits far outside their source's
# typical range, using median/MAD (robust to the outliers being measured —
# mean/stddev would be dragged by exactly the docs we want to flag).

MAD_K = 3  # flag |len - median| > 3 * MAD


def q_docs_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust length profile: exact median token count, exact
    MAD (median absolute deviation), and how many documents sit more
    than MAD_K MADs from the median — the length-based cleaning rule.

    Determinism (FLOATS.md class A): every cell is an integer; both
    medians are type-1 lower medians (smallest value whose cumulative
    count reaches half, compared cross-multiplied as cum*2 >= n).

    Scale shape: the per-doc length projection collapses to a (source,
    len) HISTOGRAM first — length-cardinality-bounded — and both median
    passes (values, then absolute deviations) run cumulative windows
    over that compact relation, never over per-doc rows (the
    pre-aggregated-cumulative-sum recipe); the median/MAD relations are
    |sources|-sized broadcasts back onto the histogram."""
    docs = spread(table(spark, sf_dir, "documents"))
    lens = docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("len"),
    )
    hist = cache_eager(
        lens.groupBy("source", "len").agg(F.count(F.lit(1)).alias("c"))
    )
    n = hist.groupBy("source").agg(F.sum("c").alias("n"))
    w_len = (
        Window.partitionBy("source")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    med = (
        hist.withColumn("cum", F.sum("c").over(w_len))
        .join(F.broadcast(n), "source")
        .filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("source")
        .agg(F.min("len").alias("med"))
    )
    devs = (
        hist.join(F.broadcast(med), "source")
        .select(
            "source",
            F.abs(F.col("len") - F.col("med")).alias("dev"),
            "c",
        )
        .groupBy("source", "dev")
        .agg(F.sum("c").alias("c"))
    )
    w_dev = (
        Window.partitionBy("source")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mad = (
        devs.withColumn("cum", F.sum("c").over(w_dev))
        .join(F.broadcast(n), "source")
        .filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("source")
        .agg(F.min("dev").alias("mad"))
    )
    return (
        hist.join(F.broadcast(med), "source")
        .join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.max("med").cast("bigint").alias("median_len"),
            F.max("mad").cast("bigint").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("len") - F.col("med")) > MAD_K * F.col("mad"),
                    F.col("c"),
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("n_outliers"),
            F.min("len").cast("bigint").alias("min_len"),
            F.max("len").cast("bigint").alias("max_len"),
        )
        .orderBy("source")
    )


ORACLE_LENGTH_OUTLIERS = rf"""
WITH lens AS (
  SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS len
  FROM documents
),
hist AS (SELECT source, len, count(*) AS c FROM lens GROUP BY 1, 2),
n AS (SELECT source, sum(c) AS n FROM hist GROUP BY 1),
med AS (
  SELECT source, min(len) AS med FROM (
    SELECT h.source, h.len,
           sum(h.c) OVER (PARTITION BY h.source ORDER BY h.len
                          ROWS UNBOUNDED PRECEDING) AS cum,
           n.n AS n
    FROM hist h JOIN n ON h.source = n.source
  ) WHERE cum * 2 >= n GROUP BY source
),
devs AS (
  SELECT h.source, abs(h.len - m.med) AS dev, sum(h.c) AS c
  FROM hist h JOIN med m ON h.source = m.source
  GROUP BY 1, 2
),
mad AS (
  SELECT source, min(dev) AS mad FROM (
    SELECT d.source, d.dev,
           sum(d.c) OVER (PARTITION BY d.source ORDER BY d.dev
                          ROWS UNBOUNDED PRECEDING) AS cum,
           n.n AS n
    FROM devs d JOIN n ON d.source = n.source
  ) WHERE cum * 2 >= n GROUP BY source
)
SELECT h.source,
       CAST(sum(h.c) AS BIGINT) AS n_docs,
       CAST(max(m.med) AS BIGINT) AS median_len,
       CAST(max(a.mad) AS BIGINT) AS mad,
       CAST(sum(CASE WHEN abs(h.len - m.med) > {MAD_K} * a.mad
                     THEN h.c ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(min(h.len) AS BIGINT) AS min_len,
       CAST(max(h.len) AS BIGINT) AS max_len
FROM hist h
JOIN med m ON h.source = m.source
JOIN mad a ON h.source = a.source
GROUP BY h.source
ORDER BY h.source
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
# algorithm): guaranteed-overlap local document fingerprinting. Every
# window of WINNOW_W consecutive k-gram hashes contributes its minimum
# (rightmost on ties), so any shared substring of length >= k + W - 1
# tokens is GUARANTEED to share a fingerprint — the local-sampling
# property plain modulo-sampling ("0 mod p") lacks.

WINNOW_K = 3  # token-gram size
WINNOW_W = 4  # window of consecutive gram hashes


def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winnowing fingerprint report (k=3 token-grams, w=4).

    The whole select-min-per-window pass runs INSIDE per-row array
    expressions (transform/aggregate higher-order functions over the
    gram-hash array): gram hashing, the w-window scan with the rightmost
    tie rule, position dedup, and the per-doc fingerprint sum are all
    map-side — the only shuffle in the plan is the final per-source
    rollup. At 100 TB this is the difference between a fingerprint pass
    that costs one scan and one that explodes the token stream w-fold
    through an exchange. fp_hash_sum spot-checks that the SELECTED hash
    multiset (not just its size) matches the oracle's windowed
    row_number formulation exactly; all-integer math.

    Expected-density note: winnowing selects ~2/(w+1) of gram positions
    (the paper's bound); density_permille lands near 400 at w=4."""
    docs = spread(table(spark, sf_dir, "documents"))
    hs = (
        "transform(CASE WHEN size(t) >= 3 THEN sequence(1, size(t) - 2, 1) "
        "ELSE array() END, i -> CAST(conv(substring(md5(concat_ws(' ', "
        "element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))), 1, 8), "
        "16, 10) AS BIGINT))"
    )
    # one struct per window: scan the w positions left->right keeping the
    # min with <= so the RIGHTMOST tie wins (the winnowing tie rule)
    sel = (
        "array_distinct(transform("
        "CASE WHEN size(hs) >= 4 THEN sequence(1, size(hs) - 3, 1) ELSE array() END, "
        "s -> aggregate(sequence(s, s + 3, 1), "
        "named_struct('mh', CAST(9223372036854775807 AS BIGINT), 'mp', -1), "
        "(acc, i) -> CASE WHEN element_at(hs, i) <= acc.mh "
        "THEN named_struct('mh', element_at(hs, i), 'mp', i) ELSE acc END, "
        "acc -> acc.mp)))"
    )
    per_doc = (
        docs.select(
            "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
        )
        .withColumn("hs", F.expr(hs))
        .drop("t")
        .withColumn("sel", F.expr(sel))
        .select(
            "source",
            F.expr("size(hs)").alias("n_grams"),
            F.expr("greatest(size(hs) - 3, 0)").alias("n_windows"),
            F.expr("size(sel)").alias("n_fp"),
            F.expr(
                "aggregate(sel, CAST(0 AS BIGINT), (a, p) -> a + element_at(hs, p))"
            ).alias("fp_sum"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.sum("n_windows").cast("bigint").alias("n_windows"),
            F.sum("n_fp").cast("bigint").alias("n_fingerprints"),
            F.sum("fp_sum").cast("bigint").alias("fp_hash_sum"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_grams",
            "n_windows",
            "n_fingerprints",
            "CAST(n_fingerprints * 1000 DIV nullif(n_windows, 0) AS BIGINT)"
            " AS density_permille",
            "fp_hash_sum",
        )
        .orderBy("source")
    )


ORACLE_WINNOWING = rf"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         CASE WHEN len(t) >= 3 THEN
           list_transform(range(1, len(t) - 1), i ->
             CAST(('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                   1, 8)) AS BIGINT))
         ELSE [] END AS hs
  FROM toks
),
wins AS (
  SELECT doc_id, source, hs, unnest(range(1, len(hs) - 2)) AS s
  FROM grams WHERE len(hs) >= 4
),
scored AS (
  SELECT doc_id, source, s, s + o AS p, hs[s + o] AS h,
         row_number() OVER (PARTITION BY doc_id, s
                            ORDER BY hs[s + o], s + o DESC) AS rn
  FROM (SELECT doc_id, source, hs, s, unnest(range(0, 4)) AS o FROM wins)
),
sel AS (
  SELECT doc_id, source, count(*) AS n_fp, sum(h) AS fp_sum
  FROM (SELECT DISTINCT doc_id, source, p, h FROM scored WHERE rn = 1)
  GROUP BY 1, 2
),
per_doc AS (
  SELECT g.source, len(g.hs) AS n_grams,
         greatest(len(g.hs) - 3, 0) AS n_windows,
         coalesce(s.n_fp, 0) AS n_fp, coalesce(s.fp_sum, 0) AS fp_sum
  FROM grams g LEFT JOIN sel s ON g.doc_id = s.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_grams) AS BIGINT) AS n_grams,
       CAST(sum(n_windows) AS BIGINT) AS n_windows,
       CAST(sum(n_fp) AS BIGINT) AS n_fingerprints,
       CAST(sum(n_fp) * 1000 // nullif(sum(n_windows), 0) AS BIGINT)
         AS density_permille,
       CAST(sum(fp_sum) AS BIGINT) AS fp_hash_sum
FROM per_doc
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM, evaluated on a held-out slice. The MLE
# lanes (text_lm_score / lm_perplexity_buckets) can only score bigrams the
# corpus contains; KN is what a real LM pipeline trains — absolute
# discounting plus the continuation-probability backoff that scores UNSEEN
# bigrams. d = 0.75 is kept as the exact rational 3/4 so every probability
# is a ratio of two BIGINT products:
#   P_KN(w2|w1) = (c2 - 3/4)/c1 + (3/4)(D_w1/c1)(Npre_w2/T)
#               = [(4*c2 - 3)*T + 3*D_w1*Npre_w2] / [4*c1*T]
# (seen; the first term drops when c2 = 0). ONE ln per row on that exact
# rational (both integer operands < 2^53, so the double division is
# bit-identical on both engines), floor-quantized to micro-nats — the
# same FLOATS.md class-C discipline as token_pmi_pairs.

KN_HELDOUT = "src0"  # evaluation slice; the model trains on the rest


def q_kn_bigram_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out KN bigram evaluation: train on source != src0, score src0.

    Per coverage class — 'seen' (bigram in the model), 'backoff' (w1
    known, bigram unseen -> pure continuation mass), 'oov_w1' (history
    never seen), 'oov_cont' (w2 never seen as a continuation) — the
    bigram count and the exact-integer micro-nat log-prob sum.

    Scale shape: the model relations are smaller than the corpus but NOT
    vocabulary-bounded — c2 and npre sit at the bigram-TYPE grain (Heaps-
    sublinear, still corpus-growing), w1g at the unigram grain — so none
    carries a forced broadcast hint; AQE broadcasts while they fit and
    degrades to shuffle joins past the threshold (growth-harness row
    `kn_bigram_smoothing` tracks the 10x trend). The only corpus-sized
    shuffles are the two bigram-count aggregations. No 1-row scalar
    attach exists in the plan (T rides the w1 join), so no BNLJ."""
    docs = spread(table(spark, sf_dir, "documents"))
    # ONE bigram extraction over ONE corpus scan, carrying the source tag;
    # train/eval split afterwards (a filter on the extracted stream), so
    # the token-explode work isn't paid twice
    all_bg, _ = _bigram_lm(docs, "source")
    train_bg = all_bg.filter(F.col("source") != KN_HELDOUT)
    eval_bg = all_bg.filter(F.col("source") == KN_HELDOUT)

    # c2 feeds three consumers (the w1 grain, the continuation grain, and
    # the seen-bigram join) — cache the vocabulary-bounded model relation
    # so the corpus-sized bigram aggregation runs once, not three times
    c2 = cache_eager(
        train_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    )
    w_all = Window.partitionBy()
    c2t = c2.withColumn("ttot", F.count(F.lit(1)).over(w_all))
    w1g = c2t.groupBy("w1").agg(
        F.sum("c2").alias("c1"),
        F.count(F.lit(1)).alias("dw1"),
        F.max("ttot").alias("ttot"),
    )
    npre = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("npre"))

    # no broadcast hints: c2 and npre are bigram-TYPE-grain relations
    # (Heaps-sublinear but NOT vocabulary-bounded — they grow with the
    # corpus), so a forced broadcast would OOM at 100 TB; AQE broadcasts
    # them while they fit and falls back to shuffle joins when they don't
    scored = (
        eval_bg.join(w1g, "w1", "left")
        .join(c2, ["w1", "w2"], "left")
        .join(npre, "w2", "left")
        .withColumn(
            "category",
            F.when(F.col("c1").isNull(), "oov_w1")
            .when(F.col("c2").isNotNull(), "seen")
            .when(F.col("npre").isNull(), "oov_cont")
            .otherwise("backoff"),
        )
        .withColumn(
            "lnq",
            F.when(
                F.col("category").isin("seen", "backoff"),
                F.floor(
                    F.log(
                        (
                            F.coalesce(
                                (F.lit(4) * F.col("c2") - F.lit(3))
                                * F.col("ttot"),
                                F.lit(0),
                            )
                            + F.lit(3) * F.col("dw1") * F.col("npre")
                        ).cast("double")
                        / (F.lit(4) * F.col("c1") * F.col("ttot")).cast(
                            "double"
                        )
                    )
                    * F.lit(LM_Q)
                ).cast("bigint"),
            ),
        )
    )
    return (
        scored.withColumn(
            "count_band",
            F.when(F.col("category") != "seen", F.lit("-"))
            .when(F.col("c2") == 1, "1")
            .when(F.col("c2") <= 3, "2-3")
            .otherwise("4+"),
        )
        .groupBy("category", "count_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("lnq"), F.lit(0)))
            .cast("bigint")
            .alias("sum_lnq"),
        )
        .withColumn(
            "avg_lnq",
            F.when(
                F.col("category").isin("seen", "backoff"),
                # FLOOR division on a negative sum: BOTH Spark DIV and
                # DuckDB // truncate toward zero, so the floor-div
                # identity must be spelled out on BOTH sides (the
                # lm_perplexity_buckets recipe; the r13 sf0.1 sweep
                # caught the oracle still using plain // — the forms
                # agree only when the remainder is 0, which held at
                # sf0.01 and masked the asymmetry for five rounds)
                F.expr(
                    "CAST((sum_lnq - ((sum_lnq % n_bigrams + n_bigrams) "
                    "% n_bigrams)) DIV n_bigrams AS BIGINT)"
                ),
            ),
        )
        .orderBy("category", "count_band")
    )


ORACLE_KN_BIGRAM = rf"""
WITH tok AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
bgi AS (
  SELECT source, toks, unnest(range(1, len(toks))) AS i
  FROM tok WHERE len(toks) >= 2
),
bg AS (SELECT source, toks[i] AS w1, toks[i + 1] AS w2 FROM bgi),
c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bg WHERE source != '{KN_HELDOUT}'
  GROUP BY 1, 2
),
w1g AS (
  SELECT w1, sum(c2) AS c1, count(*) AS dw1,
         (SELECT count(*) FROM c2) AS ttot
  FROM c2 GROUP BY 1
),
npre AS (SELECT w2, count(*) AS npre FROM c2 GROUP BY 1),
scored AS (
  SELECT m.c2,
         CASE WHEN g.c1 IS NULL THEN 'oov_w1'
              WHEN m.c2 IS NOT NULL THEN 'seen'
              WHEN p.npre IS NULL THEN 'oov_cont'
              ELSE 'backoff' END AS category,
         CASE WHEN g.c1 IS NOT NULL AND (m.c2 IS NOT NULL OR p.npre IS NOT NULL)
              THEN floor(ln(
                CAST(coalesce((4 * m.c2 - 3) * g.ttot, 0)
                     + 3 * g.dw1 * p.npre AS DOUBLE)
                / CAST(4 * g.c1 * g.ttot AS DOUBLE)) * {LM_Q}) END AS lnq
  FROM (SELECT w1, w2 FROM bg WHERE source = '{KN_HELDOUT}') e
  LEFT JOIN w1g g USING (w1)
  LEFT JOIN c2 m USING (w1, w2)
  LEFT JOIN npre p USING (w2)
)
SELECT category,
       CASE WHEN category != 'seen' THEN '-'
            WHEN c2 = 1 THEN '1'
            WHEN c2 <= 3 THEN '2-3'
            ELSE '4+' END AS count_band,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(coalesce(lnq, 0)) AS BIGINT) AS sum_lnq,
       -- FLOOR identity, not plain //: the Spark side floors the
       -- negative sum while DuckDB // truncates toward zero — they
       -- agree only when the remainder is 0, which held at sf0.01 but
       -- broke at sf0.1 (r13: 'seen'/'2-3' band, 1 micro-nat off).
       -- Same spelled-out identity as the lm_perplexity_buckets oracle.
       CAST(CASE WHEN category IN ('seen', 'backoff')
                 THEN (sum(coalesce(lnq, 0))
                       - ((sum(coalesce(lnq, 0)) % count(*) + count(*))
                          % count(*))) // count(*) END AS BIGINT)
         AS avg_lnq
FROM scored
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# population stability index: the standard "did my feature distribution
# drift" metric between a reference and a current population. Buckets are
# FIXED length bins (not reference quantiles), so bucket membership is
# pure integer arithmetic; the PSI term keeps its ln on an exact rational
# and defers every division to one integral DIV after the integer sum.

PSI_BIN = 200  # n_chars per fixed bucket
PSI_NBINS = 10  # buckets 0..9 (n_chars DIV 200 capped)


def q_source_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PSI of the doc-length distribution between two
    deterministic md5(doc_id) halves (the stand-in for reference vs
    current ingestion window).

    psi_micro = sum over buckets of
      (cnt_r * N_c - cnt_c * N_r) * floor(ln((cnt_r*N_c)/(cnt_c*N_r))*1e6)
      DIV (N_r * N_c)
    — one ln per (source, bucket) row on an exact rational (class C),
    everything else BIGINT; buckets missing on either side are excluded
    and surfaced in n_skipped_buckets (the standard epsilon-free PSI
    treatment, made explicit instead of silently fudged).

    Scale shape: one (source, half, bucket) aggregation over a 3-column
    pruned scan, then a bucket-grain pivot join — the ln table is
    O(sources x buckets)."""
    docs = spread(table(spark, sf_dir, "documents"))
    binned = docs.select(
        "source",
        # doc_id parity is source-striped in the corpus (each source owns
        # one residue class), so the split hashes instead: md5(doc_id)
        # low bit — deterministic, engine-replicable, source-independent
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 2
            == 0
        ).alias("is_ref"),
        F.least(
            F.expr(f"CAST(n_chars DIV {PSI_BIN} AS INT)"), F.lit(PSI_NBINS - 1)
        ).alias("bucket"),
    )
    counts = binned.groupBy("source", "bucket").agg(
        F.sum(F.col("is_ref").cast("bigint")).alias("cr"),
        F.sum((~F.col("is_ref")).cast("bigint")).alias("cc"),
    )
    w_src = Window.partitionBy("source")
    terms = (
        counts.withColumn("nr", F.sum("cr").over(w_src))
        .withColumn("nc", F.sum("cc").over(w_src))
        .withColumn(
            "lnq",
            F.when(
                (F.col("cr") > 0) & (F.col("cc") > 0),
                F.floor(
                    F.log(
                        (F.col("cr") * F.col("nc")).cast("double")
                        / (F.col("cc") * F.col("nr")).cast("double")
                    )
                    * F.lit(1_000_000)
                ).cast("bigint"),
            ),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("nr").cast("bigint").alias("n_ref"),
            F.max("nc").cast("bigint").alias("n_cur"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum((F.col("lnq").isNull()).cast("bigint"))
            .cast("bigint")
            .alias("n_skipped_buckets"),
            F.sum(
                F.when(
                    F.col("lnq").isNotNull(),
                    (F.col("cr") * F.col("nc") - F.col("cc") * F.col("nr"))
                    * F.col("lnq"),
                ).otherwise(F.lit(0))
            ).alias("num"),
            # nullif: a source whose docs all hash to one md5 parity has
            # an empty half (den = 0) — NULL psi on BOTH engines instead
            # of a Spark-NULL / DuckDB-raise divergence (FLOATS.md class E)
            F.expr("nullif(max(nr * nc), 0)").alias("den"),
        )
        .selectExpr(
            "source",
            "n_ref",
            "n_cur",
            "n_buckets",
            "n_skipped_buckets",
            # floor-div identity, spelled out on BOTH engines (the r14
            # division audit). num is in fact provably >= 0 — each term
            # is d * floor(ln(ratio)*1e6) where d and the floored ln
            # share a sign (d<0 -> ratio<1 -> floor(ln*1e6) <= -1;
            # d>0 -> floor >= 0; d=0 -> 0), so the product is never
            # negative and floor == truncate here — but the identity is
            # kept IDENTICAL on both sides so the site never depends on
            # that proof (the kn_bigram_smoothing lesson, commit 74730ca)
            "CAST((num - ((num % den + den) % den)) DIV den AS BIGINT)"
            " AS psi_micro",
        )
        .orderBy("source")
    )


ORACLE_PSI_DRIFT = f"""
WITH binned AS (
  SELECT source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 = 0 AS is_ref,
         least(CAST(n_chars // {PSI_BIN} AS INT), {PSI_NBINS - 1}) AS bucket
  FROM documents
),
counts AS (
  SELECT source, bucket,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
  FROM binned GROUP BY 1, 2
),
terms AS (
  SELECT source, cr, cc,
         sum(cr) OVER (PARTITION BY source) AS nr,
         sum(cc) OVER (PARTITION BY source) AS nc,
         CASE WHEN cr > 0 AND cc > 0 THEN
           CAST(floor(ln(CAST(cr * sum(cc) OVER (PARTITION BY source) AS DOUBLE)
                         / CAST(cc * sum(cr) OVER (PARTITION BY source) AS DOUBLE))
                      * 1000000) AS BIGINT)
         END AS lnq
  FROM counts
),
agg AS (
  SELECT source,
         CAST(max(nr) AS BIGINT) AS n_ref,
         CAST(max(nc) AS BIGINT) AS n_cur,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(CASE WHEN lnq IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_skipped_buckets,
         CAST(sum(CASE WHEN lnq IS NOT NULL
                       THEN (cr * nc - cc * nr) * lnq ELSE 0 END)
              AS BIGINT) AS num,
         CAST(nullif(max(nr) * max(nc), 0) AS BIGINT) AS den
  FROM terms
  GROUP BY 1
)
SELECT source, n_ref, n_cur, n_buckets, n_skipped_buckets,
       -- the spelled-out floor identity, matching the Spark side
       -- EXACTLY (r14 division audit): plain // truncates toward zero
       -- on BIGINT while Spark's form floors; num is provably >= 0 so
       -- they agree, but the convention must not rest on that proof
       -- (the kn_bigram_smoothing lesson, commit 74730ca)
       CAST((num - ((num % den + den) % den)) // den AS BIGINT)
         AS psi_micro
FROM agg
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve: what fraction of all corpus tokens the top-K
# vocabulary covers — the tokenizer-budget question (how big must the
# vocab be) answered as a cumulative-share curve at standard K points.

COVERAGE_KS = (10, 100, 1000)


def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token coverage of the top-K vocabulary, K in {10, 100,
    1000}. Rank ties break lexicographically so the curve is exact and
    stable. All-integer: covered * 1000 DIV total.

    Scale shape (two-phase top-K, r9): one token count aggregation (the
    corpus-sized shuffle) feeds a cached vocabulary-count relation; each
    K point is then ``orderBy().limit(K)`` — a parallel
    TakeOrderedAndProject (partial top-K per partition, NO
    single-partition sort and NO window at all over the 1e8+-row
    web-scale vocabulary) — followed by a 1-row sum. The corpus token
    total is a plain 1-row aggregate attached to the 3-row K relation
    (BNLJ_ALLOWED metadata attach)."""
    docs = spread(table(spark, sf_dir, "documents"))
    # the vocabulary-count relation feeds FOUR consumers (the total and
    # one top-K leg per K point) — cache it once; the corpus is tokenized
    # and shuffled exactly once, and every consumer reads the Heaps-
    # bounded cache (the same lifetime discipline as the BPE word cache)
    counts = cache_eager(
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").cast("bigint").alias("tokens_total"))
    legs = [
        counts.orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(k)
        .agg(F.sum("c").cast("bigint").alias("tokens_covered"))
        .selectExpr(f"CAST({k} AS BIGINT) AS k", "tokens_covered")
        for k in COVERAGE_KS
    ]
    curve = legs[0]
    for leg in legs[1:]:
        curve = curve.unionByName(leg)
    return (
        curve.join(F.broadcast(total))
        .selectExpr(
            "CAST(k AS BIGINT) AS k",
            "tokens_covered",
            "tokens_total",
            "CAST(tokens_covered * 1000 DIV tokens_total AS BIGINT)"
            " AS coverage_permille",
        )
        .orderBy("k")
    )


ORACLE_VOCAB_COVERAGE = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
counts AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
ranked AS (
  SELECT c,
         row_number() OVER (ORDER BY c DESC, token ASC) AS r,
         sum(c) OVER (ORDER BY c DESC, token ASC ROWS UNBOUNDED PRECEDING)
           AS cum,
         sum(c) OVER () AS total
  FROM counts
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(max(cum) AS BIGINT) AS tokens_covered,
       CAST(max(total) AS BIGINT) AS tokens_total,
       CAST(max(cum) * 1000 // max(total) AS BIGINT) AS coverage_permille
FROM ranked, (SELECT unnest([{", ".join(str(k) for k in COVERAGE_KS)}]) AS k)
WHERE r <= k
GROUP BY k
ORDER BY k
"""


# ---------------------------------------------------------------------------
# moments merge proof: the third mergeable-summary invariant gate (HLL
# registers and equi-width histograms already have one). Mean/variance at
# 100 TB are computed from per-shard sufficient statistics (n, sum,
# sum-of-squares) merged by plain addition — this query PROVES merged ==
# direct in-engine, per source, on exact integers.


def q_moments_merge_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc-length moments via two md5(doc_id) shards, merged
    and compared against the direct single-pass computation.

    The sufficient statistics (n, sum(n_chars), sum(n_chars^2)) are
    BIGINTs, so merged-vs-direct equality is exact — mismatch = 0 is the
    invariant the gate hashes. Mean and variance emit as integral micro
    units from the merged stats: var = (n*ss - s^2) DIV n^2 scaled —
    the population-variance rational, no float path anywhere.

    Scale shape: one (source, shard) aggregation with map-side combine,
    a source-grain merge, and a second direct aggregation that exists
    only to prove the merge (production keeps the shards)."""
    docs = spread(table(spark, sf_dir, "documents"))
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
    )
    base = docs.select(
        "source", shard.alias("shard"), F.col("n_chars").cast("bigint").alias("x")
    )
    per_shard = base.groupBy("source", "shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    merged = per_shard.groupBy("source").agg(
        F.sum("n").alias("mn"), F.sum("s").alias("ms"), F.sum("ss").alias("mss")
    )
    direct = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("dn"),
        F.sum("x").alias("ds"),
        F.sum(F.col("x") * F.col("x")).alias("dss"),
    )
    return (
        merged.join(direct, "source")
        .selectExpr(
            "source",
            "CAST(mn AS BIGINT) AS n_docs",
            "CAST(CASE WHEN mn = dn AND ms = ds AND mss = dss "
            "THEN 0 ELSE 1 END AS BIGINT) AS merge_mismatch",
            "CAST(ms * 1000000 DIV mn AS BIGINT) AS mean_micro",
            # two-stage division keeps the intermediate under 2^63 at any
            # shard size (single-stage *1e6 would overflow near ~2.5k
            # docs/source); both engines evaluate the identical staging
            "CAST(((mn * mss - ms * ms) DIV mn) * 1000000 DIV mn AS BIGINT)"
            " AS var_micro",
        )
        .orderBy("source")
    )


ORACLE_MOMENTS_MERGE = """
WITH base AS (
  SELECT source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 AS shard,
         CAST(n_chars AS BIGINT) AS x
  FROM documents
),
per_shard AS (
  SELECT source, shard, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
  FROM base GROUP BY 1, 2
),
merged AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS mn, CAST(sum(s) AS BIGINT) AS ms,
         CAST(sum(ss) AS BIGINT) AS mss
  FROM per_shard GROUP BY 1
),
direct AS (
  SELECT source, CAST(count(*) AS BIGINT) AS dn, CAST(sum(x) AS BIGINT) AS ds,
         CAST(sum(x * x) AS BIGINT) AS dss
  FROM base GROUP BY 1
)
SELECT m.source,
       mn AS n_docs,
       CAST(CASE WHEN mn = dn AND ms = ds AND mss = dss
            THEN 0 ELSE 1 END AS BIGINT) AS merge_mismatch,
       CAST(ms * 1000000 // mn AS BIGINT) AS mean_micro,
       CAST(((mn * mss - ms * ms) // mn) * 1000000 // mn AS BIGINT)
         AS var_micro
FROM merged m JOIN direct d ON m.source = d.source
ORDER BY m.source
"""


# ---------------------------------------------------------------------------
# corpus saturation curve: how fast new data stops contributing new
# n-grams. Docs are bucketed into 10 ingestion deciles (doc_id order —
# the corpus's arrival proxy); a 3-gram is NEW in the first decile that
# contains it. Falling novelty permille across deciles is the "we've
# seen this web before" signal that caps useful corpus growth.


def q_corpus_saturation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ingestion decile: total 3-gram occurrences, first-seen gram
    types, and novelty permille (new types per occurrence).

    All counts are exact integers; the first-seen decile is a min
    aggregate over the hashed-gram relation (one corpus-sized shuffle),
    deciles from ntile-free integer math on doc_id rank is avoided —
    the decile is doc_id DIV bucket-width over the known id range, kept
    as pure arithmetic so both engines bucket identically.

    Scale shape: gram hashing is map-side (same array program family as
    winnowing); one (gram -> min decile) aggregation plus one
    occurrence-count aggregation, both gram-keyed; final math on 10 rows."""
    docs = spread(table(spark, sf_dir, "documents"))
    # decile by doc_id ORDER (rank) would need a global sort; doc_id
    # ranges are dense in the corpus, so integer range-bucketing gives
    # the same ingestion-order semantics with zero extra shuffles. The
    # lo/span bounds ride the plan as a 1-row aggregate cross-join
    # (BNLJ_ALLOWED metadata attach) instead of an eager collect(), so
    # building the DataFrame stays lazy like every other registered query
    bounds = docs.agg(
        F.min("doc_id").alias("_lo"),
        F.greatest(
            F.max("doc_id") - F.min("doc_id") + F.lit(1), F.lit(1)
        ).alias("_span"),
    )
    grams = (
        docs.join(F.broadcast(bounds))
        .selectExpr(
            "CAST(least((doc_id - _lo) * 10 DIV _span, 9) AS BIGINT)"
            " AS decile",
            "split(trim(text), '\\\\s+') AS t",
        )
        .selectExpr(
            "decile",
            "explode(transform(CASE WHEN size(t) >= 3 "
            "THEN sequence(1, size(t) - 2, 1) ELSE array() END, "
            "i -> CAST(conv(substring(md5(concat_ws(' ', element_at(t, i), "
            "element_at(t, i + 1), element_at(t, i + 2))), 1, 8), 16, 10) "
            "AS BIGINT))) AS g",
        )
    )
    first_seen = grams.groupBy("g").agg(F.min("decile").alias("first_decile"))
    occ = grams.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    new_types = first_seen.groupBy(
        F.col("first_decile").alias("decile")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_new_types"))
    return (
        occ.join(new_types, "decile", "left")
        .selectExpr(
            "decile",
            "n_occurrences",
            "CAST(coalesce(n_new_types, 0) AS BIGINT) AS n_new_types",
            "CAST(coalesce(n_new_types, 0) * 1000 DIV n_occurrences AS BIGINT)"
            " AS novelty_permille",
        )
        .orderBy("decile")
    )


def _oracle_saturation(sf_dir: str | None = None) -> str:
    return r"""
WITH bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
gi AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 3
),
grams AS (
  SELECT CAST(least((g.doc_id - b.lo) * 10 // (greatest(b.hi - b.lo + 1, 1)), 9)
              AS BIGINT) AS decile,
         CAST(('0x' || substr(md5(g.t[g.i] || ' ' || g.t[g.i+1] || ' ' ||
               g.t[g.i+2]), 1, 8)) AS BIGINT) AS gram
  FROM gi g, bounds b
),
occ AS (SELECT decile, count(*) AS n_occurrences FROM grams GROUP BY 1),
first_seen AS (SELECT gram, min(decile) AS first_decile FROM grams GROUP BY 1),
new_types AS (
  SELECT first_decile AS decile, count(*) AS n_new_types
  FROM first_seen GROUP BY 1
)
SELECT o.decile,
       CAST(o.n_occurrences AS BIGINT) AS n_occurrences,
       CAST(coalesce(n.n_new_types, 0) AS BIGINT) AS n_new_types,
       CAST(coalesce(n.n_new_types, 0) * 1000 // o.n_occurrences AS BIGINT)
         AS novelty_permille
FROM occ o LEFT JOIN new_types n ON o.decile = n.decile
ORDER BY o.decile
"""


ORACLE_SATURATION = _oracle_saturation()


# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-broken): does document length predict the
# quality score? Pearson on row_number ranks with a deterministic doc_id
# tiebreak — the ranks are exact BIGINTs, so the sufficient statistics are
# integers and the one sqrt/division happens at the output boundary (the
# quantity_price_corr recipe applied to ranks).


def q_docs_length_quality_spearman(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source Spearman correlation between n_chars and the quality
    blend, ranks tie-broken by doc_id on BOTH axes (documented variant:
    deterministic everywhere, standard average-rank Spearman differs
    only under ties).

    Scale shape: two rank windows partitioned by source (the exchanges
    any per-source ranking pays), one integer sufficient-statistics
    aggregation, 20 output rows."""
    docs = spread(table(spark, sf_dir, "documents"))
    base = docs.select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("len"),
        quality_expr().alias("q"),
    )
    wx = Window.partitionBy("source").orderBy("len", "doc_id")
    wy = Window.partitionBy("source").orderBy("q", "doc_id")
    ranked = base.select(
        "source",
        F.row_number().over(wx).cast("bigint").alias("rx"),
        F.row_number().over(wy).cast("bigint").alias("ry"),
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return agg.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(num / den, 6).alias("spearman"),
    ).orderBy("source")


ORACLE_SPEARMAN = f"""
WITH base AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS len,
         {O_QUALITY_EXPR} AS q
  FROM documents
),
ranked AS (
  SELECT source,
         CAST(row_number() OVER (PARTITION BY source ORDER BY len, doc_id)
              AS BIGINT) AS rx,
         CAST(row_number() OVER (PARTITION BY source ORDER BY q, doc_id)
              AS BIGINT) AS ry
  FROM base
),
agg AS (
  SELECT source, count(*) AS n,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx * rx) AS BIGINT) AS sxx,
         CAST(sum(ry * ry) AS BIGINT) AS syy,
         CAST(sum(rx * ry) AS BIGINT) AS sxy
  FROM ranked GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS spearman
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# token burstiness (Church/Gale): how concentrated a token's occurrences
# are — df/cf near 1 means it appears once per document (function-word
# behavior), low df/cf means it bursts inside few documents (topical
# behavior). Per-token integers over the vocabulary-bounded relation.


def q_token_burstiness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by corpus frequency with collection frequency,
    document frequency, df-per-1000-occurrences, and occurrences per
    million tokens — all integral.

    Scale shape: one (token, doc) distinct aggregation + one token
    aggregation (the shuffles every df/cf computation pays); top-20 is
    TakeOrderedAndProject on the vocabulary-bounded relation."""
    docs = spread(table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    per_tok = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    w_all = Window.partitionBy()
    return (
        per_tok.withColumn("total", F.sum("cf").over(w_all))
        .selectExpr(
            "token",
            "CAST(cf AS BIGINT) AS cf",
            "CAST(df AS BIGINT) AS df",
            "CAST(df * 1000 DIV cf AS BIGINT) AS df_per_1000_occ",
            "CAST(cf * 1000000 DIV total AS BIGINT) AS occ_ppm",
        )
        .orderBy(F.col("cf").desc(), F.col("token").asc())
        .limit(20)
    )


ORACLE_BURSTINESS = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
),
per_tok AS (
  SELECT token, count(*) AS cf, count(DISTINCT doc_id) AS df
  FROM tok GROUP BY 1
)
SELECT token,
       CAST(cf AS BIGINT) AS cf,
       CAST(df AS BIGINT) AS df,
       CAST(df * 1000 // cf AS BIGINT) AS df_per_1000_occ,
       CAST(cf * 1000000 // sum(cf) OVER () AS BIGINT) AS occ_ppm
FROM per_tok
ORDER BY cf DESC, token ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# alpha-smoothed (temperature) mixture weights: the multilingual-sampling
# recipe (XLM/mBERT-style): sampling probability proportional to
# share^alpha with alpha = 0.5 flattens the source distribution so
# low-resource domains are upsampled without drowning the head. The
# sqrt makes this the ONE operator here allowed a non-rational function:
# IEEE-754 sqrt is CORRECTLY ROUNDED (unlike exp/ln's ulp wobble), so
# floor(sqrt(exact-int ratio) * 1e6) is bit-identical on both engines.

MIX_ALPHA_NOTE = "alpha = 0.5 (square-root smoothing)"


def q_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: token count, raw corpus share (bp), the alpha=0.5
    smoothed weight (micro), the normalized sampling probability (bp),
    and the up/down-weighting factor vs raw share (permille; >1000 =
    upsampled) — the table a mixture-weighted training run is configured
    from, next to corpus_mix_report's raw shares.

    Scale shape: ONE (source)-keyed aggregation over the token counts
    (map-side size() — no explode); every window runs on the bounded
    |sources|-row relation (the calendar-spine adjudication class)."""
    docs = spread(table(spark, sf_dir, "documents"))
    per = (
        docs.select(
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            .cast("bigint")
            .alias("t"),
        )
        .groupBy("source")
        .agg(F.sum("t").alias("tokens"))
    )
    w_all = Window.partitionBy()  # |sources|-row bounded relation only
    return (
        per.withColumn("total", F.sum("tokens").over(w_all))
        .withColumn(
            "w_micro",
            F.expr(
                "CAST(floor(sqrt(CAST(tokens AS DOUBLE) / CAST(total AS"
                " DOUBLE)) * 1000000) AS BIGINT)"
            ),
        )
        .withColumn("wsum", F.sum("w_micro").over(w_all))
        .selectExpr(
            "source",
            "tokens",
            "CAST(tokens * 10000 DIV total AS BIGINT) AS share_bp",
            "w_micro AS temp_weight_micro",
            "CAST(w_micro * 10000 DIV wsum AS BIGINT) AS sample_bp",
            # greatest() guard: a source can round to 0 bp share while its
            # smoothed weight cannot — keeps the column non-null BIGINT
            "CAST(w_micro * 10000 DIV wsum * 1000"
            " DIV greatest(tokens * 10000 DIV total, 1) AS BIGINT)"
            " AS boost_permille",
        )
        .orderBy("source")
    )


ORACLE_SOURCE_MIXTURE = r"""
WITH toks AS (
  SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
),
per AS (SELECT source, CAST(sum(t) AS BIGINT) AS tokens FROM toks GROUP BY 1),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM per),
w AS (
  SELECT source, tokens, total,
         CAST(floor(sqrt(CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE))
                    * 1000000) AS BIGINT) AS w_micro
  FROM per, tot
),
ws AS (SELECT CAST(sum(w_micro) AS BIGINT) AS wsum FROM w)
SELECT source, tokens,
       CAST(tokens * 10000 // total AS BIGINT) AS share_bp,
       w_micro AS temp_weight_micro,
       CAST(w_micro * 10000 // wsum AS BIGINT) AS sample_bp,
       CAST(w_micro * 10000 // wsum * 1000
            // greatest(tokens * 10000 // total, 1) AS BIGINT)
         AS boost_permille
FROM w, ws
ORDER BY source
"""


# ---------------------------------------------------------------------------
# data selection under a token budget: rank the corpus by quality, admit
# greedily until the budget fills — the "what quality cutoff does a 50%
# token budget buy" question every curation run answers before training.

BUDGET_PCTS = (25, 50, 75)


def q_docs_token_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per token-budget (pct of corpus tokens): how many of the
    highest-quality docs fit, the tokens actually admitted, the quality
    score at the cutoff (the operational keep-threshold), and the
    budget fill rate (bp; <10000 because the marginal doc rarely lands
    exactly on the boundary).

    Scale shape: the global quality ranking carries NO global window —
    ``with_global_prefix_sum`` (ranks.py) range-partitions on the sort
    key and cumsums each slice in parallel, turning per-partition totals
    (a metadata-sized collect) into literal offsets, exactly the
    zipWithIndex recipe with_global_rank uses for ranks. The budget
    fan-out is a 3-literal explode; the final aggregation has
    |budgets| groups."""
    from .ranks import with_global_prefix_sum

    docs = spread(table(spark, sf_dir, "documents"))
    qs = quality_score_from(docs).select("doc_id", "quality_score")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("t"),
    )
    per = qs.join(toks, "doc_id").select(
        "doc_id",
        "quality_score",
        (F.col("quality_score") * -1).alias("negq"),
        "t",
    )
    cum = with_global_prefix_sum(
        per, "t", "negq", "doc_id", sum_col="cum_t", total_col="tot_t"
    )
    pcts = ", ".join(str(p) for p in BUDGET_PCTS)
    fan = cum.selectExpr(
        "quality_score", "cum_t", "tot_t", f"explode(array({pcts})) AS budget_pct"
    ).filter(F.expr("cum_t <= tot_t * budget_pct DIV 100"))
    return (
        fan.groupBy("budget_pct")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
            F.max("cum_t").cast("bigint").alias("tokens_kept"),
            F.min("quality_score").alias("cutoff_quality"),
            F.max("tot_t").alias("tot_t"),
        )
        .selectExpr(
            "CAST(budget_pct AS INT) AS budget_pct",
            "n_docs_kept",
            "tokens_kept",
            "cutoff_quality",
            "CAST(tokens_kept * 10000"
            " DIV greatest(tot_t * budget_pct DIV 100, 1) AS BIGINT)"
            " AS fill_bp",
        )
        .orderBy("budget_pct")
    )


ORACLE_TOKEN_BUDGET = rf"""
WITH q AS ({ORACLE_QUALITY_SCORE}),
toks AS (
  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS t
  FROM documents
),
per AS (
  SELECT q.doc_id, q.quality_score, toks.t
  FROM q JOIN toks USING (doc_id)
),
cum AS (
  SELECT quality_score,
         sum(t) OVER (ORDER BY quality_score DESC, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_t,
         sum(t) OVER () AS tot_t
  FROM per
),
fan AS (
  SELECT * FROM cum CROSS JOIN (VALUES {", ".join(f"({p})" for p in BUDGET_PCTS)}) b(budget_pct)
  WHERE cum_t <= tot_t * budget_pct // 100
)
SELECT CAST(budget_pct AS INT) AS budget_pct,
       CAST(count(*) AS BIGINT) AS n_docs_kept,
       CAST(max(cum_t) AS BIGINT) AS tokens_kept,
       min(quality_score) AS cutoff_quality,
       CAST(max(cum_t) * 10000
            // greatest(max(tot_t) * budget_pct // 100, 1) AS BIGINT)
         AS fill_bp
FROM fan
GROUP BY budget_pct
ORDER BY budget_pct
"""


# ---------------------------------------------------------------------------
# token-length histogram: the tokenizer-sizing diagnostic next to the
# fertility and vocab-coverage reports — how long the whitespace tokens a
# subword model must cover actually are, by types and by occurrences.


def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per token character length: distinct token types, total
    occurrences, and the occurrence share (bp). A long types-tail with a
    short occurrence mass is the classic Zipf shape a BPE vocab exploits;
    mass at long lengths means byte-fallback pressure.

    Scale shape: ONE (token)-keyed aggregation over the corpus scan
    (map-side combined); the length regroup and share window run on the
    vocabulary-bounded relation."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    w_all = Window.partitionBy()  # bounded length-class relation
    return (
        tf.groupBy(F.length("token").cast("bigint").alias("token_len"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("c").cast("bigint").alias("n_occurrences"),
        )
        .withColumn("tot", F.sum("n_occurrences").over(w_all))
        .selectExpr(
            "token_len",
            "n_types",
            "n_occurrences",
            "CAST(n_occurrences * 10000 DIV tot AS BIGINT) AS occ_share_bp",
        )
        .orderBy("token_len")
    )


ORACLE_TOKEN_LENGTH_HISTOGRAM = r"""
WITH toks AS (
  SELECT token FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
  ) WHERE token != ''
),
tf AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
classes AS (
  SELECT CAST(length(token) AS BIGINT) AS token_len,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c) AS BIGINT) AS n_occurrences
  FROM tf GROUP BY 1
)
SELECT token_len, n_types, n_occurrences,
       CAST(n_occurrences * 10000 // sum(n_occurrences) OVER () AS BIGINT)
         AS occ_share_bp
FROM classes
ORDER BY token_len
"""


# ---------------------------------------------------------------------------
# corpus hygiene ladder: how many docs are degenerate BEFORE any quality
# model runs — the cheap structural classes every ingest pipeline counts
# first (empty, whitespace-only, single-token, short, dominated by
# non-alpha). Mutually exclusive classes by first match, so the ladder
# partitions the corpus and the counts reconcile exactly.

HYGIENE_SHORT_TOKENS = 5


def q_docs_hygiene_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per hygiene class (first match wins): doc count and corpus share
    (bp). Classes: empty (zero chars), whitespace_only, single_token,
    short (< HYGIENE_SHORT_TOKENS tokens), low_alpha (alpha ratio under
    half), clean. The class counts partition the corpus — a reconciled
    intake funnel, not overlapping flags.

    Scale shape: one narrow map over the scan, one bounded-class
    aggregation; the share window runs on the <= 6-row relation."""
    docs = spread(table(spark, sf_dir, "documents"))
    cls = (
        "CASE WHEN text IS NULL OR length(text) = 0 THEN 'empty' "
        "WHEN length(trim(text)) = 0 THEN 'whitespace_only' "
        "WHEN size(split(trim(text), '\\\\s+')) = 1 THEN 'single_token' "
        f"WHEN size(split(trim(text), '\\\\s+')) < {HYGIENE_SHORT_TOKENS}"
        " THEN 'short' "
        "WHEN length(regexp_replace(trim(text), '[^A-Za-z]', '')) * 2"
        " < length(trim(text)) THEN 'low_alpha' "
        "ELSE 'clean' END"
    )
    w_all = Window.partitionBy()  # <= 6-row class relation
    return (
        docs.selectExpr(f"{cls} AS hygiene_class")
        .groupBy("hygiene_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn("tot", F.sum("n_docs").over(w_all))
        .selectExpr(
            "hygiene_class",
            "n_docs",
            "CAST(n_docs * 10000 DIV tot AS BIGINT) AS share_bp",
        )
        .orderBy("hygiene_class")
    )


# --- inspection pack: K deterministic sample docs per hygiene class for
# the human-QA loop (the counts say HOW MANY are degenerate; reviewers
# need to SEE a few of each to trust the classifier). "Random" is the
# md5 of the doc id — reproducible across engines and runs, uncorrelated
# with ingestion order.

INSPECTION_PER_CLASS = 3


def q_docs_sample_inspection_pack(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per hygiene class: the INSPECTION_PER_CLASS sample docs with the
    smallest md5(doc_id) — a deterministic pseudo-random pick.

    Scale shape: the per-class top-K is the TWO-PHASE rewrite (the
    vocab_oov_report convention): phase 1 keeps K per (class, salt)
    partition — every partition bounded at |class|/32 — and phase 2
    ranks only the <= classes x 32 x K survivors, so no window ever
    sees an unbounded partition. The salt is engine-local (Spark hash):
    it only shards phase 1; the final top-K per class is salt-invariant,
    which is why the oracle needs no salt at all."""
    docs = spread(table(spark, sf_dir, "documents"))
    cls = (
        "CASE WHEN text IS NULL OR length(text) = 0 THEN 'empty' "
        "WHEN length(trim(text)) = 0 THEN 'whitespace_only' "
        "WHEN size(split(trim(text), '\\\\s+')) = 1 THEN 'single_token' "
        f"WHEN size(split(trim(text), '\\\\s+')) < {HYGIENE_SHORT_TOKENS}"
        " THEN 'short' "
        "WHEN length(regexp_replace(trim(text), '[^A-Za-z]', '')) * 2"
        " < length(trim(text)) THEN 'low_alpha' "
        "ELSE 'clean' END"
    )
    classed = docs.selectExpr(
        "doc_id",
        f"{cls} AS hygiene_class",
        "md5(CAST(doc_id AS STRING)) AS mk",
        "CAST(pmod(hash(doc_id), 32) AS INT) AS salt",
    )
    w1 = Window.partitionBy("hygiene_class", "salt").orderBy("mk", "doc_id")
    survivors = classed.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= INSPECTION_PER_CLASS
    )
    w2 = Window.partitionBy("hygiene_class").orderBy("mk", "doc_id")
    return (
        survivors.withColumn("pick", F.row_number().over(w2))
        .filter(F.col("pick") <= INSPECTION_PER_CLASS)
        .selectExpr("hygiene_class", "CAST(pick AS BIGINT) AS pick", "doc_id")
        .orderBy("hygiene_class", "pick")
    )


ORACLE_INSPECTION_PACK = rf"""
WITH classed AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR length(text) = 0 THEN 'empty'
              WHEN length(trim(text)) = 0 THEN 'whitespace_only'
              WHEN len(regexp_split_to_array(trim(text), '\s+')) = 1
                THEN 'single_token'
              WHEN len(regexp_split_to_array(trim(text), '\s+'))
                   < {HYGIENE_SHORT_TOKENS} THEN 'short'
              WHEN length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) * 2
                   < length(trim(text)) THEN 'low_alpha'
              ELSE 'clean' END AS hygiene_class,
         md5(CAST(doc_id AS VARCHAR)) AS mk
  FROM documents
)
SELECT hygiene_class, CAST(pick AS BIGINT) AS pick, doc_id
FROM (
  SELECT hygiene_class, doc_id,
         row_number() OVER (PARTITION BY hygiene_class ORDER BY mk, doc_id)
           AS pick
  FROM classed
)
WHERE pick <= {INSPECTION_PER_CLASS}
ORDER BY hygiene_class, pick
"""


ORACLE_HYGIENE_REPORT = rf"""
WITH classed AS (
  SELECT CASE WHEN text IS NULL OR length(text) = 0 THEN 'empty'
              WHEN length(trim(text)) = 0 THEN 'whitespace_only'
              WHEN len(regexp_split_to_array(trim(text), '\s+')) = 1
                THEN 'single_token'
              WHEN len(regexp_split_to_array(trim(text), '\s+'))
                   < {HYGIENE_SHORT_TOKENS} THEN 'short'
              WHEN length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) * 2
                   < length(trim(text)) THEN 'low_alpha'
              ELSE 'clean' END AS hygiene_class
  FROM documents
),
agg AS (
  SELECT hygiene_class, CAST(count(*) AS BIGINT) AS n_docs
  FROM classed GROUP BY 1
)
SELECT hygiene_class, n_docs,
       CAST(n_docs * 10000 // sum(n_docs) OVER () AS BIGINT) AS share_bp
FROM agg
ORDER BY hygiene_class
"""


# ---------------------------------------------------------------------------
# char-class profile: the composition diagnostic quality filters are tuned
# against — what share of each source's bytes is letters vs digits vs
# whitespace vs other. A source whose digit share spikes is tables/logs,
# not prose; the hygiene ladder's low_alpha gate is one threshold on this
# distribution, the profile is the whole distribution.


def q_docs_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: total chars and the letters/digits/whitespace/other
    permille split. Counts come from length-difference after class
    removal (one regexp pass per class, all map-side); permille is
    integer sum*1000 DIV total.

    Scale shape: pure map + one source-keyed aggregation with map-side
    combine — no joins, no windows."""
    docs = spread(table(spark, sf_dir, "documents"))
    per = docs.selectExpr(
        "source",
        "CAST(length(text) AS BIGINT) AS n",
        "CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', ''))"
        " AS BIGINT) AS letters",
        "CAST(length(text) - length(regexp_replace(text, '[0-9]', ''))"
        " AS BIGINT) AS digits",
        "CAST(length(text) - length(regexp_replace(text, '\\\\s', ''))"
        " AS BIGINT) AS spaces",
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_chars"),
            F.sum("letters").cast("bigint").alias("l"),
            F.sum("digits").cast("bigint").alias("d"),
            F.sum("spaces").cast("bigint").alias("s"),
        )
        .selectExpr(
            "source",
            "n_chars",
            "CAST(l * 1000 DIV n_chars AS BIGINT) AS letters_pm",
            "CAST(d * 1000 DIV n_chars AS BIGINT) AS digits_pm",
            "CAST(s * 1000 DIV n_chars AS BIGINT) AS space_pm",
            "CAST((n_chars - l - d - s) * 1000 DIV n_chars AS BIGINT)"
            " AS other_pm",
        )
        .orderBy("source")
    )


ORACLE_CHARCLASS_PROFILE = r"""
WITH per AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS n,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS letters,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS digits,
         CAST(length(text) - length(regexp_replace(text, '\s', '', 'g'))
              AS BIGINT) AS spaces
  FROM documents
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_chars,
       CAST(sum(letters) * 1000 // sum(n) AS BIGINT) AS letters_pm,
       CAST(sum(digits) * 1000 // sum(n) AS BIGINT) AS digits_pm,
       CAST(sum(spaces) * 1000 // sum(n) AS BIGINT) AS space_pm,
       CAST((sum(n) - sum(letters) - sum(digits) - sum(spaces)) * 1000
            // sum(n) AS BIGINT) AS other_pm
FROM per
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Simpson diversity: how CONCENTRATED is each source's token mass?
# lambda = sum c_i (c_i - 1) / (N (N - 1)) is the probability two tokens
# drawn without replacement are the same type — the inverse view of the
# entropy family (source_token_entropy), but ALL-INTEGER (FLOATS.md
# class D: two exact sums and one integral quotient, no ln), so it is
# the diversity number that needs no quantization discipline at all.
# Templated/duplicated sources read high; natural text reads low.


def q_text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: token count, type count, the Simpson concentration
    index in permille, and the heaviest type's share in permille (the
    one-term upper bound a spot-checker compares against).

    Scale shape: one token explode + (source, token) count (the
    vocabulary shuffle every LM statistic pays, map-side combined), one
    per-source regroup of the vocabulary relation — both aggregations
    are exact integer sums, associative on any plan."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    ).filter("t != ''")
    freqs = toks.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        freqs.groupBy("source")
        .agg(
            F.expr("CAST(sum(c) AS BIGINT)").alias("n_tokens"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_types"),
            F.expr(
                "CAST(sum(CAST(c AS DECIMAL(38,0)) * (c - 1)) AS DECIMAL(38,0))"
            ).alias("same2"),
            F.expr("CAST(max(c) AS BIGINT)").alias("maxc"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "n_types",
            "CAST(same2 * 1000 DIV nullif(CAST(n_tokens AS DECIMAL(38,0))"
            " * (n_tokens - 1), 0) AS BIGINT) AS simpson_permille",
            "CAST(maxc * 1000 DIV n_tokens AS BIGINT) AS top_share_permille",
        )
        .orderBy("source")
    )


ORACLE_TEXT_SIMPSON_DIVERSITY = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
),
freqs AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE t != '' GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT) AS same2,
         CAST(max(c) AS BIGINT) AS maxc
  FROM freqs GROUP BY source
)
SELECT source, n_tokens, n_types,
       CAST(same2 * 1000 // nullif(CAST(n_tokens AS HUGEINT)
            * (n_tokens - 1), 0) AS BIGINT) AS simpson_permille,
       CAST(maxc * 1000 // n_tokens AS BIGINT) AS top_share_permille
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Yule's K characteristic: the classic vocabulary-richness constant
# K = 10^4 (sum_c c^2 V(c) - N) / N^2 (Yule 1944) — unlike type/token
# ratios it is (asymptotically) length-invariant, so it compares
# sources of very different sizes honestly. Exactly computable from the
# same (source, token) frequency relation as Simpson/Chao1: S2 = sum of
# squared type frequencies, K_milli = (S2 - N) * 10^7 DIV N^2, every
# term DECIMAL(38,0)/HUGEINT with one truncating DIV.


def q_text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: token count N, type count V, the squared-frequency
    sum S2, and Yule's K in milli units.

    Scale shape: one token explode + (source, token) count (the
    vocabulary shuffle, map-side combined), one per-source regroup of
    the vocabulary relation — the statistic is arithmetic on a
    |sources|-row relation."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    ).filter("t != ''")
    freqs = toks.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        freqs.groupBy("source")
        .agg(
            F.expr("CAST(sum(c) AS BIGINT)").alias("n_tokens"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_types"),
            F.expr(
                "CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))"
            ).alias("s2"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "n_types",
            "CAST(s2 AS BIGINT) AS s2",
            "CAST((s2 - n_tokens) * 10000000"
            " DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)"
            " AS BIGINT) AS yule_k_milli",
        )
        .orderBy("source")
    )


ORACLE_TEXT_YULE_K = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
),
freqs AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE t != '' GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM freqs GROUP BY source
)
SELECT source, n_tokens, n_types,
       CAST(s2 AS BIGINT) AS s2,
       CAST((s2 - n_tokens) * 10000000
            // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
         AS yule_k_milli
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Bigram entropy rate: H(next token | token) per source in micro-nats —
# the LM-adjacent predictability statistic (a near-zero rate means the
# source is templated/boilerplate; natural text sits well above). The
# events lane's transition-entropy recipe applied to the token stream:
# H = (1/N) sum_w1 [ c(w1) ln c(w1) - sum_w2 c(w1,w2) ln c(w1,w2) ],
# every ln floor-quantized ONCE per count value to integer micro-nats
# (the zipf/transition-entropy class-C discipline), the weighted sums
# exact in DECIMAL(38,0), one truncating DIV at the end.


def q_text_bigram_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(source, n_bigrams, n_bigram_types, entropy_micro_nats) per
    source: the conditional next-token entropy of the bigram stream.

    Scale shape: ONE bigram extraction over one corpus scan (the
    _bigram_lm stream, shared shape with the LM scorers), a
    (source, w1, w2) count aggregation (map-side combined — the
    bigram-TYPE grain, Heaps-sublinear), then regroups on the type
    relation only."""
    docs = spread(table(spark, sf_dir, "documents"))
    bigrams, _ = _bigram_lm(docs, "source")
    c2 = bigrams.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cells = c2.selectExpr(
        "source",
        "w1",
        "c",
        "CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"
        " AS lnc_micro",
    )
    per_w1 = cells.groupBy("source", "w1").agg(
        F.expr("CAST(sum(c) AS BIGINT)").alias("cf"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            "CAST(sum(CAST(c AS DECIMAL(38,0)) * lnc_micro)"
            " AS DECIMAL(38,0))"
        ).alias("clnc"),
    )
    return (
        per_w1.selectExpr(
            "source",
            "cf",
            "n_types",
            "CAST(cf AS DECIMAL(38,0))"
            " * CAST(floor(ln(CAST(cf AS DOUBLE)) * 1000000) AS BIGINT)"
            " - clnc AS num",
        )
        .groupBy("source")
        .agg(
            F.expr("CAST(sum(cf) AS BIGINT)").alias("n_bigrams"),
            F.expr("CAST(sum(n_types) AS BIGINT)").alias("n_bigram_types"),
            F.expr("CAST(sum(num) AS DECIMAL(38,0))").alias("num"),
        )
        .selectExpr(
            "source",
            "n_bigrams",
            "n_bigram_types",
            "CAST(num DIV n_bigrams AS BIGINT) AS entropy_micro_nats",
        )
        .orderBy("source")
    )


ORACLE_TEXT_BIGRAM_ENTROPY_RATE = r"""
WITH toks AS (
  SELECT source, doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
),
bigrams AS (
  SELECT source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
),
c2 AS (
  SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
  FROM bigrams GROUP BY 1, 2, 3
),
cells AS (
  SELECT source, w1, c,
         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)
           AS lnc_micro
  FROM c2
),
per_w1 AS (
  SELECT source, w1,
         CAST(sum(c) AS BIGINT) AS cf,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CAST(c AS HUGEINT) * lnc_micro) AS HUGEINT) AS clnc
  FROM cells GROUP BY 1, 2
),
nums AS (
  SELECT source, cf, n_types,
         CAST(cf AS HUGEINT)
           * CAST(floor(ln(CAST(cf AS DOUBLE)) * 1000000) AS BIGINT)
           - clnc AS num
  FROM per_w1
)
SELECT source,
       CAST(sum(cf) AS BIGINT) AS n_bigrams,
       CAST(sum(n_types) AS BIGINT) AS n_bigram_types,
       CAST(sum(num) // sum(cf) AS BIGINT) AS entropy_micro_nats
FROM nums GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Chao1 richness: how many token types does each source REALLY have,
# counting the ones not yet seen? chao1 = V + n1^2 / (2 n2) (Chao 1984;
# the n2 = 0 fallback V + n1 (n1 - 1) / 2 is the standard
# bias-corrected form) — the "how much vocabulary is left to crawl"
# companion to docs_vocab_growth's Heaps curve and token_good_turing's
# unseen-mass permille, off the SAME frequency-of-frequencies relation,
# and like them all-integer (milli units, truncating DIV).


def q_docs_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: observed type count, singleton and doubleton counts,
    and the Chao1 richness estimate in milli.

    Scale shape: the same (source, token) count as the diversity/zipf
    family, then a per-source regroup bounded by the vocabulary — the
    estimator itself is arithmetic on a |sources|-row relation."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    ).filter("t != ''")
    freqs = toks.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        freqs.groupBy("source")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_types"),
            F.expr(
                "CAST(COALESCE(sum(CASE WHEN c = 1 THEN 1 END), 0)"
                " AS BIGINT)"
            ).alias("n_singletons"),
            F.expr(
                "CAST(COALESCE(sum(CASE WHEN c = 2 THEN 1 END), 0)"
                " AS BIGINT)"
            ).alias("n_doubletons"),
        )
        .selectExpr(
            "source",
            "n_types",
            "n_singletons",
            "n_doubletons",
            "CAST(n_types * 1000 + CASE WHEN n_doubletons > 0"
            " THEN n_singletons * n_singletons * 1000 DIV (2 * n_doubletons)"
            " ELSE n_singletons * (n_singletons - 1) * 1000 DIV 2 END"
            " AS BIGINT) AS chao1_milli",
        )
        .orderBy("source")
    )


ORACLE_DOCS_CHAO1_RICHNESS = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
),
freqs AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE t != '' GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(COALESCE(sum(CASE WHEN c = 1 THEN 1 END), 0) AS BIGINT)
           AS n_singletons,
         CAST(COALESCE(sum(CASE WHEN c = 2 THEN 1 END), 0) AS BIGINT)
           AS n_doubletons
  FROM freqs GROUP BY source
)
SELECT source, n_types, n_singletons, n_doubletons,
       CAST(n_types * 1000 + CASE WHEN n_doubletons > 0
            THEN n_singletons * n_singletons * 1000 // (2 * n_doubletons)
            ELSE n_singletons * (n_singletons - 1) * 1000 // 2 END
            AS BIGINT) AS chao1_milli
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# bigram novelty: what fraction of an INCOMING slice's word bigrams does
# the standing corpus already contain? The n-gram decontamination /
# novelty probe a curation pipeline runs on every candidate source
# before mixing it in — high containment means the "new" data is mostly
# restatement (or leaked benchmark), low containment means genuinely
# novel text. Same incoming-slice convention as dedup_incremental
# (source 'src19' models the arriving batch).

NOVELTY_INCOMING_SOURCE = "src19"


def q_token_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the incoming slice's distinct-bigram count, the standing
    corpus's, the shared count, and containment in permille
    (shared * 1000 DIV incoming).

    Scale shape: one bigram explode per side (posexplode + self-zip via
    lead-free token pairing inside the split array), two distinct
    aggregations bounded by the bigram vocabulary, one vocabulary-keyed
    join — never a doc-by-doc comparison. At 100 TB the corpus side is
    a PERSISTED bigram set; only the incoming slice derives fresh."""
    docs = spread(table(spark, sf_dir, "documents"))
    big = docs.select(
        "source",
        F.expr(
            "explode(filter(zip_with(split(trim(text), '\\\\s+'),"
            " slice(split(trim(text), '\\\\s+'), 2, size(split(trim(text),"
            " '\\\\s+'))), (a, b) -> concat(a, ' ', b)),"
            " x -> x IS NOT NULL))"
        ).alias("bg"),
    )
    inc = (
        big.filter(F.col("source") == NOVELTY_INCOMING_SOURCE)
        .select("bg")
        .distinct()
    )
    corp = (
        big.filter(F.col("source") != NOVELTY_INCOMING_SOURCE)
        .select("bg")
        .distinct()
    )
    shared = inc.join(corp, "bg")
    return (
        inc.agg(F.count(F.lit(1)).cast("bigint").alias("n_incoming"))
        .crossJoin(
            F.broadcast(
                corp.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_corpus")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                shared.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_shared")
                )
            )
        )
        .selectExpr(
            "n_incoming",
            "n_corpus",
            "n_shared",
            "CAST(n_shared * 1000 DIV nullif(n_incoming, 0) AS BIGINT)"
            " AS containment_permille",
        )
    )


ORACLE_TOKEN_BIGRAM_NOVELTY = rf"""
WITH big AS (
  SELECT source,
         unnest(list_transform(range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)),
                i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                     regexp_split_to_array(trim(text), '\s+')[i+1])) AS bg
  FROM documents
),
inc AS (SELECT DISTINCT bg FROM big
        WHERE source = '{NOVELTY_INCOMING_SOURCE}' AND bg IS NOT NULL),
corp AS (SELECT DISTINCT bg FROM big
         WHERE source != '{NOVELTY_INCOMING_SOURCE}' AND bg IS NOT NULL),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n_incoming FROM inc),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM corp),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_shared
       FROM inc JOIN corp USING (bg))
SELECT n_incoming, n_corpus, n_shared,
       CAST(n_shared * 1000 // nullif(n_incoming, 0) AS BIGINT)
         AS containment_permille
FROM ni, nc, ns
"""


# --- serving twin of token_bigram_novelty: a LITERAL query string probed
# for bigram containment against the standing corpus — the per-prompt
# decontamination check (is this benchmark question already in my
# training data?), complementing dedup_query_text_probe's banded-minhash
# admission check with an EXACT n-gram answer. Probe 1 re-derives from
# the corpus (the lowest-doc_id text — guaranteed containment 1000 at
# any scale, so the gate hashes real values); probe 2 is the novel
# literal (honestly low containment).

NOVELTY_QUERY_TEXT = (
    "what is the capital of france and when was the eiffel tower built"
)


def q_novelty_query_text_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(probe_id, n_probe_bigrams, n_shared, containment_permille) for
    the two serving probes: a corpus resubmission (must read 1000) and
    the novel literal.

    Scale shape: the corpus bigram set derives once (at 100 TB: a
    PERSISTED distinct-bigram relation, the same artifact
    token_bigram_novelty's batch leg maintains); each probe contributes
    a tiny bigram relation joined vocabulary-keyed against it."""
    docs = spread(table(spark, sf_dir, "documents"))
    bg_expr = (
        "explode(filter(zip_with(split(trim(text), '\\\\s+'),"
        " slice(split(trim(text), '\\\\s+'), 2, size(split(trim(text),"
        " '\\\\s+'))), (a, b) -> concat(a, ' ', b)),"
        " x -> x IS NOT NULL))"
    )
    corp = docs.select(F.expr(bg_expr).alias("bg")).distinct()
    resub = docs.orderBy("doc_id").limit(1).selectExpr(
        "CAST(1 AS BIGINT) AS probe_id", "text"
    )
    novel = spark.range(1).selectExpr(
        "CAST(2 AS BIGINT) AS probe_id",
        f"'{NOVELTY_QUERY_TEXT}' AS text",
    )
    probes = (
        resub.unionByName(novel)
        .selectExpr("probe_id", f"{bg_expr} AS bg")
        .distinct()
    )
    hits = (
        probes.join(corp.selectExpr("bg", "1 AS hit"), "bg", "left_outer")
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probe_bigrams"),
            F.expr("CAST(COALESCE(sum(hit), 0) AS BIGINT)").alias(
                "n_shared"
            ),
        )
    )
    return hits.selectExpr(
        "probe_id",
        "n_probe_bigrams",
        "n_shared",
        "CAST(n_shared * 1000 DIV n_probe_bigrams AS BIGINT)"
        " AS containment_permille",
    ).orderBy("probe_id")


ORACLE_NOVELTY_QUERY_TEXT_PROBE = rf"""
WITH corp AS (
  SELECT DISTINCT
         unnest(list_transform(range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)),
                i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                     regexp_split_to_array(trim(text), '\s+')[i+1])) AS bg
  FROM documents
),
probes_raw AS (
  SELECT CAST(1 AS BIGINT) AS probe_id, text FROM (
    SELECT text FROM documents ORDER BY doc_id LIMIT 1
  )
  UNION ALL
  SELECT CAST(2 AS BIGINT), '{NOVELTY_QUERY_TEXT}'
),
probes AS (
  SELECT DISTINCT probe_id,
         unnest(list_transform(range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)),
                i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                     regexp_split_to_array(trim(text), '\s+')[i+1])) AS bg
  FROM probes_raw
),
hits AS (
  SELECT probe_id,
         CAST(count(*) AS BIGINT) AS n_probe_bigrams,
         CAST(COALESCE(sum(CASE WHEN corp.bg IS NOT NULL THEN 1 END), 0)
              AS BIGINT) AS n_shared
  FROM (SELECT * FROM probes WHERE bg IS NOT NULL) p
  LEFT OUTER JOIN corp ON p.bg = corp.bg
  GROUP BY 1
)
SELECT probe_id, n_probe_bigrams, n_shared,
       CAST(n_shared * 1000 // n_probe_bigrams AS BIGINT)
         AS containment_permille
FROM hits
ORDER BY probe_id
"""


# ---------------------------------------------------------------------------
# Per-source Kolmogorov-Smirnov quality drift: each source's quality
# distribution tested against the REST of the corpus — the
# distribution-shape sibling of source_psi_drift (PSI needs binning
# choices; KS is the binning-free "has this feed's quality shifted?"
# alarm a corpus pipeline pages on).


def q_docs_quality_ks_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(source, n_docs, n_rest, d_bp, z2_milli) per source: the exact
    two-sample KS distance between the source's quality-score
    distribution and the rest of the corpus, in basis points, with the
    asymptotic z^2 in milli.

    Exactness: the 4dp-rounded quality score quantizes to an exact
    basis-point grid (round-to-nearest of a 4dp double — the
    jaccard_threshold_sweep precedent: identical doubles both
    engines); every CDF gap is the exact integer
    |cum_s*(N-n_s) - (cum_all-cum_s)*n_s| in DECIMAL(38,0)/HUGEINT;
    D emits via nonneg matched-truncation division and z^2 is one
    class-B double chain (the orders_price_ks_test recipe, per row).

    Scale shape: the corpus pays the quality-scoring map + ONE
    (source, q) histogram aggregation (plus a column-pruned
    (doc_id, source) scan for the attach join — cheap next to the
    regex scoring); the q grid is DATA-INDEPENDENT
    bounded (0..10000 bp), so the dense source x grid spine, the
    per-source and global cumulative windows, and the final per-source
    reduce all run on metadata-sized relations (<= |sources| x 10001
    rows — the chisq-grid class)."""
    from ..cachereg import cache_eager

    docs = table(spark, sf_dir, "documents")
    scored = quality_score_from(docs).select("doc_id", "quality_score")
    src = docs.select("doc_id", "source")
    hist = (
        src.join(scored, "doc_id")
        .selectExpr(
            "source",
            "CAST(round(quality_score * 10000) AS BIGINT) AS q",
        )
        .groupBy("source", "q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    hist = cache_eager(hist)
    spine = (
        hist.select("source")
        .distinct()
        .crossJoin(F.broadcast(hist.select("q").distinct()))
    )
    dense = spine.join(hist, ["source", "q"], "left").selectExpr(
        "source", "q", "coalesce(c, CAST(0 AS BIGINT)) AS c"
    )
    w_src = (
        Window.partitionBy("source")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = dense.withColumn(
        "cum_s", F.sum("c").over(w_src).cast("bigint")
    )
    hist_all = hist.groupBy("q").agg(
        F.sum("c").cast("bigint").alias("c_all")
    )
    w_all = (
        Window.partitionBy()
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_all = hist_all.select(
        "q",
        F.sum("c_all").over(w_all).cast("bigint").alias("cum_all"),
        F.sum("c_all").over(Window.partitionBy()).cast("bigint").alias("nn"),
    )
    n_s = hist.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs")
    )
    gaps = (
        cums.join(F.broadcast(cum_all), "q")
        .join(F.broadcast(n_s), "source")
        .selectExpr(
            "source",
            "n_docs",
            "nn - n_docs AS n_rest",
            "abs(CAST(cum_s AS DECIMAL(38,0)) * (nn - n_docs)"
            " - CAST(cum_all - cum_s AS DECIMAL(38,0)) * n_docs) AS gap",
        )
    )
    return (
        gaps.groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("n_rest").alias("n_rest"),
            F.max("gap").alias("m"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_rest",
            "CAST(m * 10000"
            " DIV nullif(CAST(n_docs AS DECIMAL(38,0)) * n_rest, 0)"
            " AS BIGINT) AS d_bp",
            "CAST(floor(1000.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)"
            " / nullif(CAST(n_docs AS DOUBLE) * CAST(n_rest AS DOUBLE)"
            "          * CAST(n_docs + n_rest AS DOUBLE), 0.0))"
            " AS BIGINT) AS z2_milli",
        )
        .orderBy("source")
    )


ORACLE_DOCS_QUALITY_KS_BY_SOURCE = rf"""
WITH scored AS ({ORACLE_QUALITY_SCORE}),
hist AS (
  SELECT d.source,
         CAST(round(s.quality_score * 10000) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS c
  FROM documents d JOIN scored s ON d.doc_id = s.doc_id
  GROUP BY 1, 2
),
spine AS (
  SELECT src.source, grid.q
  FROM (SELECT DISTINCT source FROM hist) src
  CROSS JOIN (SELECT DISTINCT q FROM hist) grid
),
dense AS (
  SELECT sp.source, sp.q, coalesce(h.c, CAST(0 AS BIGINT)) AS c
  FROM spine sp LEFT JOIN hist h
    ON h.source = sp.source AND h.q = sp.q
),
cums AS (
  SELECT source, q, c,
         CAST(sum(c) OVER (PARTITION BY source ORDER BY q
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s
  FROM dense
),
cum_all_t AS (
  SELECT q,
         CAST(sum(c_all) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_all,
         CAST(sum(c_all) OVER () AS BIGINT) AS nn
  FROM (SELECT q, CAST(sum(c) AS BIGINT) AS c_all FROM hist GROUP BY 1)
),
ns AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs FROM hist GROUP BY 1
),
gaps AS (
  SELECT c.source, n.n_docs, a.nn - n.n_docs AS n_rest,
         abs(CAST(c.cum_s AS HUGEINT) * (a.nn - n.n_docs)
             - CAST(a.cum_all - c.cum_s AS HUGEINT) * n.n_docs) AS gap
  FROM cums c
  JOIN cum_all_t a ON c.q = a.q
  JOIN ns n ON c.source = n.source
)
SELECT source,
       CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(max(n_rest) AS BIGINT) AS n_rest,
       CAST(max(gap) * 10000
            // nullif(CAST(max(n_docs) AS HUGEINT) * max(n_rest), 0)
            AS BIGINT) AS d_bp,
       CAST(floor(1000.0 * CAST(max(gap) AS DOUBLE)
                  * CAST(max(gap) AS DOUBLE)
         / nullif(CAST(max(n_docs) AS DOUBLE) * CAST(max(n_rest) AS DOUBLE)
                  * CAST(max(n_docs) + max(n_rest) AS DOUBLE), 0.0))
         AS BIGINT) AS z2_milli
FROM gaps
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "docs_quality_ks_by_source": q_docs_quality_ks_by_source,
    "docs_charclass_profile": q_docs_charclass_profile,
    "docs_sample_inspection_pack": q_docs_sample_inspection_pack,
    "source_mixture_weights": q_source_mixture_weights,
    "docs_token_budget_report": q_docs_token_budget_report,
    "token_length_histogram": q_token_length_histogram,
    "docs_hygiene_report": q_docs_hygiene_report,
    "docs_length_quality_spearman": q_docs_length_quality_spearman,
    "token_burstiness_report": q_token_burstiness_report,
    "corpus_saturation_curve": q_corpus_saturation_curve,
    "moments_merge_check": q_moments_merge_check,
    "source_psi_drift": q_source_psi_drift,
    "vocab_coverage_curve": q_vocab_coverage_curve,
    "kn_bigram_smoothing": q_kn_bigram_smoothing,
    "text_winnowing": q_text_winnowing,
    "dsir_importance": q_dsir_importance,
    "lm_perplexity_buckets": q_lm_perplexity_buckets,
    "token_pmi_pairs": q_token_pmi_pairs,
    "source_token_entropy": q_source_token_entropy,
    "docs_length_outliers": q_docs_length_outliers,
    "nb_language_report": q_nb_language_report,
    "text_token_stats": q_token_stats,
    "vocab_oov_report": q_vocab_oov_report,
    "boilerplate_phrases": q_boilerplate_phrases,
    "text_quality_score": q_quality_score,
    "text_quality_percent_rank": q_quality_percent_rank,
    "text_vowel_stats": q_text_vowel_stats,
    "text_head_tokens": q_text_head_tokens,
    "source_char_budget": q_source_char_budget,
    "text_language_id": q_language_id,
    "text_fingerprint": q_fingerprint,
    "docs_stratified_sample": q_stratified_sample,
    "corpus_clean_stats": q_corpus_clean_stats,
    "text_repetition_score": q_repetition_score,
    "text_pii_scan": q_pii_scan,
    "corpus_mix_report": q_corpus_mix_report,
    "docs_pack_sequences": q_docs_pack_sequences,
    "docs_target_mix_sample": q_docs_target_mix_sample,
    "label_agreement_kappa": q_label_agreement,
    "label_confusion_report": q_label_confusion,
    "docs_weighted_sample": q_docs_weighted_sample,
    "text_lm_score": q_text_lm_score,
    "docs_shard_assignment": q_docs_shard_assignment,
    "docs_capped_per_source": q_docs_capped_per_source,
    "docs_readability": q_docs_readability,
    "text_clean_normalize": q_text_clean_normalize,
    "docs_pack_efficiency": q_docs_pack_efficiency,
    "docs_vocab_growth": q_docs_vocab_growth,
    "text_heaps_exponent": q_text_heaps_exponent,
    "zipf_slope_fit": q_zipf_slope,
    "token_good_turing": q_token_good_turing,
    "text_simpson_diversity": q_text_simpson_diversity,
    "text_yule_k": q_text_yule_k,
    "text_bigram_entropy_rate": q_text_bigram_entropy_rate,
    "source_unigram_tv_matrix": q_source_unigram_tv_matrix,
    "docs_chao1_richness": q_docs_chao1_richness,
    "token_bigram_novelty": q_token_bigram_novelty,
    "novelty_query_text_probe": q_novelty_query_text_probe,
    "docs_weighted_topk_sample": q_docs_weighted_topk_sample,
    "dataset_card": q_dataset_card,
    "source_kl_divergence": q_source_kl_divergence,
    "docs_feature_matrix": q_docs_feature_matrix,
    "shard_manifest": q_shard_manifest,
}

ORACLES = {
    "docs_quality_ks_by_source": ORACLE_DOCS_QUALITY_KS_BY_SOURCE,
    "docs_charclass_profile": ORACLE_CHARCLASS_PROFILE,
    "docs_sample_inspection_pack": ORACLE_INSPECTION_PACK,
    "source_mixture_weights": ORACLE_SOURCE_MIXTURE,
    "docs_token_budget_report": ORACLE_TOKEN_BUDGET,
    "token_length_histogram": ORACLE_TOKEN_LENGTH_HISTOGRAM,
    "docs_hygiene_report": ORACLE_HYGIENE_REPORT,
    "docs_length_quality_spearman": ORACLE_SPEARMAN,
    "token_burstiness_report": ORACLE_BURSTINESS,
    "corpus_saturation_curve": ORACLE_SATURATION,
    "moments_merge_check": ORACLE_MOMENTS_MERGE,
    "source_psi_drift": ORACLE_PSI_DRIFT,
    "vocab_coverage_curve": ORACLE_VOCAB_COVERAGE,
    "kn_bigram_smoothing": ORACLE_KN_BIGRAM,
    "text_winnowing": ORACLE_WINNOWING,
    "dsir_importance": ORACLE_DSIR,
    "lm_perplexity_buckets": ORACLE_PERPLEXITY_BUCKETS,
    "token_pmi_pairs": ORACLE_TOKEN_PMI,
    "source_token_entropy": ORACLE_SOURCE_ENTROPY,
    "docs_length_outliers": ORACLE_LENGTH_OUTLIERS,
    "nb_language_report": ORACLE_NB_LANGUAGE,
    "text_token_stats": ORACLE_TOKEN_STATS,
    "boilerplate_phrases": ORACLE_BOILERPLATE,
    "vocab_oov_report": ORACLE_VOCAB_OOV,
    "text_quality_score": ORACLE_QUALITY_SCORE,
    "text_quality_percent_rank": ORACLE_QUALITY_PERCENT_RANK,
    "text_vowel_stats": ORACLE_VOWEL_STATS,
    "text_head_tokens": ORACLE_HEAD_TOKENS,
    "source_char_budget": ORACLE_SOURCE_CHAR_BUDGET,
    "text_language_id": ORACLE_LANGUAGE_ID,
    "text_fingerprint": ORACLE_FINGERPRINT,
    "docs_stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "corpus_clean_stats": ORACLE_CORPUS_CLEAN,
    "text_repetition_score": ORACLE_REPETITION_SCORE,
    "text_pii_scan": ORACLE_PII_SCAN,
    "corpus_mix_report": ORACLE_CORPUS_MIX,
    "docs_pack_sequences": ORACLE_PACK_SEQUENCES,
    "docs_target_mix_sample": ORACLE_TARGET_MIX,
    "label_agreement_kappa": ORACLE_LABEL_AGREEMENT,
    "label_confusion_report": ORACLE_LABEL_CONFUSION,
    "docs_weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "text_lm_score": ORACLE_TEXT_LM_SCORE,
    "docs_shard_assignment": ORACLE_DOCS_SHARD_ASSIGNMENT,
    "docs_capped_per_source": ORACLE_DOCS_CAPPED,
    "docs_readability": ORACLE_DOCS_READABILITY,
    "text_clean_normalize": ORACLE_TEXT_CLEAN,
    "docs_pack_efficiency": ORACLE_PACK_EFFICIENCY,
    "docs_vocab_growth": ORACLE_DOCS_VOCAB_GROWTH,
    "text_heaps_exponent": ORACLE_TEXT_HEAPS_EXPONENT,
    "zipf_slope_fit": ORACLE_ZIPF_SLOPE,
    "token_good_turing": ORACLE_TOKEN_GOOD_TURING,
    "text_simpson_diversity": ORACLE_TEXT_SIMPSON_DIVERSITY,
    "text_yule_k": ORACLE_TEXT_YULE_K,
    "text_bigram_entropy_rate": ORACLE_TEXT_BIGRAM_ENTROPY_RATE,
    "source_unigram_tv_matrix": ORACLE_SOURCE_UNIGRAM_TV_MATRIX,
    "docs_chao1_richness": ORACLE_DOCS_CHAO1_RICHNESS,
    "token_bigram_novelty": ORACLE_TOKEN_BIGRAM_NOVELTY,
    "novelty_query_text_probe": ORACLE_NOVELTY_QUERY_TEXT_PROBE,
    "docs_weighted_topk_sample": ORACLE_WEIGHTED_TOPK_SAMPLE,
    "dataset_card": ORACLE_DATASET_CARD,
    "source_kl_divergence": ORACLE_SOURCE_KL,
    "docs_feature_matrix": _oracle_feature_matrix(),
    "shard_manifest": ORACLE_SHARD_MANIFEST,
}
