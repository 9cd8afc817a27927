"""On-engine BPE (byte-pair-encoding) merge training over ``documents`` —
the tokenizer-construction step of a training-data pipeline, expressed as
a bounded-iteration DataFrame loop (cousin of PageRank in ``graph.py``):
each round is one vocabulary-bounded aggregation whose ARGMAX — a single
(s1, s2, count) scalar selected by a total order — drives the next round
as a literal parameter. The per-round scalar fetch is a scalar-aggregate
probe (the class the repo's `.first()` probes belong to), not a data
collect; no full relation ever reaches the driver.

The reference has no tokenizer surface (its NL layer calls a hosted model,
reference ``sap_sql_engine.py:73-120``); this is the data-scale
counterpart a corpus pipeline needs before token-count accounting.

Algorithm (classic Sennrich-style BPE on the word vocabulary):
  1. Tokenize once: (word, count) — the ONLY full-corpus pass. BPE
     training is vocabulary-side by construction (Heaps' law keeps the
     vocab relation tiny relative to the corpus), exactly how production
     trainers operate.
  2. Each word's symbol sequence is encoded as one string with every
     symbol WRAPPED in ASCII unit separators: ``SEP s SEP`` per symbol,
     so a sequence [a, b] is ``SEP a SEP SEP b SEP``. With that encoding
     "merge pair (s1, s2)" is a plain non-overlapping string replace of
     ``SEP s1 SEP SEP s2 SEP`` with ``SEP s1s2 SEP`` — occurrences are
     bracket-delimited disjoint segments, so left-to-right replace IS the
     greedy BPE apply, with no suffix/prefix ambiguity and no shared
     boundary characters between adjacent occurrences. (A naive
     single-separator join has both defects: the pair pattern can match a
     SUFFIX of a longer symbol, and adjacent occurrences share one
     separator so the second is skipped. The unit test pins this against
     a pure-Python greedy fold.)
  3. N_MERGES rounds: count adjacent symbol pairs weighted by word count
     (overlapping occurrences count, the standard statistic), pick the
     max with a total tie-break (count desc, then pair lexicographic),
     apply the merge, repeat.

Determinism: pair counts are exact integers; the winner selection is a
total order; symbol strings compare bytewise identically on both engines
— so the DuckDB oracle (the same recurrence unrolled as chained CTEs)
hash-matches every round.

Scale shape: the word-count relation is cached once (at 100 TB: a few
hundred MB of vocabulary — Heaps' law); every iteration touches only that
relation (pair explode -> one shuffle over <= |pairs| groups -> 1-row
top-k -> scalar argmax probe -> literal-parameter replace, a narrow map).
Iteration count is a bounded constant. The corpus itself is scanned
exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachereg import cache_eager
from ..sources.loader import spread, table

N_MERGES = 6
SEP = chr(31)  # ASCII unit separator; never occurs in whitespace-split tokens


def _train(
    docs: DataFrame, n_merges: int, snapshots: dict | None = None
) -> tuple[list, DataFrame]:
    """Run the merge loop; returns (one-row merge DataFrames, the final
    (w, symstr, cnt) vocabulary state) so both the training report and
    the token-count apply share one implementation. ``snapshots``: a
    dict whose keys are checkpoint merge-ranks — filled in place with
    the (lazy, off-the-cached-base) vocabulary state after that many
    merges, for the compression curve."""
    toks = spread(docs).select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    # state string: every 1-char symbol wrapped as SEP||s||SEP
    words = cache_eager(
        toks.filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "w",
            F.expr(
                "concat(chr(31), array_join(split(w, ''), chr(31) || chr(31)), chr(31))"
            ).alias("symstr"),
            "cnt",
        )
    )
    # adjacent symbol pairs of the unwrapped state; a 1-symbol word has no
    # pairs (guarded CASE — Spark's sequence(1, 0) is descending, see the
    # sibling lesson in dedup._shingles_raw_from)
    pairs_expr = (
        "transform(CASE WHEN size(sy) >= 2 THEN sequence(1, size(sy) - 1, 1) "
        "ELSE array() END, "
        "j -> struct(element_at(sy, j) AS s1, element_at(sy, j + 1) AS s2))"
    )
    if snapshots is not None and 0 in snapshots:
        snapshots[0] = words
    merges: list[tuple] = []
    for it in range(1, n_merges + 1):
        pairs = (
            words.withColumn(
                "sy",
                F.expr(
                    "split(trim(BOTH chr(31) FROM symstr), chr(31) || chr(31))"
                ),
            )
            .select("cnt", F.explode(F.expr(pairs_expr)).alias("p"))
            .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
            .agg(F.sum("cnt").alias("c"))
        )
        # the winner is a SCALAR (the argmax of one aggregation, selected
        # by a total order) — fetching it is a scalar-aggregate probe, the
        # same class as the repo's `.first()` probes, NOT a data collect;
        # production BPE trainers iterate exactly this way (one scalar per
        # round drives the next round). Keeping it driver-side makes the
        # merge a literal-parameter map (no per-iteration crossJoin /
        # broadcast / eager-cache jobs — that shape spent ~6 fixed-cost
        # Spark jobs per merge on metadata-sized relations).
        rows = (
            pairs.orderBy(F.col("c").desc(), "s1", "s2").limit(1).collect()
        )
        if not rows:
            break  # vocabulary fully merged: no pairs remain
        s1, s2, c = rows[0]
        merges.append((it, s1, s2, s1 + s2, int(c)))
        pat = SEP + s1 + SEP + SEP + s2 + SEP
        rep = SEP + s1 + s2 + SEP
        # lazy narrow map over the cached base relation: iteration i's pair
        # aggregation re-applies i-1 replaces to the cached vocabulary —
        # cheaper than one eager-cache job per round at vocab scale
        words = words.withColumn(
            "symstr", F.replace(F.col("symstr"), F.lit(pat), F.lit(rep))
        )
        if snapshots is not None and it in snapshots:
            snapshots[it] = words
    return merges, words


_MERGE_SCHEMA = (
    "merge_rank INT, s1 STRING, s2 STRING, merged STRING, pair_count BIGINT"
)


def bpe_merges_from(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """The first ``n_merges`` BPE merges learned from ``docs`` (needs a
    ``text`` column): one row per merge rank with the pair, the merged
    symbol, and the pair's weighted frequency at selection time."""
    merges, words = _train(docs, n_merges)
    return words.sparkSession.createDataFrame(merges, _MERGE_SCHEMA).orderBy(
        "merge_rank"
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training on the ``documents`` table."""
    return bpe_merges_from(table(spark, sf_dir, "documents"))


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the trained BPE merges — the
    accounting a pipeline runs to budget training FLOPs/context packing
    with the REAL tokenizer rather than a whitespace proxy.

    Scale shape — train vocab-side, apply via join, never re-segment the
    corpus: the merge loop leaves a (word -> final symbol string) map
    whose size is the VOCABULARY (Heaps-bounded); per-word token count is
    one map-side ``size(split(...))`` over that relation; the corpus word
    stream then joins the map on the word key (no broadcast hint — at
    web scale the vocabulary is fact-sized and AQE decides) and one
    doc_id aggregation emits integer counts. Exactly two full-volume
    passes over the corpus total (train tokenization + apply join), both
    unavoidable."""
    docs = table(spark, sf_dir, "documents")
    _, vocab = _train(docs, N_MERGES)
    per_word = vocab.select(
        "w",
        F.expr(
            "size(split(trim(BOTH chr(31) FROM symstr), chr(31) || chr(31)))"
        )
        .cast("bigint")
        .alias("n_sym"),
    )
    stream = spread(docs).select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    return (
        stream.join(per_word, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_tokens"),
        )
    )


def _bpe_ctes() -> str:
    """The shared CTE chain: w0..wN vocabulary states (word carried
    through) and t1..tN winning pairs."""
    ctes = [
        r"""w0 AS (
  SELECT w,
         chr(31) || rtrim(regexp_replace(w, '(.)', '\1' || chr(31) || chr(31), 'g'), chr(31)) || chr(31) AS symstr,
         count(*) AS cnt
  FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
  )
  WHERE w != ''
  GROUP BY w
)"""
    ]
    for it in range(1, N_MERGES + 1):
        ctes.append(
            f"""p{it} AS (
  SELECT pr['s1'] AS s1, pr['s2'] AS s2, sum(cnt) AS c FROM (
    SELECT unnest(list_transform(range(1, len(sy)),
                  j -> {{'s1': sy[j], 's2': sy[j + 1]}})) AS pr, cnt
    FROM (SELECT string_split(trim(symstr, chr(31)), chr(31) || chr(31)) AS sy, cnt FROM w{it - 1})
  )
  GROUP BY 1, 2
),
t{it} AS (SELECT s1, s2, c FROM p{it} ORDER BY c DESC, s1, s2 LIMIT 1),
w{it} AS (
  SELECT w, replace(symstr,
                 chr(31) || s1 || chr(31) || chr(31) || s2 || chr(31),
                 chr(31) || s1 || s2 || chr(31)) AS symstr, cnt
  FROM w{it - 1}, t{it}
)"""
        )
    return ",\n".join(ctes)


def _oracle_bpe() -> str:
    legs = "\nUNION ALL ".join(
        f"SELECT CAST({it} AS INT) AS merge_rank, s1, s2, s1 || s2 AS merged, "
        f"CAST(c AS BIGINT) AS pair_count FROM t{it}"
        for it in range(1, N_MERGES + 1)
    )
    return "WITH " + _bpe_ctes() + "\n" + legs + "\nORDER BY merge_rank"


ORACLE_BPE_MERGES = _oracle_bpe()

ORACLE_BPE_TOKEN_COUNTS = rf"""
WITH {_bpe_ctes()},
vocab AS (
  SELECT w,
         CAST(len(string_split(trim(symstr, chr(31)), chr(31) || chr(31))) AS BIGINT) AS n_sym
  FROM w{N_MERGES}
),
stream AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
)
SELECT doc_id, count(*) AS n_words, CAST(sum(n_sym) AS BIGINT) AS n_tokens
FROM stream JOIN vocab USING (w)
WHERE w != ''
GROUP BY doc_id
"""


def q_bpe_detokenize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer round-trip gate: decode(encode(w)) == w for EVERY word
    in the trained vocabulary, proven in-engine (the invariant-gate
    pattern of moments_merge_check / hll_merge_check, for the tokenizer).

    decode = split the trained symbol string on the separator encoding —
    the SAME split the apply path uses — and re-concatenate the symbols.
    A corrupted merge replace (the bug class the SEP-wrapping exists to
    prevent: suffix matches, shared boundaries) would surface here as a
    round-trip mismatch or an empty symbol; both counts are pinned to 0
    by the oracle gate on the full corpus vocabulary, not a sample.

    Scale shape: one pass over the cached Heaps-bounded vocabulary
    relation; everything is map-side string algebra plus one global
    aggregate."""
    docs = table(spark, sf_dir, "documents")
    _, vocab = _train(docs, N_MERGES)
    checked = vocab.select(
        "w",
        "cnt",
        F.expr(
            "split(trim(BOTH chr(31) FROM symstr), chr(31) || chr(31))"
        ).alias("sy"),
    ).select(
        "cnt",
        F.expr("size(sy)").cast("bigint").alias("n_sym"),
        F.expr("CASE WHEN array_join(sy, '') = w THEN 0 ELSE 1 END").alias(
            "rt_fail"
        ),
        F.expr("CASE WHEN exists(sy, s -> s = '') THEN 1 ELSE 0 END").alias(
            "empty_sym"
        ),
    )
    return checked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab_words"),
        F.sum("rt_fail").cast("bigint").alias("n_roundtrip_fail"),
        F.sum("empty_sym").cast("bigint").alias("n_empty_symbols"),
        F.sum("n_sym").cast("bigint").alias("vocab_tokens"),
        F.sum(F.col("n_sym") * F.col("cnt")).cast("bigint").alias(
            "corpus_tokens"
        ),
        F.sum("cnt").cast("bigint").alias("corpus_words"),
    )


ORACLE_BPE_DETOKENIZE = rf"""
WITH {_bpe_ctes()},
checked AS (
  SELECT w, cnt,
         string_split(trim(symstr, chr(31)), chr(31) || chr(31)) AS sy
  FROM w{N_MERGES}
)
SELECT CAST(count(*) AS BIGINT) AS n_vocab_words,
       CAST(sum(CASE WHEN array_to_string(sy, '') = w THEN 0 ELSE 1 END)
            AS BIGINT) AS n_roundtrip_fail,
       CAST(sum(CASE WHEN len(list_filter(sy, s -> s = '')) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_symbols,
       CAST(sum(len(sy)) AS BIGINT) AS vocab_tokens,
       CAST(sum(len(sy) * cnt) AS BIGINT) AS corpus_tokens,
       CAST(sum(cnt) AS BIGINT) AS corpus_words
FROM checked
"""


def q_bpe_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed gate: the balanced-shard deal of docs_shard_assignment
    run on the TRAINED BPE token counts instead of the whitespace proxy —
    the accounting a pre-training packer actually budgets by (reference
    point: docs_shard_assignment's longest-processing-time deal; the
    token counts come from q_bpe_token_counts' train-then-join plan).

    Scale shape: the BPE apply (vocab join + doc aggregation) feeds
    with_global_rank's range exchange; the deal is a modulo on the rank;
    accounting is one 8-group aggregation. No single-partition window."""
    from .ranks import with_global_rank

    sized = q_bpe_token_counts(spark, sf_dir).select(
        "doc_id", F.col("n_tokens").alias("token_count")
    ).withColumn("neg_tokens", -F.col("token_count"))
    ranked = with_global_rank(sized, "neg_tokens", "doc_id")
    return (
        ranked.withColumn(
            "shard", ((F.col("rn") - 1) % N_SHARDS).cast("int")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").cast("bigint").alias("token_sum"),
            F.max("token_count").cast("bigint").alias("max_doc_tokens"),
        )
        .orderBy("shard")
    )


def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — THE multilingual fairness
    metric: a language whose words split into many more tokens than the
    corpus average pays more context budget per sentence and trains on
    fewer effective documents. Reports per lang: word/token volume,
    fertility (tokens per word, permille) and compression (chars per
    token, milli) under the TRAINED merges.

    Scale shape: identical to q_bpe_token_counts (vocab-side train, one
    stream-vocab join) with the aggregation keyed by lang instead of
    doc — still one corpus-sized join and one small-group aggregation."""
    docs = table(spark, sf_dir, "documents")
    _, vocab = _train(docs, N_MERGES)
    per_word = vocab.select(
        "w",
        F.expr(
            "size(split(trim(BOTH chr(31) FROM symstr), chr(31) || chr(31)))"
        )
        .cast("bigint")
        .alias("n_sym"),
    )
    stream = spread(docs).select(
        "lang",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        stream.join(per_word, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        )
        .selectExpr(
            "lang",
            "n_words",
            "n_tokens",
            "CAST(n_tokens * 1000 DIV n_words AS BIGINT)"
            " AS fertility_permille",
            "CAST(n_chars * 1000 DIV n_tokens AS BIGINT)"
            " AS chars_per_token_milli",
        )
        .orderBy("lang")
    )


ORACLE_BPE_FERTILITY = rf"""
WITH {{ctes}},
vocab AS (
  SELECT w,
         CAST(len(string_split(trim(symstr, chr(31)), chr(31) || chr(31))) AS BIGINT) AS n_sym
  FROM w{{n}}
),
stream AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_tokens,
       CAST(CAST(sum(n_sym) AS BIGINT) * 1000 // count(*) AS BIGINT)
         AS fertility_permille,
       CAST(CAST(sum(length(w)) AS BIGINT) * 1000
            // CAST(sum(n_sym) AS BIGINT) AS BIGINT)
         AS chars_per_token_milli
FROM stream JOIN vocab USING (w)
WHERE w != ''
GROUP BY lang
ORDER BY lang
""".format(ctes=_bpe_ctes(), n=N_MERGES)


# Single source of truth for the shard count: bpe_shard_assignment and
# docs_shard_assignment must deal the same number of shards (ADVICE r9 —
# a comment-only link lets the two drift). textanalysis does not import
# bpe, so this import is acyclic.
from .textanalysis import N_SHARDS  # noqa: E402

ORACLE_BPE_SHARD_ASSIGNMENT = rf"""
WITH {_bpe_ctes()},
vocab AS (
  SELECT w,
         CAST(len(string_split(trim(symstr, chr(31)), chr(31) || chr(31))) AS BIGINT) AS n_sym
  FROM w{N_MERGES}
),
stream AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
),
sized AS (
  SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS token_count
  FROM stream JOIN vocab USING (w)
  WHERE w != ''
  GROUP BY doc_id
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY token_count DESC, doc_id) AS rn
  FROM sized
)
SELECT CAST((rn - 1) % {N_SHARDS} AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum(token_count) AS BIGINT) AS token_sum,
       CAST(max(token_count) AS BIGINT) AS max_doc_tokens
FROM ranked
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# compression curve: corpus tokens vs merge count — the vocab-sizing curve
# a tokenizer team reads to pick N_MERGES (each checkpoint's saving is the
# marginal utility of more vocabulary). Entirely vocabulary-side: the
# (word, cnt) relation already carries corpus occurrence weights, so NO
# corpus re-join per checkpoint.

BPE_CHECKPOINTS = (0, N_MERGES // 2, N_MERGES)


def q_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per merge-count checkpoint: vocabulary size (distinct words),
    corpus token total under that many trained merges, corpus chars,
    chars-per-token (milli, the compression ratio), and tokens saved vs
    the unmerged baseline (bp). ONE training run captures the state at
    each checkpoint (the snapshots hook on the shared loop).

    Scale shape: the single corpus tokenization pass the trainer already
    pays; each checkpoint leg is one aggregation over the Heaps-bounded
    cached vocabulary relation; the cross-checkpoint fold is a window on
    the |checkpoints|-row relation."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    snaps: dict = {k: None for k in BPE_CHECKPOINTS}
    _train(docs, N_MERGES, snapshots=snaps)
    legs = []
    for k in BPE_CHECKPOINTS:
        legs.append(
            snaps[k]
            .selectExpr(
                f"CAST({k} AS INT) AS merge_rank",
                "cnt",
                "CAST(size(split(trim(BOTH chr(31) FROM symstr),"
                " chr(31) || chr(31))) AS BIGINT) AS ntok",
                "CAST(length(w) AS BIGINT) AS nchr",
            )
            .groupBy("merge_rank")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("vocab_words"),
                F.expr("sum(cnt * ntok)").cast("bigint").alias("corpus_tokens"),
                F.expr("sum(cnt * nchr)").cast("bigint").alias("corpus_chars"),
            )
        )
    allr = legs[0]
    for leg in legs[1:]:
        allr = allr.unionByName(leg)
    w_all = Window.partitionBy()  # |checkpoints|-row bounded relation
    return (
        allr.withColumn(
            "t0",
            F.expr(
                "max(CASE WHEN merge_rank = 0 THEN corpus_tokens END)"
            ).over(w_all),
        )
        .selectExpr(
            "merge_rank",
            "vocab_words",
            "corpus_tokens",
            "corpus_chars",
            "CAST(corpus_chars * 1000 DIV corpus_tokens AS BIGINT)"
            " AS chars_per_token_milli",
            "CAST((t0 - corpus_tokens) * 10000 DIV t0 AS BIGINT)"
            " AS tokens_saved_bp",
        )
        .orderBy("merge_rank")
    )


def _oracle_compression_curve() -> str:
    legs = "\nUNION ALL ".join(
        f"""SELECT CAST({k} AS INT) AS merge_rank,
       CAST(count(*) AS BIGINT) AS vocab_words,
       CAST(sum(cnt * len(string_split(trim(symstr, chr(31)),
                                       chr(31) || chr(31)))) AS BIGINT)
         AS corpus_tokens,
       CAST(sum(cnt * length(w)) AS BIGINT) AS corpus_chars
FROM w{k}"""
        for k in BPE_CHECKPOINTS
    )
    return f"""
WITH {_bpe_ctes()},
ck AS ({legs})
SELECT merge_rank, vocab_words, corpus_tokens, corpus_chars,
       CAST(corpus_chars * 1000 // corpus_tokens AS BIGINT)
         AS chars_per_token_milli,
       CAST((max(CASE WHEN merge_rank = 0 THEN corpus_tokens END) OVER ()
             - corpus_tokens) * 10000
            // max(CASE WHEN merge_rank = 0 THEN corpus_tokens END) OVER ()
            AS BIGINT) AS tokens_saved_bp
FROM ck
ORDER BY merge_rank
"""


ORACLE_BPE_COMPRESSION = _oracle_compression_curve()


QUERIES = {
    "bpe_merge_training": q_bpe_merges,
    "bpe_compression_curve": q_bpe_compression_curve,
    "bpe_token_counts": q_bpe_token_counts,
    "bpe_detokenize_check": q_bpe_detokenize_check,
    "bpe_shard_assignment": q_bpe_shard_assignment,
    "bpe_fertility_by_lang": q_bpe_fertility_by_lang,
}

ORACLES = {
    "bpe_merge_training": ORACLE_BPE_MERGES,
    "bpe_compression_curve": ORACLE_BPE_COMPRESSION,
    "bpe_token_counts": ORACLE_BPE_TOKEN_COUNTS,
    "bpe_detokenize_check": ORACLE_BPE_DETOKENIZE,
    "bpe_shard_assignment": ORACLE_BPE_SHARD_ASSIGNMENT,
    "bpe_fertility_by_lang": ORACLE_BPE_FERTILITY,
}
