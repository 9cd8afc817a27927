"""Search-operator invariants at sf0.001: TF-IDF ranking, BM25 scoring,
chunking geometry, posting-list caps. Exact cross-engine equality is the
driver gate's job (tools/check_correctness.py); these tests pin the
semantics that must hold on ANY corpus."""

import math

from sap_sql_engine_spark.operators import search
from sap_sql_engine_spark.sources.loader import table


def test_tfidf_rank_contract(spark, sf_dir):
    rows = search.q_tfidf_top_terms(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= search.TFIDF_TOP_K
        rs = sorted(rs, key=lambda x: x.rank)
        # scores non-increasing with rank; ties broken by token asc
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (a.score == b.score and a.token < b.token)
        for x in rs:
            assert x.score > 0 and x.tf >= 1 and x.df >= 1


def test_bm25_scores_and_term_counts(spark, sf_dir):
    rows = search.q_bm25_search(spark, sf_dir).collect()
    assert rows
    n_docs = table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 1 <= r.matched_terms <= len(search.BM25_QUERY)
        assert r.bm25 > 0
    # every returned doc actually contains >= 1 query term
    assert len(rows) <= n_docs


def test_bm25_more_occurrences_wins_at_equal_length(spark):
    # same doc length, same matched term: higher tf => strictly higher score
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad1 pad2 pad3"),
            (2, "spark pad0 pad1 pad2 pad3 pad4"),
        ],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("tmp_bm25_docs")
    # run the same math via the operator's building blocks on a temp table:
    # score through q_bm25_search requires a parquet dir, so check the
    # monotonicity of the scoring expression directly
    k1, b = search.BM25_K1, search.BM25_B
    n, df, avgdl, dl = 2.0, 1.0, 6.0, 6.0
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def score(tf):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert score(3) > score(1) > 0


def test_doc_chunks_geometry(spark, sf_dir):
    chunks = search.q_doc_chunks(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        toks = docs[doc_id]
        cs = sorted(cs, key=lambda c: c.chunk_id)
        # contiguous ids from 0, stride-spaced starts, bounded sizes
        assert [c.chunk_id for c in cs] == list(range(len(cs)))
        for c in cs:
            assert c.start_token == c.chunk_id * search.CHUNK_STRIDE + 1
            assert 1 <= c.n_tokens <= search.CHUNK_SIZE
        # full coverage: last chunk reaches the end of the doc
        last = cs[-1]
        assert last.start_token - 1 + last.n_tokens == len(toks)
        # every token index is covered by some chunk
        covered = set()
        for c in cs:
            covered.update(range(c.start_token, c.start_token + c.n_tokens))
        assert covered == set(range(1, len(toks) + 1))


def test_posting_lists_capped_and_consistent(spark, sf_dir):
    rows = search.q_posting_lists(spark, sf_dir).collect()
    assert rows
    for r in rows:
        listed = r.top_docs.split(",")
        assert 1 <= len(listed) <= search.POSTINGS_TOP_DOCS
        assert len(listed) == len(set(listed))
        assert r.df >= len(listed)
        assert r.total_tf >= r.df


def test_cms_one_sided_and_tight_on_small_vocab(spark, sf_dir):
    # count-min guarantee: estimate >= exact, always; with the synthetic
    # corpus vocabulary far below CMS_WIDTH buckets, collisions are rare
    # enough that at least one probe must be exact
    rows = search.q_token_cms(spark, sf_dir).collect()
    assert len(rows) == len(search.CMS_PROBES)
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_estimate == r.exact_count + r.overestimate for r in rows)
    assert any(r.overestimate == 0 for r in rows)


def test_hll_estimates_within_expected_error(spark, sf_dir):
    # m=256 registers -> relative error ~1.04/sqrt(256) = 6.5%. The QUERY
    # emits the raw estimator + the integer LinearCounting input; the
    # client-side correction (hll_corrected) must land within a few sigma
    # of exact at every cardinality regime the corpus has.
    rows = search.q_token_hll(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_distinct > 0
        est = search.hll_corrected(r.hll_raw_estimate, r.n_empty_regs)
        rel = abs(est - r.exact_distinct) / r.exact_distinct
        assert rel < 0.25, f"{r.source}: corrected {est} vs {r.exact_distinct}"


def test_heavy_hitters_exact_and_partition_independent(spark, sf_dir):
    rows = search.q_token_heavy_hitters(spark, sf_dir).collect()
    assert rows
    # exactness: recompute ground truth with a plain full aggregation
    toks = search._tokens(table(spark, sf_dir, "documents")).select("token")
    n = toks.count()
    truth = {
        (r.token, r.c)
        for r in toks.groupBy("token").count().withColumnRenamed("count", "c").collect()
        if r.c * search.HH_K >= n
    }
    assert {(r.token, r.hh_count) for r in rows} == truth
    for r in rows:
        assert abs(r.share - r.hh_count / n) < 1e-15


def test_heavy_hitters_planted_skew_single_hot_token(spark):
    # A hot token concentrated in ONE partition with the rest of the stream
    # spread elsewhere: the pigeonhole candidate pass must surface it no
    # matter how the stream is partitioned.
    import pandas as pd
    from pyspark.sql import functions as F

    hot = ["hot"] * 120
    cold = [f"t{i}" for i in range(2000)]
    df = spark.createDataFrame(
        pd.DataFrame({"token": hot + cold})
    )
    for parts in (1, 7, 32):
        toks = df.repartition(parts)

        def _local(batches):
            import collections

            counts: collections.Counter = collections.Counter()
            total = 0
            for pdf in batches:
                vc = pdf["token"].value_counts()
                total += int(vc.sum())
                for tok, c in vc.items():
                    counts[tok] += int(c)
            yield pd.DataFrame(
                {"token": [t for t, c in counts.items() if c * search.HH_K >= total]}
            )

        cands = toks.mapInPandas(_local, schema="token string").distinct()
        n = toks.count()
        out = (
            toks.join(F.broadcast(cands), "token")
            .groupBy("token")
            .count()
            .filter(F.col("count") * search.HH_K >= F.lit(n))
            .collect()
        )
        assert [(r.token, r["count"]) for r in out] == [("hot", 120)], f"parts={parts}"


def test_hll_registers_merge_algebra(spark, sf_dir):
    # the property that makes the sketch distribute: registers of the whole
    # stream == per-shard registers max-merged, for ANY sharding
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    whole = {
        (r.source, r.bucket): r.r for r in search.hll_registers(toks).collect()
    }
    shard_a = search.hll_registers(toks.filter("length(token) % 2 = 0"))
    shard_b = search.hll_registers(toks.filter("length(token) % 2 = 1"))
    merged = {}
    for r in shard_a.collect() + shard_b.collect():
        k = (r.source, r.bucket)
        merged[k] = max(merged.get(k, 0), r.r)
    assert merged == whole
