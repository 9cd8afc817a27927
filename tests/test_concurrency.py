"""Concurrent-session safety: the temp-view-based operators register
per-call unique names (round-2 verdict item: fixed names collide across
concurrent queries). Run every view-registering query from several threads
at once and assert each result is complete and correct."""

from concurrent.futures import ThreadPoolExecutor

from sap_sql_engine_spark.operators import relational


def test_view_registering_queries_run_concurrently(spark, sf_dir):
    # the three operators that register temp views (uuid-suffixed)
    targets = [
        (relational.q_above_nation_average, None),
        (relational.q_grouping_sets_balance, None),
        (relational.q_recursive_line_chain, None),
    ]
    # sequential baseline counts
    expected = [fn(spark, sf_dir).count() for fn, _ in targets]

    def run(i):
        fn, _ = targets[i % len(targets)]
        return i % len(targets), fn(spark, sf_dir).count()

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(run, range(12)))

    for idx, count in results:
        assert count == expected[idx], (
            f"concurrent run of {targets[idx][0].__name__} returned {count}, "
            f"expected {expected[idx]}"
        )


def test_cache_heavy_compositions_run_concurrently(spark, sf_dir):
    # the round-4 compositions share cached relations (MinHash signatures,
    # shingle relations) through cachereg; concurrent invocations must not
    # race a cache rebuild into wrong or partial results
    from sap_sql_engine_spark.operators import dedup

    targets = [
        dedup.q_split_leakage_report,
        dedup.q_dedup_minhash_lsh,
        dedup.q_corpus_release_funnel,
    ]
    expected = [
        sorted(map(tuple, fn(spark, sf_dir).collect())) for fn in targets
    ]

    from concurrent.futures import ThreadPoolExecutor

    def run(i):
        fn = targets[i % len(targets)]
        return i % len(targets), sorted(map(tuple, fn(spark, sf_dir).collect()))

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(run, range(9)))

    for idx, rows in results:
        assert rows == expected[idx], targets[idx].__name__


def test_r5_cache_sharing_queries_run_concurrently(spark, sf_dir):
    # round-5 cache users: the ANN recall report's shared featurized
    # relation, the k-means loop's cached vocabulary/centroids, and the
    # BPE trainer's cached word counts — concurrent invocations must not
    # race a cache rebuild into wrong or partial results
    from sap_sql_engine_spark.operators import bpe, similarity

    targets = [
        similarity.q_ann_recall_report,
        similarity.q_kmeans_embedding_fit,
        bpe.q_bpe_merges,
    ]
    expected = [
        sorted(map(tuple, fn(spark, sf_dir).collect())) for fn in targets
    ]

    from concurrent.futures import ThreadPoolExecutor

    def run(i):
        fn = targets[i % len(targets)]
        return i % len(targets), sorted(map(tuple, fn(spark, sf_dir).collect()))

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(run, range(6)))

    for idx, rows in results:
        assert rows == expected[idx], targets[idx].__name__
