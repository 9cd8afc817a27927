"""Property-based tests (hypothesis): the distributed operators against
independent in-process oracles on randomly generated inputs.

Each property runs a handful of examples (every example is a full Spark
job), with deterministic derandomized search so CI never flakes. These
complement the DuckDB gate: the gate pins one corpus, these pin the
ALGORITHM over arbitrary inputs — skew, ties, empties, singletons.
"""

from __future__ import annotations

import math

import networkx as nx
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sap_sql_engine_spark.operators import dedup
from sap_sql_engine_spark.plans import dialect
from sap_sql_engine_spark.streaming import events as ev

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


# ---------------------------------------------------------------------------
# n-gram Jaccard vs a pure-Python brute force


def _py_jaccard_pairs(texts: dict[int, str]) -> dict[tuple[int, int], float]:
    n_docs = len(texts)
    cap = max(dedup.DF_CAP_MIN, math.ceil(n_docs * dedup.DF_CAP_FRACTION))
    shingles = {}
    for did, text in texts.items():
        toks = text.split()
        shingles[did] = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        }
    df: dict[str, int] = {}
    for s in shingles.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    shingles = {d: {g for g in s if df[g] <= cap} for d, s in shingles.items()}
    out = {}
    ids = sorted(texts)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            inter = len(shingles[d1] & shingles[d2])
            union = len(shingles[d1] | shingles[d2])
            if union == 0 or inter == 0:
                continue
            j = round(inter / union, 4)
            if j >= dedup.JACCARD_THRESHOLD:
                out[(d1, d2)] = j
    return out


@st.composite
def _corpus(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    texts = {}
    for did in range(n):
        words = draw(
            st.lists(st.sampled_from(VOCAB), min_size=3, max_size=20)
        )
        texts[did] = " ".join(words)
    return texts


@given(_corpus())
@settings(**SETTINGS)
def test_jaccard_matches_bruteforce(spark, texts):
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        (r.doc1, r.doc2): r.jaccard
        for r in dedup.jaccard_pairs(docs).collect()
    }
    assert got == _py_jaccard_pairs(texts)


# ---------------------------------------------------------------------------
# connected components vs networkx


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_connected_components_match_networkx(spark, edge_list):
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edge_list], ["doc1", "doc2"]
    )
    got = {
        r.node: r.label for r in dedup.connected_components(edges).collect()
    }
    g = nx.Graph()
    g.add_edges_from(edge_list)
    for comp in nx.connected_components(g):
        label = min(comp)
        for node in comp:
            assert got[node] == label


# ---------------------------------------------------------------------------
# sessionization vs a pure-Python fold


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user_id
            st.integers(min_value=0, max_value=10**7),  # seconds offset
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_sessionize_matches_python_fold(spark, raw):
    rows = [
        (uid, eid, sec) for eid, (uid, sec) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "sec"]).select(
        "user_id", "event_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    got = {
        r.user_id: (r.session_count, r.total_events, r.max_session_events)
        for r in ev.sessionize_from(df).collect()
    }

    by_user: dict[int, list[tuple[int, int]]] = {}
    for uid, eid, sec in rows:
        by_user.setdefault(uid, []).append((sec, eid))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        sessions = []
        for sec, _ in evs:
            if sessions and sec - sessions[-1][-1] <= ev.SESSION_GAP_SECONDS:
                sessions[-1].append(sec)
            else:
                sessions.append([sec])
        expect[uid] = (
            len(sessions),
            len(evs),
            max(len(s) for s in sessions),
        )
    assert got == expect


# ---------------------------------------------------------------------------
# dialect transpiler: idempotence and statement-guard invariants


_DIALECT_SNIPPETS = [
    "SELECT TO_CHAR(d, 'YYYY-MM-DD') FROM t",
    "SELECT ADD_DAYS(SYSDATE, 7) FROM t",
    "SELECT TOP 5 a FROM t",
    "SELECT IFNULL(a, 0), NVL(b, '') FROM t",
    "SELECT julianday(a) - julianday(b) FROM t",
    "SELECT strftime('%Y-%m', d) FROM t",
    "SELECT a FROM t WHERE x NOT IN (SELECT y FROM u)",
    "SELECT DAYS_BETWEEN(a, b) FROM t",
    "SELECT TO_DATE('2024-01-01') FROM t",
    "SELECT printf('%s-%d', a, b) FROM t",
]


@given(
    st.sampled_from(_DIALECT_SNIPPETS),
    st.sampled_from(["", " ", "\n", "\t"]),
    st.sampled_from(["", ";", " ; "]),
)
@settings(**SETTINGS)
def test_transpile_idempotent(snippet, pad, tail):
    sql = pad + snippet + pad + tail
    once = dialect.transpile(sql)
    assert dialect.transpile(once) == once
    # the guard keeps exactly one statement
    assert ";" not in once.rstrip().rstrip(";")


# ---------------------------------------------------------------------------
# generic as-of join vs a pure-Python naive backward scan


@given(
    st.lists(  # trades: (acct, ts) unique per list
        st.tuples(st.integers(1, 3), st.integers(0, 40)),
        min_size=1, max_size=12, unique=True,
    ),
    st.lists(  # quotes: (acct, ts) unique; price may be genuinely NULL
        st.tuples(
            st.integers(1, 3),
            st.integers(0, 40),
            st.one_of(st.none(), st.integers(0, 999)),
        ),
        min_size=0, max_size=12, unique_by=lambda q: (q[0], q[1]),
    ),
)
@settings(**SETTINGS)
def test_asof_join_matches_naive_backward_scan(spark, trades, quotes):
    from sap_sql_engine_spark.operators.asof import asof_join

    tdf = spark.createDataFrame(
        [(a, t, f"t{i}") for i, (a, t) in enumerate(trades)],
        "acct INT, ts INT, trade_id STRING",
    )
    qdf = spark.createDataFrame(quotes, "acct INT, ts INT, price INT") if quotes else (
        spark.createDataFrame([], "acct INT, ts INT, price INT")
    )
    got = {
        r.trade_id: r.price
        for r in asof_join(tdf, qdf, by="acct", ts="ts", right_cols=["price"]).collect()
    }
    want = {}
    for i, (a, t) in enumerate(trades):
        prior = [q for q in quotes if q[0] == a and q[1] <= t]
        want[f"t{i}"] = max(prior, key=lambda q: q[1])[2] if prior else None
    assert got == want


# ---------------------------------------------------------------------------
# SCD2 history build vs a pure-Python fold


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),     # user_id
            st.integers(min_value=0, max_value=5000),  # epoch sec (ties likely)
            st.sampled_from(["a", "b", "c"]),          # event_type
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_scd2_matches_python_fold(spark, raw):
    rows = [(uid, eid, sec, t) for eid, (uid, sec, t) in enumerate(raw)]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "sec", "event_type"]
    ).select(
        "user_id", "event_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    got = {
        (r.user_id, r.version): (r.event_type, r.valid_from, r.valid_to, r.is_current, r.n_events)
        for r in ev.scd2_from(df).collect()
    }

    import datetime as dt

    def fmt(sec):
        return dt.datetime.fromtimestamp(sec, dt.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )

    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for uid, eid, sec, t in rows:
        by_user.setdefault(uid, []).append((sec, eid, t))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()  # (ts, event_id) order — the query's tiebreak
        runs: list[list[tuple[int, int, str]]] = []
        for e in evs:
            if runs and runs[-1][-1][2] == e[2]:
                runs[-1].append(e)
            else:
                runs.append([e])
        for i, run in enumerate(runs):
            nxt = fmt(runs[i + 1][0][0]) if i + 1 < len(runs) else None
            expect[(uid, i + 1)] = (
                run[0][2],
                fmt(run[0][0]),
                nxt,
                int(nxt is None),
                len(run),
            )
    assert got == expect


# ---------------------------------------------------------------------------
# market-basket pairs vs a pure-Python count


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),   # orderkey
            st.integers(min_value=1, max_value=6),   # partkey
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_copurchase_matches_python(spark, raw):
    from sap_sql_engine_spark.operators import relational

    df = spark.createDataFrame(raw, ["l_orderkey", "l_partkey"])
    items = {(o, p) for o, p in raw}
    baskets: dict[int, set[int]] = {}
    for o, p in items:
        baskets.setdefault(o, set()).add(p)
    support: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                support[(a, b)] = support.get((a, b), 0) + 1
    part_orders: dict[int, int] = {}
    for parts in baskets.values():
        for p in parts:
            part_orders[p] = part_orders.get(p, 0) + 1
    n_orders = len(baskets)
    expect = {
        (a, b): (c, c * n_orders / (part_orders[a] * part_orders[b]))
        for (a, b), c in support.items()
        if c >= relational.BASKET_MIN_SUPPORT
    }

    # drive the same operator body on the generated relation via a temp dir
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        got = {
            (r.p1, r.p2): (r.support, r.lift)
            for r in relational.q_parts_copurchase(spark, d).collect()
        }
    assert set(got) == set(expect)
    for k, (sup, lift) in expect.items():
        assert got[k][0] == sup
        # Spark rounds half-up, Python half-even — compare to the grid
        assert abs(got[k][1] - lift) <= 5.0001e-5


# ---------------------------------------------------------------------------
# rolling distinct actives vs a pure-Python window


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),    # user
            st.integers(min_value=0, max_value=20),   # day offset
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_active_users_matches_python(spark, raw):
    import datetime as dt
    import tempfile

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(days=d, hours=u), u, "click", 0.0, "{}")
        for i, (u, d) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    user_days = {(u, (base + dt.timedelta(days=d)).date()) for _, (u, d) in enumerate(raw)}
    days = sorted({day for _, day in user_days})
    expect = {}
    for day in days:
        dau = len({u for u, dd in user_days if dd == day})
        w = len({
            u for u, dd in user_days
            if day - dt.timedelta(days=ev.ACTIVE_WINDOW_DAYS - 1) <= dd <= day
        })
        expect[day.strftime("%Y-%m-%d")] = (dau, w)

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r.day: (r.dau, r[f"wau_{ev.ACTIVE_WINDOW_DAYS}d"])
            for r in ev.q_events_active_users(spark, d).collect()
        }
    assert got == expect


# ---------------------------------------------------------------------------
# exact heavy hitters vs a pure-Python count


@given(
    st.lists(st.sampled_from(VOCAB + ["hot"] * 4), min_size=1, max_size=120)
)
@settings(**SETTINGS)
def test_heavy_hitters_match_python(spark, tokens):
    from pyspark.sql import functions as F

    from sap_sql_engine_spark.operators import search

    df = spark.createDataFrame([(t,) for t in tokens], ["token"]).repartition(5)
    n = len(tokens)
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    expect = {t: c for t, c in counts.items() if c * search.HH_K >= n}

    def _local(batches):
        import collections

        import pandas as pd

        cs: collections.Counter = collections.Counter()
        total = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            total += int(vc.sum())
            for tok, c in vc.items():
                cs[tok] += int(c)
        yield pd.DataFrame(
            {"token": [t for t, c in cs.items() if c * search.HH_K >= total]}
        )

    cands = df.mapInPandas(_local, schema="token string").distinct()
    got = {
        r.token: r.c
        for r in df.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * search.HH_K >= F.lit(n))
        .collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# z-order interleave vs a pure-Python bit mirror


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_zvalue_matches_python_interleave(spark, pairs):
    from pyspark.sql import functions as F

    from sap_sql_engine_spark.operators import skew

    def py_z(u1, u2):
        z = 0
        for b in range(skew.ZORDER_BITS):
            z |= ((u1 >> b) & 1) << (2 * b + 1)
            z |= ((u2 >> b) & 1) << (2 * b)
        return z

    df = spark.createDataFrame(pairs, ["u1", "u2"])
    got_pairs = {
        (r.u1, r.u2): r.z
        for r in df.select(
            "u1", "u2",
            skew._zvalue(F.col("u1").cast("int"), F.col("u2").cast("int")).alias("z"),
        ).collect()
    }
    for (u1, u2) in pairs:
        assert got_pairs[(u1, u2)] == py_z(u1, u2)


# ---------------------------------------------------------------------------
# SimHash signatures vs a pure-Python mirror


@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_simhash_signature_matches_python(spark, texts):
    import hashlib
    import tempfile

    from sap_sql_engine_spark.operators import dedup

    def py_simhash(text):
        counters = [0] * dedup.SIMHASH_BITS
        for tok in text.strip().split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            for b in range(dedup.SIMHASH_BITS):
                counters[b] += 1 if (h >> b) & 1 else -1
        sig = 0
        for b in range(dedup.SIMHASH_BITS):
            if counters[b] > 0:
                sig |= 1 << b
        return sig

    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {r.doc_id: r.simhash for r in dedup._simhash(spark, d).collect()}
    assert got == {i: py_simhash(t) for i, t in enumerate(texts)}


# ---------------------------------------------------------------------------
# BPE merge training vs a pure-Python greedy implementation


def _py_bpe(texts, n_merges):
    from collections import Counter

    wc = Counter(w for t in texts for w in t.strip().split() if w)
    state = [(list(w), c) for w, c in wc.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for syms, c in state:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c  # overlapping occurrences count
        if not pc:
            break
        (s1, s2), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, s1, s2, s1 + s2, c))
        new_state = []
        for syms, cnt in state:
            out, i = [], 0
            while i < len(syms):  # greedy left-to-right non-overlapping
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state.append((out, cnt))
        state = new_state
    return merges


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aaaa", "abab", "ab", "ba", "xa", "b", "aab", "x"]),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_bpe_merges_match_python_greedy(spark, texts):
    # the word set is chosen adversarially for the string-encoded merge
    # apply: runs ("aaaa" — non-overlap parity), adjacent occurrences
    # ("abab" — shared-boundary skips), and suffix collisions ("xa" + "b"
    # must NOT merge as (a, b))
    import tempfile

    from sap_sql_engine_spark.operators import bpe

    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = [
            (r.merge_rank, r.s1, r.s2, r.merged, r.pair_count)
            for r in bpe.bpe_merges_from(
                spark.read.parquet(f"{d}/documents.parquet"), n_merges=3
            ).collect()
        ]
    assert got == _py_bpe(texts, 3)  # 3 rounds cover all adversarial cases


def test_bpe_token_counts_match_python(spark, tmp_path):
    # fixed adversarial corpus; mirror = greedy-apply the learned merges
    # per word, then count symbols per document
    from sap_sql_engine_spark.operators import bpe

    texts = [
        "aaaa abab ab ab ba xa b",
        "aab aab x aaaa",
        "ab ba ab aaaa abab",
    ]
    merges = _py_bpe(texts, bpe.N_MERGES)

    def tokens(word):
        syms = list(word)
        for _, s1, s2, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expected = {
        i: (len(t.split()), sum(tokens(w) for w in t.split()))
        for i, t in enumerate(texts)
    }
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe.q_bpe_token_counts(spark, sf_dir).collect()
    }
    assert got == expected


def test_kmeans_matches_python_lloyd(spark, sf_dir):
    # exact-match mirror of the quantized Lloyd recurrence on the real
    # corpus: quantized distances, (d2u, cid) argmin, integer-quantized
    # component means — every step replicated in pure Python
    import math

    from sap_sql_engine_spark.operators import similarity as sim

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    Q = sim.KM_Q
    cent = {cid: vecs[cid][:] for cid in range(sim.KM_K)}

    def d2u(v, c):
        s = 0.0
        for x, y in zip(v, c):
            s += (x - y) * (x - y)
        return math.floor(s * Q)

    def assign(cent):
        out = {}
        for vid, v in vecs.items():
            out[vid] = min((d2u(v, c), cid) for cid, c in sorted(cent.items()))
        return out

    for _ in range(sim.KM_ITERS):
        a = assign(cent)
        sums, cnts = {}, {}
        for vid, (_, cid) in a.items():
            cnts[cid] = cnts.get(cid, 0) + 1
            acc = sums.setdefault(cid, [0] * len(vecs[vid]))
            for p, x in enumerate(vecs[vid]):
                acc[p] += math.floor(x * Q)
        cent = {
            cid: [s / (cnts[cid] * Q) for s in acc]
            for cid, acc in sums.items()
        }
    final = assign(cent)
    expect = {}
    for vid, (du, cid) in final.items():
        n, i = expect.get(cid, (0, 0))
        expect[cid] = (n + 1, i + du)

    got = {
        r.cluster_id: (r.n_vecs, r.inertia_micro)
        for r in sim.q_kmeans_embedding_fit(spark, sf_dir).collect()
    }
    assert got == expect


def test_results_independent_of_shuffle_partition_count(spark, sf_dir):
    """The determinism conventions (FLOATS.md) claim every gated query's
    output is independent of physical parallelism — DECIMAL money sums,
    integer-quantized ln sums, and tie-broken windows are associative/
    deterministic regardless of how rows land in partitions. Pin it:
    representative queries from each float class produce identical rows
    under shuffle_partitions=3 and =17 (both != the session's 8, both
    coprime-ish so reducer assignments genuinely differ)."""
    from sap_sql_engine_spark import cachereg
    from sap_sql_engine_spark.operators import relational, textanalysis

    picks = {
        "pricing_summary": relational.q_pricing_summary,  # class A DECIMAL
        "quantity_price_corr": relational.q_quantity_price_corr,  # class B
        "zipf_slope_fit": textanalysis.q_zipf_slope,  # class C ln
        "nb_language_report": textanalysis.q_nb_language_report,  # class C
        "running_balance": relational.q_running_balance,  # window+tiebreak
    }
    base = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for name, fn in picks.items():
                rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
                cachereg.release()
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across shuffle partition counts"
        assert a, f"{name} returned no rows"
