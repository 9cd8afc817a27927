"""Property-based tests (hypothesis) for the round-9 operators: the BPE
tokenizer round-trip decode(encode(x)) == x on adversarial merge-boundary
corpora — repeated symbols, alternating patterns, and words that are
prefixes/suffixes of each other are exactly where a naive merge replace
corrupts segmentations."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sap_sql_engine_spark.operators import bpe

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny alphabet maximizes merge collisions: "aaaa", "abab", "aab" share
# pairs, so trained merges constantly straddle word boundaries
WORDS = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(words=WORDS)
def test_bpe_roundtrip_decode_encode_identity(spark, tmp_path_factory, words):
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    _, vocab = bpe._train(docs, bpe.N_MERGES)
    rows = vocab.selectExpr(
        "w",
        "split(trim(BOTH chr(31) FROM symstr), chr(31) || chr(31)) AS sy",
    ).collect()
    assert {r.w for r in rows} == set(words)
    for r in rows:
        # decode == identity: symbols concatenate back to the exact word
        assert "".join(r.sy) == r.w, (r.w, r.sy)
        # and the segmentation is valid: no empty or separator-bearing symbol
        assert all(s and bpe.SEP not in s for s in r.sy), (r.w, r.sy)
