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


TEXTS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=65,  # DHASH_CELLS: below this both lanes drop the row
        max_size=200,
    ),
    min_size=1,
    max_size=4,
)


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_dhash_sql_lane_equals_python_lane_property(spark, texts):
    """Cross-lane property on arbitrary printable signals: the relational
    SQL dHash (what the driver gate verifies) and the pure-Python
    definition (what the PNG/WAV decode lane runs) agree band-for-band."""
    from sap_sql_engine_spark.operators.multimodal import (
        dhash_bands,
        sql_dhash_bands,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.media_id, r.band_no): r.band_val
        for r in sql_dhash_bands(docs).collect()
    }
    for i, t in enumerate(texts):
        expected = dhash_bands([ord(c) for c in t])
        assert [got[(i, k)] for k in range(4)] == expected, (i, t)


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
