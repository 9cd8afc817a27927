"""Multi-format ingest: JSONL/CSV round-trips of the documents table and
the measurable-loss (corrupt-record) contract."""

import json

from pyspark.sql import functions as F

from sap_sql_engine_spark.sources import ingest


def _docs_schema(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").schema


def _canon(df):
    rows = df.select("doc_id", "text", "lang", "source", "n_chars").collect()
    return sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in rows)


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    pq = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    pq.write.mode("overwrite").json(path)
    got = ingest.read_jsonl(spark, path, pq.schema)
    good, bad = ingest.split_corrupt(got)
    assert bad.count() == 0
    assert _canon(good) == _canon(pq)


def test_csv_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    pq = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_csv")
    # RFC-4180 writer settings mirroring the reader (quote-doubling escape)
    (
        pq.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    got = ingest.read_csv(spark, path, pq.schema, header=True)
    good, bad = ingest.split_corrupt(got)
    assert bad.count() == 0
    assert _canon(good) == _canon(pq)


def test_jsonl_malformed_rows_are_captured_not_dropped(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "good row", "lang": "en"}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also good", "lang": "en"}),
        '{"doc_id": "NOT_A_NUMBER", "text": "type clash", "lang": "en"}',
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    schema = "doc_id LONG, text STRING, lang STRING"
    from pyspark.sql.types import _parse_datatype_string

    df = ingest.read_jsonl(spark, str(p), _parse_datatype_string(schema))
    good, bad = ingest.split_corrupt(df)
    assert {r.doc_id for r in good.collect()} == {1, 2}
    # both the syntactically-broken line AND the type-clash row are
    # captured raw — loss is measurable, schema never retypes
    assert bad.count() == 2


def test_csv_embedded_commas_and_quotes_roundtrip(spark, tmp_path):
    rows = [
        (1, 'has, comma', "en"),
        (2, 'has "quotes" inside', "en"),
        (3, "plain", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    path = str(tmp_path / "tricky_csv")
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    got = ingest.read_csv(spark, path, df.schema, header=True)
    good, bad = ingest.split_corrupt(got)
    assert bad.count() == 0
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [
        (1, 'has, comma'),
        (2, 'has "quotes" inside'),
        (3, "plain"),
    ]


def test_jsonl_stream_matches_batch(spark, tmp_path):
    # drop-folder pattern: the file-source stream must parse EXACTLY like
    # the batch reader — same schema pin, same corrupt-record capture
    from pyspark.sql.types import _parse_datatype_string

    d = tmp_path / "drops"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "one", "lang": "en"}\n'
        "{broken line\n"
        '{"doc_id": 2, "text": "two", "lang": "de"}\n'
    )
    (d / "b.jsonl").write_text('{"doc_id": 3, "text": "three", "lang": "fr"}\n')
    schema = _parse_datatype_string("doc_id LONG, text STRING, lang STRING")

    q = (
        ingest.stream_jsonl(spark, str(d), schema)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM ingest_stream_test")
    batch = ingest.read_jsonl(spark, str(d), schema)

    def canon(df):
        rows = [
            (r.doc_id, r.text, r.lang, r[ingest.CORRUPT_COL]) for r in df.collect()
        ]
        # None-safe total order (corrupt rows have NULL data columns)
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    assert canon(streamed) == canon(batch)
    s_good, s_bad = ingest.split_corrupt(streamed)
    assert s_bad.count() == 1 and s_good.count() == 3


def test_csv_stream_matches_batch(spark, tmp_path):
    # CSV drop-folder twin: stream must parse EXACTLY like read_csv —
    # same schema pin, corrupt capture, and RFC-4180 quote-doubling
    from pyspark.sql.types import _parse_datatype_string

    d = tmp_path / "csv_drops"
    d.mkdir()
    (d / "a.csv").write_text(
        "doc_id,text,lang\n"
        '1,"one, with a comma",en\n'
        '2,"a ""quoted"" word",de\n'
        "not,a,valid,row,too-many-cols\n"
    )
    (d / "b.csv").write_text("doc_id,text,lang\n3,three,fr\n")
    schema = _parse_datatype_string("doc_id LONG, text STRING, lang STRING")

    q = (
        ingest.stream_csv(spark, str(d), schema)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_csv_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM ingest_csv_stream_test")
    batch = ingest.read_csv(spark, str(d), schema)

    def canon(df):
        rows = [
            (r.doc_id, r.text, r.lang, r[ingest.CORRUPT_COL]) for r in df.collect()
        ]
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    assert canon(streamed) == canon(batch)
    got = {r.text for r in streamed.filter("doc_id IS NOT NULL").collect()}
    assert got == {"one, with a comma", 'a "quoted" word', "three"}


def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    pq = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_orc")
    ingest.write_orc(pq, path)
    got = ingest.read_orc(spark, path, pq.schema)
    assert _canon(got) == _canon(pq)


def test_orc_corrupt_file_fails_loud_then_skips_measurably(
    spark, sf_dir, tmp_path
):
    """ORC's failure unit is the FILE: default read aborts on a garbage
    file; ignore_corrupt_files skips it and the loss is measurable as
    the row delta."""
    import glob

    import pytest

    pq = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_orc_corrupt")
    ingest.write_orc(pq.coalesce(4), path)
    n_good = pq.count()
    # plant a garbage file that claims to be ORC
    with open(f"{path}/part-zzz-garbage.orc", "wb") as fh:
        fh.write(b"ORC\x00not really an orc stripe" * 64)
    with pytest.raises(Exception):
        ingest.read_orc(spark, path, pq.schema).count()
    survived = ingest.read_orc(
        spark, path, pq.schema, ignore_corrupt_files=True
    )
    assert survived.count() == n_good  # good files all survive
    assert len(glob.glob(f"{path}/*.orc")) >= 2  # garbage file still there


def test_orc_predicate_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    """The point of the ORC lane at scale: filters reach the ORC scan as
    pushed filters exactly like parquet (structural check on the scan
    node's pushedFilters, not plan text)."""
    from sap_sql_engine_spark.sources.layout import _exec_nodes

    pq = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_orc_pushdown")
    ingest.write_orc(pq, path)
    q = ingest.read_orc(spark, path, pq.schema).filter(
        F.col("lang") == "en"
    ).select("doc_id")
    q.collect()
    scans = [
        n
        for n in _exec_nodes(q)
        if n.getClass().getSimpleName() == "FileSourceScanExec"
    ]
    assert scans
    pushed = scans[0].pushedDownFilters()
    rendered = [str(pushed.apply(i)) for i in range(pushed.size())]
    assert any("lang" in s for s in rendered), rendered


def test_avro_lane_gated_or_roundtrips(spark, sf_dir, tmp_path):
    """Avro is an external Spark module; absent → the lane refuses with
    deployment instructions (never fakes), present → full round-trip."""
    import pytest

    pq = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_avro")
    if ingest.avro_available(spark):
        ingest.write_avro(pq, path)
        got = ingest.read_avro(spark, path, pq.schema)
        assert _canon(got) == _canon(pq)
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            ingest.write_avro(pq, path)
        with pytest.raises(RuntimeError, match="spark-avro"):
            ingest.read_avro(spark, path)


def test_schema_evolution_merge_and_fill_report(spark, tmp_path):
    """Two producer versions write the same directory (v2 adds a
    column); the evolution-safe read surfaces the union schema with v1
    rows NULL in the new column, and the fill report quantifies the
    evolution. The default read's footer-sampling hazard is documented
    behavior — this test pins the SAFE path, not the hazard's file
    order."""
    from sap_sql_engine_spark.sources import ingest

    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("append").parquet(out)
    spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "id long, name string, score long"
    ).write.mode("append").parquet(out)

    df = ingest.read_evolving(spark, out)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None),
                    3: ("c", 30), 4: ("d", 40)}

    rep = {
        r.column_name: (r.n_rows, r.n_filled, r.fill_permille)
        for r in ingest.schema_fill_report(df).collect()
    }
    assert rep == {
        "id": (4, 4, 1000),
        "name": (4, 4, 1000),
        "score": (4, 2, 500),
    }


def test_schema_fill_report_hostile_column_names(spark, tmp_path):
    """Column names with spaces, quotes, dots, and backticks flow through
    the fill report unmangled — the report builds typed Column
    expressions, so no identifier is ever re-parsed from a SQL string
    (r12 advice item)."""
    from sap_sql_engine_spark.sources import ingest

    df = spark.createDataFrame(
        [(1, "x", None), (2, None, "y")],
        ["plain", "has space", "it's`odd`.name"],
    )
    rep = {
        r.column_name: (r.n_rows, r.n_filled, r.fill_permille)
        for r in ingest.schema_fill_report(df).collect()
    }
    assert rep == {
        "plain": (2, 2, 1000),
        "has space": (2, 1, 500),
        "it's`odd`.name": (2, 1, 500),
    }
