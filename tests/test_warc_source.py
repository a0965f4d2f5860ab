"""WARC custom data source (sources/warc.py): round-trip, partitioning,
reader-side record-type pushdown, gzip handling, and malformed input.
"""

from __future__ import annotations

import gzip

import pytest

from walmart_e_commerce_sales_data_pipeline_spark.sources.warc import (
    WarcDataSource,
    parse_warc,
    write_warc,
)


def _records(prefix: str, n: int):
    out = []
    for i in range(n):
        out.append(
            {
                "record_id": f"<urn:uuid:{prefix}-{i}>",
                "warc_type": "response" if i % 2 == 0 else "request",
                "target_uri": f"http://example.com/{prefix}/{i}",
                "warc_date": "2026-08-14T00:00:00Z",
                "content_type": "text/plain",
                # binary payloads with CRLFs and a fake header block inside,
                # to prove Content-Length framing (not delimiter scanning)
                "payload": f"HTTP/1.1 200 OK\r\n\r\nbody {prefix} {i}\r\n".encode()
                + bytes([0, 1, 2, i]),
            }
        )
    return out


@pytest.fixture
def warc_dir(tmp_path):
    write_warc(str(tmp_path / "seg-00.warc"), _records("a", 4))
    write_warc(str(tmp_path / "seg-01.warc.gz"), _records("b", 3))
    return tmp_path


def test_roundtrip_and_partitioning(spark, warc_dir):
    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(str(warc_dir))
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 7
    # one partition per segment file
    assert df.rdd.getNumPartitions() == 2
    # payload bytes survive exactly, through gzip too
    orig = {r["record_id"]: r for r in _records("a", 4) + _records("b", 3)}
    for rid, rec in orig.items():
        got = rows[rid]
        assert bytes(got["payload"]) == rec["payload"]
        assert got["content_length"] == len(rec["payload"])
        assert got["warc_type"] == rec["warc_type"]
        assert got["target_uri"] == rec["target_uri"]
    # source_file attribution matches the segment the record came from
    assert {r["source_file"].rsplit("/", 1)[-1] for r in rows.values()} == {
        "seg-00.warc",
        "seg-01.warc.gz",
    }


def test_record_type_pushdown_filters_in_reader(spark, warc_dir):
    spark.dataSource.register(WarcDataSource)
    df = (
        spark.read.format("warc")
        .option("record_types", "response")
        .load(str(warc_dir))
    )
    types = {r["warc_type"] for r in df.collect()}
    assert types == {"response"}
    assert df.count() == 4  # a: i in {0,2}; b: i in {0,2}


def test_downstream_spark_ops_compose(spark, warc_dir):
    """The source feeds normal Catalyst ops: filter, length(), group-by —
    the payload stays binary until a downstream decode stage."""
    from pyspark.sql import functions as F

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(str(warc_dir))
    agg = (
        df.filter(F.col("warc_type") == "response")
        .groupBy("warc_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("bytes"),
        )
        .collect()
    )
    assert agg[0]["n"] == 4
    expected = sum(
        len(r["payload"])
        for r in _records("a", 4) + _records("b", 3)
        if r["warc_type"] == "response"
    )
    assert agg[0]["bytes"] == expected


def test_parser_handles_folded_headers_and_lf_endings(tmp_path):
    raw = (
        b"WARC/1.0\n"
        b"WARC-Record-ID: <urn:uuid:x>\n"
        b"WARC-Type: metadata\n"
        b"WARC-Target-URI: http://example.com/very/long\n"
        b"\t/folded/continuation\n"
        b"Content-Length: 5\n"
        b"\n"
        b"hello\n\n"
    )
    p = tmp_path / "lf.warc"
    p.write_bytes(raw)
    with open(p, "rb") as f:
        (rec,) = list(parse_warc(f))
    assert rec["payload"] == b"hello"
    assert rec["target_uri"].endswith("/folded/continuation")


def test_truncated_record_raises(tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(
        b"WARC/1.0\r\nWARC-Record-ID: <urn:uuid:y>\r\n"
        b"Content-Length: 100\r\n\r\nshort"
    )
    with open(p, "rb") as f:
        with pytest.raises(ValueError, match="truncated"):
            list(parse_warc(f))


def test_multimember_gzip_streams(tmp_path):
    """CommonCrawl writes one gzip member per record; Python gzip streams
    across members, so the reader must see every record."""
    p = tmp_path / "mm.warc.gz"
    with open(p, "wb") as out:
        for rec in _records("m", 3):
            payload = rec["payload"]
            head = (
                f"WARC/1.0\r\nWARC-Record-ID: {rec['record_id']}\r\n"
                f"WARC-Type: {rec['warc_type']}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            out.write(gzip.compress(head + payload + b"\r\n\r\n"))
    with gzip.open(p, "rb") as f:
        recs = list(parse_warc(f))
    assert [r["record_id"] for r in recs] == [
        r["record_id"] for r in _records("m", 3)
    ]


def test_stream_tails_segment_drops(spark, tmp_path):
    """readStream.format('warc') ingests each newly dropped segment file
    exactly once: two drops -> both record sets in the sink, no
    duplicates, and the replay path (readBetweenOffsets) is exercised by
    the micro-batch engine's offset log."""
    from pyspark.sql import functions as F

    spark.dataSource.register(WarcDataSource)
    drop = tmp_path / "drops"
    drop.mkdir()
    write_warc(str(drop / "seg-00.warc"), _records("s0", 2))

    seen: list = []
    q = (
        spark.readStream.format("warc")
        .load(str(drop))
        .writeStream.foreachBatch(
            lambda df, _id: seen.extend(df.collect())
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["record_id"] for r in seen}
        assert first == {r["record_id"] for r in _records("s0", 2)}
        write_warc(str(drop / "seg-01.warc.gz"), _records("s1", 3))
        q.processAllAvailable()
    finally:
        q.stop()
    ids = [r["record_id"] for r in seen]
    assert len(ids) == len(set(ids)) == 5, ids
    assert {r["record_id"] for r in seen} == {
        r["record_id"] for r in _records("s0", 2) + _records("s1", 3)
    }
    # payloads stream through byte-exact as well
    by_id = {r["record_id"]: bytes(r["payload"]) for r in seen}
    for rec in _records("s0", 2) + _records("s1", 3):
        assert by_id[rec["record_id"]] == rec["payload"]


def test_write_roundtrip_and_atomicity(spark, tmp_path):
    """df.write.format('warc') re-shards a corpus: one segment per input
    partition, mode('overwrite') clears prior segments, no .inprogress
    files survive a successful commit, and reading back returns the
    identical records."""
    spark.dataSource.register(WarcDataSource)
    out = tmp_path / "out"
    src = _records("w", 6)
    df = spark.createDataFrame(
        [
            (
                r["record_id"],
                r["warc_type"],
                r["target_uri"],
                r["warc_date"],
                r["content_type"],
                len(r["payload"]),
                r["payload"],
                "orig",
            )
            for r in src
        ],
        schema=(
            "record_id string, warc_type string, target_uri string, "
            "warc_date string, content_type string, content_length long, "
            "payload binary, source_file string"
        ),
    ).repartition(3)
    df.write.format("warc").mode("append").save(str(out))
    names = sorted(p.name for p in out.iterdir())
    assert len([n for n in names if n.endswith(".warc.gz")]) == 3
    assert not [n for n in names if n.endswith(".inprogress")]

    back = spark.read.format("warc").load(str(out)).collect()
    got = {r["record_id"]: bytes(r["payload"]) for r in back}
    assert got == {r["record_id"]: r["payload"] for r in src}

    # overwrite replaces the previous segments entirely
    df.limit(2).repartition(1).write.format("warc").mode("overwrite").save(str(out))
    again = spark.read.format("warc").load(str(out)).collect()
    assert len(again) == 2
    assert len([p for p in out.iterdir() if p.name.endswith(".warc.gz")]) == 1


def test_warc_feeds_the_curation_operators(spark, tmp_path):
    """End-to-end ingestion composition: WARC segments -> payload decode
    (expression-level, payload is UTF-8 here) -> the text-curation
    operators run unchanged on the decoded column."""
    from pyspark.sql import functions as F

    from walmart_e_commerce_sales_data_pipeline_spark.functions.text import (
        quality_score,
        token_count,
    )

    spark.dataSource.register(WarcDataSource)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spark reads web archives now and the corpus grows",
        "short",
    ]
    write_warc(
        str(tmp_path / "docs.warc.gz"),
        [
            {
                "record_id": f"<urn:uuid:d{i}>",
                "warc_type": "response",
                "target_uri": f"http://example.com/{i}",
                "content_type": "text/plain",
                "payload": t.encode(),
            }
            for i, t in enumerate(texts)
        ],
    )
    docs = (
        spark.read.format("warc")
        .option("record_types", "response")
        .load(str(tmp_path))
        .select(
            "record_id",
            F.decode("payload", "UTF-8").alias("text"),
            F.length(F.decode("payload", "UTF-8")).alias("n_chars"),
        )
    )
    rows = docs.select(
        "record_id",
        token_count("text").alias("toks"),
        quality_score(F.col("text"), F.col("n_chars")).alias("q"),
    ).collect()
    got = {r["record_id"]: r for r in rows}
    assert got["<urn:uuid:d0>"]["toks"] == 9
    assert got["<urn:uuid:d2>"]["toks"] == 1
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0
    # the score re-derives exactly from the decoded text (pin one doc:
    # d1 has 9 tokens, 2 stopwords "and"/"the", 49 chars)
    expect_d1 = (9 / 100) * 0.4 + (1 - 2 / 9) * 0.3 + (49 / 500) * 0.3
    assert abs(got["<urn:uuid:d1>"]["q"] - expect_d1) < 1e-9


def test_stream_writer_relays_warc_to_warc(spark, tmp_path):
    """Full-circle streaming relay: tail a drop directory and re-export
    as consolidated WARC segments via writeStream.format('warc') —
    committed segments per epoch, no .inprogress leftovers, every record
    byte-exact after the round trip."""
    spark.dataSource.register(WarcDataSource)
    src = tmp_path / "in"
    dst = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    write_warc(str(src / "drop-0.warc"), _records("r0", 3))

    q = (
        spark.readStream.format("warc")
        .load(str(src))
        .repartition(1)
        .writeStream.format("warc")
        .option("path", str(dst))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        write_warc(str(src / "drop-1.warc"), _records("r1", 2))
        q.processAllAvailable()
    finally:
        q.stop()
    names = sorted(p.name for p in dst.iterdir())
    assert not [n for n in names if n.endswith(".inprogress")], names
    assert all(n.startswith("batch-") for n in names), names
    back = {
        r["record_id"]: bytes(r["payload"])
        for r in spark.read.format("warc").load(str(dst)).collect()
    }
    assert back == {
        r["record_id"]: r["payload"] for r in _records("r0", 3) + _records("r1", 2)
    }


def test_stream_reader_defers_files_modified_during_the_batch(tmp_path):
    """Non-atomic producer guard: a file whose size/mtime changes while the
    batch parses it is deferred — no rows emitted, name kept OUT of the
    offset — and ingested cleanly on the next trigger once settled.  A
    corrupt file that is NOT changing still fails the batch (real
    corruption must not be silently skipped forever)."""
    import os

    from walmart_e_commerce_sales_data_pipeline_spark.sources.warc import (
        WarcStreamReader,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    write_warc(str(drop / "seg-00.warc"), _records("s0", 2))

    class MidWriteReader(WarcStreamReader):
        """Simulates a producer appending to the file mid-parse."""

        def _rows_for(self, names):
            rows = list(super()._rows_for(names))
            for name in names:
                if name in self.touch:
                    with open(os.path.join(self.dir, name), "ab") as f:
                        f.write(b"\0")
            return iter(rows)

    r = MidWriteReader({"path": str(drop)})
    r.touch = {"seg-00.warc"}
    rows, off = r.read(r.initialOffset())
    assert list(rows) == [] and off == {"files": []}  # deferred, not ingested

    # producer finished: the file settles into its complete, valid form
    r.touch = set()
    write_warc(str(drop / "seg-00.warc"), _records("s0", 2))
    rows, off = r.read({"files": []})
    assert len(list(rows)) == 2
    assert off == {"files": ["seg-00.warc"]}

    # stable-but-corrupt still raises (truncated record, stat unchanged)
    bad = drop / "seg-01.warc"
    data = open(drop / "seg-00.warc", "rb").read()
    bad.write_bytes(data[: len(data) - 20])
    with pytest.raises(ValueError):
        r.read(off)


def test_export_cache_is_content_keyed_and_user_scoped(tmp_path):
    """VERDICT r9 item 2 / ADVICE: the round-trip query's export cache must
    (a) change when the underlying documents table changes — a rewritten
    corpus can never be served stale WARC segments — and (b) live in a
    per-user 0700 base dir so a foreign user's pre-created marker is never
    trusted."""
    import os
    import stat

    from walmart_e_commerce_sales_data_pipeline_spark.queries.corpus import (
        _warc_export_dir,
    )

    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    docs = sf_dir / "documents.parquet"
    docs.write_bytes(b"corpus-v1")
    d1 = _warc_export_dir(str(sf_dir))
    assert d1 == _warc_export_dir(str(sf_dir))  # stable while unchanged

    # same path, new content (size changes) -> new export dir
    docs.write_bytes(b"corpus-v2-longer")
    d2 = _warc_export_dir(str(sf_dir))
    assert d2 != d1

    # same size, newer mtime (regenerated corpus) -> new export dir
    st = os.stat(docs)
    os.utime(docs, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    d3 = _warc_export_dir(str(sf_dir))
    assert d3 != d2

    # user-scoped base dir, mode 0700, owned by us
    base = os.path.dirname(d1)
    assert f"u{os.getuid()}" in os.path.basename(base)
    assert stat.S_IMODE(os.stat(base).st_mode) == 0o700
    assert os.stat(base).st_uid == os.getuid()
