"""CSV reader edge-case matrix: quoting, escapes, multiline fields, and the
three malformed-record modes (PERMISSIVE / DROPMALFORMED / FAILFAST)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def messy_csv(tmp_path):
    p = tmp_path / "messy.csv"
    p.write_text(
        'id,name,comment\n'
        '1,"plain","ok"\n'
        '2,"has,comma","with ""escaped quotes"""\n'
        '3,"multi\nline","field"\n'
        'not-a-number,"bad id","row"\n'
    )
    return str(p)


SCHEMA = "id int, name string, comment string"


def test_quotes_escapes_multiline(spark, messy_csv):
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .schema(SCHEMA)
        .csv(messy_csv)
    )
    rows = {r["id"]: r for r in df.collect() if r["id"] is not None}
    assert rows[2]["name"] == "has,comma"
    assert rows[2]["comment"] == 'with "escaped quotes"'
    assert rows[3]["name"] == "multi\nline"


def test_permissive_mode_nulls_bad_fields(spark, messy_csv):
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .schema(SCHEMA)
        .csv(messy_csv)
    )
    bad = [r for r in df.collect() if r["id"] is None]
    assert len(bad) == 1  # unparseable id -> null, row kept
    assert bad[0]["name"] == "bad id"


def test_dropmalformed_drops_structurally_bad_rows(spark, tmp_path):
    # NB: in Spark 4 a failed *type cast* is not "malformed" (the field is
    # nulled even under DROPMALFORMED); only structural damage (wrong
    # token count) drops the row.
    p = tmp_path / "structural.csv"
    p.write_text("id,name,comment\n1,a,b\n2,only-two\n3,c,d\n")
    df = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema(SCHEMA)
        .csv(str(p))
    )
    assert [r["id"] for r in df.collect()] == [1, 3]


def test_failfast_raises(spark, messy_csv):
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("mode", "FAILFAST")
        .schema(SCHEMA)
        .csv(messy_csv)
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()


def test_corrupt_record_column_capture(spark, messy_csv):
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .schema(SCHEMA + ", _corrupt_record string")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(messy_csv)
    )
    # Spark disallows queries touching only the corrupt-record column on
    # raw CSV — collect full rows and inspect driver-side instead.
    corrupt = [r for r in df.collect() if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1
    assert "not-a-number" in corrupt[0]["_corrupt_record"]