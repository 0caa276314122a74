"""Source/sink coverage (SURVEY.md §2.1): CSV round-trip with explicit
schema (S5/S7), parquet reader, Excel gating.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_procesos_odo_spark.sources.readers import read_csv, read_parquet

from .conftest import SF_DIR


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "ñ,with comma", None)],
        "id long, name string, val double",
    )
    out = str(tmp_path / "csv_out")
    df.write.mode("overwrite").option("header", "true").csv(out)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    back = read_csv(spark, out, schema=schema)
    assert sorted(r["id"] for r in back.collect()) == [1, 2]
    row = back.filter(F.col("id") == 2).collect()[0]
    assert row["name"] == "ñ,with comma" and row["val"] is None

    inferred = read_csv(spark, out)  # inference path (S5)
    assert set(inferred.columns) == {"id", "name", "val"}


def test_parquet_reader_prunes(spark):
    df = read_parquet(spark, f"{SF_DIR}/lineitem.parquet").select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_extendedprice" not in plan  # column pruning reached the scan
    assert df.count() > 0


def test_excel_gated():
    from etl_procesos_odo_spark.sources.readers import read_excel

    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; gating not exercised")
    except ImportError:
        with pytest.raises(NotImplementedError):
            read_excel("/nonexistent.xlsx", None)


def test_excel_roundtrip_when_libs_present(spark, tmp_path):
    """S1-S3/S6 live evidence when the environment ever gains Excel libs
    (round-start probe, VERDICT r2 item 6): write a workbook with two
    sheets + a header-offset sheet, read it back through read_excel, and
    check values and the multi-sheet dict shape. Skips — with the probe
    result in the reason — while openpyxl is absent."""
    pytest.importorskip(
        "openpyxl", reason="openpyxl absent this round; Excel path stays gated"
    )
    import pandas as pd

    from etl_procesos_odo_spark.sources.readers import read_excel

    xls = str(tmp_path / "book.xlsx")
    with pd.ExcelWriter(xls) as w:  # engine resolved by pandas
        pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_excel(
            w, sheet_name="uno", index=False
        )
        pd.DataFrame({"c": [3.5]}).to_excel(w, sheet_name="dos", index=False)

    one = read_excel(xls, spark, sheet_name="uno")
    assert sorted(r["a"] for r in one.collect()) == [1, 2]
    both = read_excel(xls, spark, sheet_name=None)
    assert set(both) == {"uno", "dos"}
    assert both["dos"].collect()[0]["c"] == 3.5


def test_jsonl_round_trip_and_corrupt_quarantine(spark, tmp_path):
    """JSONL read/write: schema-first read, PERMISSIVE corrupt-line
    quarantine (bad line captured whole, good rows parsed), round-trip
    through the gzip sink."""
    from etl_procesos_odo_spark.sources.readers import read_jsonl, write_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "hola mundo", "lang": "es"}\n'
        'THIS IS NOT JSON\n'
        '{"doc_id": 3, "text": "bonjour", "lang": "fr"}\n'
    )
    df = read_jsonl(
        spark, str(p), schema="doc_id long, text string, lang string"
    )
    # Spark disallows lazily querying ONLY the corrupt column
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    # documented pattern is to materialize/cache first
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 3
    assert sorted(r["doc_id"] for r in good) == [1, 2, 3]
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]

    out = tmp_path / "out"
    good_df = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in good],
        "doc_id long, text string, lang string",
    )
    write_jsonl(good_df, str(out))
    back = read_jsonl(
        spark, str(out), schema="doc_id long, text string, lang string"
    )
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == [
        (1, "hello world"), (2, "hola mundo"), (3, "bonjour"),
    ]


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC source/sink: round-trip the events sample and confirm
    predicate pushdown reaches the ORC scan like parquet."""
    from etl_procesos_odo_spark.sources.readers import read_orc, write_orc
    from etl_procesos_odo_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = tmp_path / "events_orc"
    write_orc(ev, str(out))
    back = read_orc(spark, str(out))
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    filtered = back.filter(back["value"] > 50.0)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "value" in plan, plan
    want = ev.filter(ev["value"] > 50.0).count()
    assert filtered.count() == want
