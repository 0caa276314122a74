"""Property tests for the layer-1 expression library (SURVEY.md §5.3):
Excel-serial round trips incl. the ≥61 Lotus correction, 5-min ceiling
invariants, phone rules, Spanish date round-trip, duration parsing,
weekday-in-month closed form vs the calendar.
"""

from __future__ import annotations

import calendar
import datetime

from pyspark.sql import functions as F

from etl_procesos_odo_spark.functions.datetime_fns import (
    ceil_to_grid,
    excel_serial_to_date,
    hhmmss_to_minutes,
    parse_spanish_long_date,
    same_weekday_days_in_month,
    spanish_long_date,
    weekday_monday0,
)
from etl_procesos_odo_spark.functions.text_fns import (
    normalize_text,
    phone_normalize,
)
from etl_procesos_odo_spark.sources.readers import find_column, select_existing


def _col_vals(spark, rows, schema, expr):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr.alias("out")).collect()]


def test_excel_serial_reference_semantics(spark):
    """Reference formula (indicador-modelo-vs-facturacion.py:92-109):
    numero >= 61 -> numero - 1, then 1899-12-30 + days."""
    serials = [1.0, 59.0, 60.0, 61.0, 100.0, 40000.0, 45000.5]
    expected = []
    for n in serials:
        adj = n - 1 if n >= 61 else n
        expected.append(
            (datetime.datetime(1899, 12, 30) + datetime.timedelta(days=adj)).date()
        )
    got = _col_vals(
        spark,
        [(s,) for s in serials],
        "serial double",
        excel_serial_to_date(F.col("serial"), lotus_correction=True),
    )
    assert got == expected

    # standard epoch variant: plain 1899-12-30 + floor(serial)
    got_std = _col_vals(
        spark,
        [(s,) for s in serials],
        "serial double",
        excel_serial_to_date(F.col("serial")),
    )
    assert got_std == [
        (datetime.datetime(1899, 12, 30) + datetime.timedelta(days=int(s))).date()
        for s in serials
    ]


def test_ceil_to_grid_invariants(spark):
    """Result is on the grid, >= input, and < input + step; exact
    boundaries are fixed points (app_calculador:105-122 semantics)."""
    ts = [
        datetime.datetime(2024, 1, 1, 10, 0, 0),
        datetime.datetime(2024, 1, 1, 10, 0, 1),
        datetime.datetime(2024, 1, 1, 10, 4, 59),
        datetime.datetime(2024, 1, 1, 10, 5, 0),
        datetime.datetime(2024, 1, 1, 23, 57, 30),
    ]
    got = _col_vals(spark, [(t,) for t in ts], "ts timestamp", ceil_to_grid("ts", 5))
    for orig, res in zip(ts, got):
        assert res.minute % 5 == 0 and res.second == 0
        assert res >= orig
        assert (res - orig).total_seconds() < 300
    assert got[0] == ts[0]  # boundary fixed point
    assert got[3] == ts[3]


def test_phone_normalize_rules(spark):
    """Ruleset of app_confirmaciones.py:203-224."""
    rows = [
        ("3001234567", "6015550000"),   # movil mobile -> +57
        ("", "3005550000"),             # empty movil -> '+57'+fijo (not '60')
        ("", "6015550000"),             # empty movil, fijo landline -> default
        ("  3001234567.0  ", ""),       # trim + strip .0 -> +57
        ("6012345678", ""),             # movil landline-style -> sentinel kept
        ("9991234567", ""),             # movil not starting '3' -> sentinel kept
        (None, None),                   # nothing -> default
    ]
    got = _col_vals(
        spark,
        rows,
        "movil string, fijo string",
        phone_normalize("movil", "fijo"),
    )
    assert got == [
        "+573001234567",
        "+573005550000",
        "SIN TELÉFONO",
        "+573001234567",
        "SIN TELÉFONO",
        "SIN TELÉFONO",
        "SIN TELÉFONO",
    ]


def test_ampm_to_decimal_hours_reference_branches(spark):
    """hora_a_decimal (app_confirmaciones.py:226-257) branch-for-branch:
    numeric passthrough, 24h colon strings, the hour-12->0 quirk, AM/PM
    shifts, sentinel failures."""
    from etl_procesos_odo_spark.functions.datetime_fns import ampm_to_decimal_hours

    rows = [
        ("1:30 PM",),    # 13.5
        ("12:15 AM",),   # 0.25
        ("12:15 PM",),   # 12.25
        ("14:30",),      # 24h, no suffix -> 14.5 (reference parses it)
        ("12:30",),      # reference quirk: no PM & hour==12 -> 0 -> 0.5
        ("7.25",),       # float passthrough
        ("15",),         # int passthrough via float()
        ("3 PM",),       # no colon, suffix -> int('3') -> 15.0
        ("",),           # sentinel
        ("nan",),        # sentinel
        (None,),         # sentinel
        ("abc",),        # sentinel
    ]
    got = _col_vals(spark, rows, "h string", ampm_to_decimal_hours("h"))
    assert got == [
        13.5, 0.25, 12.25, 14.5, 0.5, 7.25, 15.0, 15.0,
        999999.0, 999999.0, 999999.0, 999999.0,
    ]


def test_parse_wallclock_serial_threshold(spark):
    """convertir_a_hora (app_calculador_recursos_modelo_atencion.py:31-95):
    numeric > 40000 is an Excel serial; the (1, 40000] gap and negatives
    are null; [0, 1] is a day fraction."""
    from etl_procesos_odo_spark.functions.datetime_fns import (
        parse_wallclock_flexible,
    )

    rows = [("40001",), ("45000",), ("120",), ("40000",), ("-5",), ("0.5",)]
    got = _col_vals(spark, rows, "v string", parse_wallclock_flexible("v"))
    assert got[0] == datetime.datetime(1899, 12, 30) + datetime.timedelta(days=40001)
    assert got[1] == datetime.datetime(1899, 12, 30) + datetime.timedelta(days=45000)
    assert got[2] is None
    assert got[3] is None
    assert got[4] is None
    assert got[5] == datetime.datetime(1970, 1, 1, 12, 0, 0)


def test_with_total_row_null_group_distinct_from_total(spark):
    """A natural NULL group must stay separate from the grand-TOTAL row
    (GROUPING-based labeling, not NULL-coalescing)."""
    from etl_procesos_odo_spark.operators.aggregates import with_total_row

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 10), (None, 20)], "k string, v int"
    )
    out = {
        r["k"]: (r["n"], r["s"])
        for r in with_total_row(
            df, "k", {"n": F.count("*"), "s": F.sum("v")}
        ).collect()
    }
    assert out["a"] == (2, 3)
    assert out[None] == (2, 30)      # natural NULL group survives
    assert out["TOTAL"] == (4, 33)   # grand total labeled via GROUPING()


def test_spanish_date_roundtrip(spark):
    dates = [datetime.date(2025, 3, 3), datetime.date(1999, 12, 31),
             datetime.date(2024, 2, 29)]
    df = spark.createDataFrame([(d,) for d in dates], "fecha date")
    out = df.select(
        spanish_long_date(F.col("fecha")).alias("lbl"),
        parse_spanish_long_date(spanish_long_date(F.col("fecha"))).alias("rt"),
    ).collect()
    assert out[0]["lbl"] == "Lunes, 3 de Marzo de 2025"
    assert [r["rt"] for r in out] == dates


def test_hhmmss_to_minutes(spark):
    rows = [("01:30:00",), ("00:05",), ("10:00:30",), ("bad",)]
    got = _col_vals(spark, rows, "d string", hhmmss_to_minutes("d"))
    assert got[0] == 90.0
    assert got[1] == 5.0
    assert got[2] == 600.5
    assert got[3] is None


def test_same_weekday_days_in_month_matches_calendar(spark):
    dates = [
        datetime.date(2024, 2, 29),
        datetime.date(2025, 3, 1),
        datetime.date(2025, 3, 31),
        datetime.date(2023, 12, 15),
    ]
    expected = []
    for d in dates:
        n_days = calendar.monthrange(d.year, d.month)[1]
        expected.append(
            sum(
                1
                for day in range(1, n_days + 1)
                if datetime.date(d.year, d.month, day).weekday() == d.weekday()
            )
        )
    got = _col_vals(
        spark, [(d,) for d in dates], "d date", same_weekday_days_in_month("d")
    )
    assert got == expected


def test_weekday_monday0(spark):
    # 2024-01-01 was a Monday
    dates = [datetime.date(2024, 1, 1 + i) for i in range(7)]
    got = _col_vals(spark, [(d,) for d in dates], "d date", weekday_monday0("d"))
    assert got == list(range(7))


def test_normalize_text(spark):
    rows = [("  Unidad   Funcional ÁÉÍ  ",), ("ñoño",)]
    got = _col_vals(spark, rows, "t string", normalize_text("t"))
    assert got == ["UNIDAD FUNCIONAL AEI", "NONO"]


def test_fuzzy_column_resolver(spark):
    df = spark.createDataFrame(
        [(1, "x", "y", "z")],
        ["ID", "Fecha de Ingreso", "Nombre Paciente", "nombre usuario facturó"],
    )
    assert find_column(df, "fecha", "ingreso") == "Fecha de Ingreso"
    assert find_column(df, "nombre", last=True) == "nombre usuario facturó"
    assert find_column(df, "nombre", exclude=["usuario"]) == "Nombre Paciente"
    assert find_column(df, "inexistente") is None
    assert select_existing(df, ["id", "FECHA DE INGRESO", "missing"]).columns == [
        "ID",
        "Fecha de Ingreso",
    ]
