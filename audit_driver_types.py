#!/usr/bin/env python
"""Driver-canonicalizer hazard audit: emulate the external driver's pandas
materialization path (Spark ``toPandas()`` vs DuckDB ``.df()``) and flag
anything its canonicalizer would mis-hash even when values are identical.

Round-2 postmortem (VERDICT r2): the driver canonicalizes through pandas,
unlike verify_all.py's python-value ``canon()`` — so two bugs stayed
invisible locally:

- DuckDB ``SUM(BIGINT) OVER (...)`` returns HUGEINT, which ``.df()`` turns
  into float64 (``151.0``) while Spark returns int64 (``151``) — canonical
  strings differ, hash mismatch (q60 r2).
- Array-typed output columns crash pandas' sort
  (``TypeError: unhashable type: 'list'``) (q80 r2; q62 latent).

Per query this audit reports:

- ``complex``: Spark output columns that are Array/Map/Struct typed
  (the fast schema-only check also lives in tests/test_plans.py).
- ``kind_mismatch``: columns whose pandas dtype *kind* differs between the
  Spark and oracle frames (int-vs-float is exactly the HUGEINT trap).
- ``unhashable``: columns on either side whose cells are list/ndarray/dict.

Usage: python audit_driver_types.py [--sf /root/testdata/sf0.001] [--names q60,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cell_unhashable(series) -> bool:
    for v in series.head(5):
        if isinstance(v, (list, dict, set, bytearray)):
            return True
        if type(v).__name__ == "ndarray":
            return True
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--names", default=None, help="CSV subset of query names")
    ap.add_argument("--tier", choices=("full", "core"), default="full",
                    help="'core' skips registry.CONTAINED (same two-tier "
                         "convention as verify_all.py)")
    args = ap.parse_args()

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from etl_procesos_odo_spark.registry import registry
    from etl_procesos_odo_spark.session import TABLES, get_spark

    spark = get_spark("audit-driver-types")
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    only = set(args.names.split(",")) if args.names else None
    skip: set = set()
    if args.tier == "core":
        from etl_procesos_odo_spark.registry import CONTAINED

        skip = set(CONTAINED)
        if only:
            # mirror verify_all.py: --names overrides the tier filter, so
            # refuse the ambiguous combination instead of silently running
            # contained queries under a flag that claims to skip them
            demoted = only & skip
            if demoted:
                ap.error(
                    f"excluded by --tier core (registry.CONTAINED): "
                    f"{sorted(demoted)} — drop --tier (full is the "
                    "default) to audit contained queries"
                )
    findings: dict = {}
    for q in registry():
        if only and q.name not in only:
            continue
        if q.name in skip and not only:
            continue
        entry: dict = {}
        try:
            df = q.spark_fn(spark, args.sf)
            complex_cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                entry["complex"] = complex_cols
            if q.oracle is None:
                entry["rows_only"] = True
                findings[q.name] = entry
                continue
            spd = df.toPandas()
            opd = con.sql(q.oracle).df()
            mism = []
            for c in sorted(set(spd.columns) & set(opd.columns)):
                sk, ok = spd[c].dtype.kind, opd[c].dtype.kind
                if sk == ok:
                    continue
                # Benign class, driver-proven in round 2 (q06/q14/q16/q21/
                # q26 all passed): Spark DateType materializes as object
                # (datetime.date) while DuckDB DATE becomes datetime64 —
                # the driver's canonicalizer handles it. Checked over the
                # FULL column and only when at least one non-null value
                # exists: head(5)-only was vacuously true on empty frames
                # and blind to later non-date cells.
                nonnull = [v for v in spd[c] if v is not None]
                if sk == "O" and ok == "M" and nonnull and all(
                    type(v).__name__ == "date" for v in nonnull
                ):
                    continue
                mism.append(f"{c}: spark {spd[c].dtype} vs oracle {opd[c].dtype}")
            if mism:
                entry["kind_mismatch"] = mism
            unh = [
                f"{side}:{c}"
                for side, frame in (("spark", spd), ("oracle", opd))
                for c in frame.columns
                if _cell_unhashable(frame[c])
            ]
            if unh:
                entry["unhashable"] = unh
        except Exception as e:
            entry["error"] = f"{type(e).__name__}: {e}"[:300]
        findings[q.name] = entry

    flagged = {k: v for k, v in findings.items() if v and not v.get("rows_only")}
    print(json.dumps(flagged, indent=1, sort_keys=True))
    print(f"\n{len(flagged)} flagged / {len(findings)} audited", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
