"""Join operator kit — SURVEY.md §2.3 (J1–J7).

Every join in the reference has a bounded small side (13-row dims, hour/date
spines, per-sede configs), so the engine's default is an explicit
``broadcast()`` of the dim — the fact side never shuffles. Big-big joins
(not present in the reference but needed at scale) fall through to Spark's
sort-merge with AQE skew handling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """J1/J2 — lookup join against a bounded dimension
    (Sede→Dirección 13 rows, app_confirmaciones.py:150-177; usuario→rol
    dict-map, app_calculador_recursos_modelo_atencion.py:196-201)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def spine_left_join_fill(
    spine: DataFrame,
    agg: DataFrame,
    on: Sequence[str] | str,
    fill: dict | float = 0,
) -> DataFrame:
    """J4 — generated spine LEFT JOIN sparse aggregate, gaps filled
    (app_calculo_necesidad_recepción_call_center.py:436-463;
    app_indicadores_modelo_atencion.py:963-976).

    The aggregate side is post-groupBy (small); the spine is tiny. Either
    way this stays a broadcast join.
    """
    joined = spine.join(agg, on=on, how="left")
    if isinstance(fill, dict):
        return joined.na.fill(fill)
    return joined.na.fill(fill)


def union_all_by_name(frames: Sequence[DataFrame]) -> DataFrame:
    """J7/X1 — union of per-source tables with schema alignment
    (pd.concat of EVENTO+PGP+PDTE*, indicador-modelo-vs-facturacion.py:459-481)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
