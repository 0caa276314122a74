"""Text/classifier expression library (SURVEY.md §2.8 F13–F19, F23–F24).

All native Column expressions (codegen'd); the reference applies these via
row-at-a-time ``Series.apply``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ACCENTED = "áéíóúüñÁÉÍÓÚÜÑ"
UNACCENTED = "aeiouunAEIOUUN"


def accent_fold(col: Column | str) -> Column:
    """F17 — fold Spanish accents (á→a …), for slugs/filenames
    (app_calculo_necesidad_recepción_call_center.py:1125)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ACCENTED, UNACCENTED)


def normalize_text(col: Column | str) -> Column:
    """F16 — upper + trim + strip accents + collapse internal whitespace
    (indicador-modelo-vs-facturacion.py:131-138)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(F.regexp_replace(accent_fold(c), r"\s+", " ")))


def classify_ubicacion(col: Column | str) -> Column:
    """F15 — startswith 'consulta' → 'Consulta' else 'Procedimiento'
    (app_confirmaciones.py:32-39)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.lower(F.trim(c)).startswith("consulta"), F.lit("Consulta")
    ).otherwise(F.lit("Procedimiento"))


def classify_llamado(col: Column | str) -> Column:
    """F14 — lower/strip then contains 'manual'→MANUAL, 'auto'→AUTOMÁTICO,
    non-null→OTRO, null→NO CLASIFICADO
    (app_indicadores_modelo_atencion.py:942-950)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(F.trim(c))
    return (
        F.when(c.isNull(), F.lit("NO CLASIFICADO"))
        .when(low.contains("manual"), F.lit("MANUAL"))
        .when(low.contains("auto"), F.lit("AUTOMÁTICO"))
        .otherwise(F.lit("OTRO"))
    )


def phone_normalize(
    movil: Column | str,
    fijo: Column | str,
    default: str = "SIN TELÉFONO",
) -> Column:
    """F18 — the reference's phone-normalization ruleset
    (app_confirmaciones.py:203-224):

    - strip a trailing '.0' (Excel float residue) and whitespace;
    - empty móvil → '+57'+fijo unless fijo is empty or starts with '60';
    - móvil starting with '3' (mobile prefix, not '60' landline) → '+57'+móvil;
    - otherwise the sentinel default (the reference never passes a raw
      non-matching móvil through — it keeps its 'sin número…' initializer).

    The reference strips the trailing '.0' on the *output* column after the
    '+57' concat; stripping the inputs first is equivalent (the suffix never
    affects the emptiness/startswith tests) and keeps one expression.
    """
    mv = F.col(movil) if isinstance(movil, str) else movil
    fj = F.col(fijo) if isinstance(fijo, str) else fijo
    clean = lambda c: F.regexp_replace(F.trim(c.cast("string")), r"\.0$", "")  # noqa: E731
    m, f_ = clean(mv), clean(fj)
    m_empty = m.isNull() | (m == "") | (m == "nan")
    f_empty = f_.isNull() | (f_ == "") | (f_ == "nan")
    return (
        F.when(
            m_empty & ~f_empty & ~f_.startswith("60"),
            F.concat(F.lit("+57"), f_),
        )
        .when(
            ~m_empty & m.startswith("3") & ~m.startswith("60"),
            F.concat(F.lit("+57"), m),
        )
        .otherwise(F.lit(default))
    )


def composite_message_key(cols: Sequence[Column | str], sep: str = "|") -> Column:
    """F19 — concat_ws composite key, null-safe
    (app_confirmaciones.py:198-201)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *[F.coalesce(c.cast("string"), F.lit("")) for c in cs])


def contains_any(col: Column | str, keys: Sequence[str], case_insensitive: bool = True) -> Column:
    """P5 — OR-of-contains over a key list.

    The reference passes ``'|'.join(keys)`` with ``regex=False`` — a latent
    bug that tests a single literal (indicador-modelo-vs-facturacion.py:180).
    Deliberate divergence: this is a true per-key OR.
    """
    c = F.col(col) if isinstance(col, str) else col
    if case_insensitive:
        c = F.upper(c)
        keys = [k.upper() for k in keys]
    out = F.lit(False)
    for k in keys:
        out = out | c.contains(k)
    return out


def classify_by_code_lists(
    col: Column | str, code_lists: dict[str, Sequence[str]]
) -> Column:
    """F13 — substring membership against company extension-code lists →
    company name or null (app_calculo_necesidad_recepción_call_center.py:27-48,
    84-97). ``when`` chain; at large code-list scale prefer a broadcast join
    against an exploded code dim."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    expr = F.lit(None).cast("string")
    for company, codes in reversed(list(code_lists.items())):
        cond = F.lit(False)
        for code in codes:
            cond = cond | (s == code)
        expr = F.when(cond, F.lit(company)).otherwise(expr)
    return expr


def numeric_or_default(col: Column | str, default: float = 1.0) -> Column:
    """F24 — ``pd.to_numeric(errors='coerce').fillna(default)``
    (app_indicadores_modelo_atencion.py:756)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(float(default)))


def mask_digit_runs(
    col: Column | str,
    min_masked_digits: int = 4,
    keep_last: int = 2,
    token: str = "[ID]",
) -> Column:
    """PII-style identifier masking: replace every digit run of at least
    ``min_masked_digits + keep_last`` digits with ``token`` followed by
    the run's last ``keep_last`` digits ("Customer#000000042" →
    "Customer#[ID]42") — the redact-but-keep-join-suffix pattern of
    training-data scrubbing. ``min_masked_digits`` is the minimum number
    of digits actually hidden (a 5-digit run is untouched at the
    defaults: only 3 would be masked). Pure per-row regexp expression
    (scan speed, pushdown-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"[0-9]{%d,}([0-9]{%d})" % (min_masked_digits, keep_last)
    return F.regexp_replace(c, pat, token + "$1")


def count_digit_runs(
    col: Column | str, min_masked_digits: int = 4, keep_last: int = 2
) -> Column:
    """Companion to :func:`mask_digit_runs`: how many runs were masked."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"[0-9]{%d,}[0-9]{%d}" % (min_masked_digits, keep_last)
    return F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
