"""Text-analysis operators for training-data pipelines: tokenization,
token counting, quality scoring, language-ID, document fingerprinting.

All native Column expressions (JVM-side, codegen'd) — no Python in the hot
path, so these run at full scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic
# language id. Deliberately small: language id at scale is a scan-speed
# heuristic, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "es": ["el", "la", "de", "que", "los", "con"],
    "de": ["der", "die", "und", "das", "nicht", "mit"],
    "fr": ["le", "la", "les", "des", "est", "avec"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

# BPE-ish word-piece pattern: letter runs, digit runs, single punctuation.
TOKEN_PIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# PII scrubbing (corpus hygiene before training, the Dolma/FineWeb-style
# pass): ordered (name, pattern, replacement) rules. Order is semantic —
# each rule's match count is taken AFTER the previous rules were
# redacted, so counts always equal the number of replacements even when
# a later pattern could sub-match inside an earlier span (a phone regex
# grazing an email's digit run). Patterns stay inside the
# java.util.regex ∩ RE2 common subset (ASCII classes, no lookaround, no
# backrefs) so Spark and DuckDB match byte-identical spans.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>); empty-string safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish word-piece count via regexp_extract_all (letter runs, digit
    runs, single punct) — an upper-bound proxy for tokenizer cost."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PIECE_RE), 0)).cast("long")


def redact_pii(col: Column | str) -> dict[str, Column]:
    """PII scrub for corpus hygiene: apply :data:`PII_RULES` in order,
    returning per-rule match counts (``n_email``, ``n_ip``, ``n_phone``)
    and the fully-redacted text (``text_clean``). Mirrors the reference's
    normalization passes (telefono/correo cleanup,
    app_confirmaciones_*.py) generalized to corpus-scale scrubbing.

    Pure ``regexp_extract_all``/``regexp_replace`` scan expressions —
    JVM-side, codegen'd, zero shuffles; at 100 TB this runs at parquet
    scan speed and composes with any downstream dedup/quality pass.
    Counts are taken on the progressively-redacted text (see PII_RULES)
    so ``n_<rule>`` equals the replacement count exactly."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    for name, pat, token in PII_RULES:
        out[f"n_{name}"] = F.size(
            F.regexp_extract_all(c, F.lit(pat), 0)
        ).cast("long")
        c = F.regexp_replace(c, pat, token)
    out["text_clean"] = c
    return out


def repetition_metrics(
    col: Column | str, tokenized: bool = False
) -> dict[str, Column]:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    appendix A1.1): the fraction of duplicate words / 2-grams / 3-grams in
    a document. High values mark boilerplate, keyword spam, and
    degenerate generations for corpus filtering. Pure per-row array
    expressions — scan speed, no shuffle, composable with the
    quality_metrics family.

    ``tokenized=True`` means ``col`` is already an ``array<string>`` of
    tokens: the three metric families each reference the token array
    several times, and Catalyst's project collapsing re-inlines an
    aliased tokenization into every reference — materialize the array
    once (projection + exchange barrier, as q73 does) and pass it in."""
    c = F.col(col) if isinstance(col, str) else col
    w = c if tokenized else tokens(c)

    def raw_grams(k: int) -> Column:
        if k == 1:
            return w
        # zip_with over k shifted slices builds every k-gram in one
        # array pass; the transform(sequence, slice) form's per-index
        # lookups fall out of codegen (measured 3.6x on q73's three
        # metric columns at sf0.1 — same finding as q124's pair builder)
        n = F.greatest(F.size(w) - (k - 1), F.lit(0))
        g = F.slice(w, 1, n)
        for i in range(1, k):
            g = F.zip_with(
                g, F.slice(w, i + 1, n), lambda a, b: F.concat_ws(" ", a, b)
            )
        return g

    def dup_frac(k: int) -> Column:
        g = raw_grams(k)
        # three-way: repetitive fraction for non-empty docs, 0.0 for
        # EMPTY docs, NULL for NULL docs (size(NULL)=NULL falls through
        # both branches). A NULL document has no repetition signal and
        # must not pass a `dup_frac < x` quality gate as "not
        # repetitive" (r10 adversarial pin; oracle CASE yields the same).
        return F.when(
            F.size(g) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(g)).cast("double") / F.size(g),
        ).when(F.size(g) == 0, F.lit(0.0))

    return {
        "dup_word_frac": dup_frac(1),
        "dup_2gram_frac": dup_frac(2),
        "dup_3gram_frac": dup_frac(3),
    }


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Quality-scoring column family: length, token count, mean token
    length, punctuation ratio, stopword ratio. Ratios are single divisions
    over exact integer counts (deterministic doubles)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c).cast("long")
    n_toks = F.size(toks).cast("long")
    n_punct = F.size(
        F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0)
    ).cast("long")
    en_stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(en_stop, F.lower(t)))
    ).cast("long")
    sum_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        # try_divide: empty/whitespace-only documents have zero tokens /
        # zero chars; ANSI division would abort the scan, and DuckDB's
        # x/0 is NULL — try_divide matches that exactly (r10 adversarial
        # census pin)
        "avg_token_len": F.try_divide(sum_tok_len.cast("double"), n_toks),
        "punct_ratio": F.try_divide(n_punct.cast("double"), n_chars),
        "stopword_ratio": F.try_divide(n_stop.cast("double"), n_toks),
    }


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit scores (distinct-token intersection size)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.transform(tokens(c), F.lower))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[f"score_{lang}"] = F.size(F.array_intersect(toks, arr)).cast("long")
    return out


def lang_predict(scores: dict[str, Column]) -> Column:
    """Argmax with fixed priority order (en, es, de, fr, zh) on ties —
    greatest() + first-match CASE, identical semantics to the SQL oracle."""
    cols = [scores[f"score_{lang}"] for lang in LANG_MARKERS]
    m = F.greatest(*cols)
    expr = F.lit(None).cast("string")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(scores[f"score_{lang}"] == m, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str, mod: int = 2**31) -> Column:
    """Rolling polynomial hash over tokens (document fingerprint):
    ``acc = (acc*31 + h(token) % mod) % mod`` — a left fold, matching
    DuckDB ``list_reduce`` element order exactly. Token hash = first 15 hex
    chars of md5 as a 60-bit int (identical in both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast(  # noqa: E731
        "long"
    ) % F.lit(mod)
    return F.aggregate(
        tokens(c),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + tok_hash(t)) % F.lit(mod),
    )


def bm25_topk(
    df,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
):
    """BM25 keyword retrieval over the corpus for a fixed query-term set —
    the lexical-search complement to the embedding ANN path (the other
    half of a hybrid retrieval stack).

    Uses the RATIONAL idf variant ``(N - df + 0.5) / (df + 0.5)`` instead
    of the textbook ``ln(...)`` of it: every score is then built from
    exact integer counts by IEEE-exact ``+ * /`` only (natural log is not
    correctly-rounded-guaranteed across engines, which would break
    bit-level oracle parity). Rank order per term is unchanged (ln is
    monotone); only the inter-term mixing weights differ — documented
    divergence, deterministic everywhere.

    Scale shape: NO explode and NO per-doc shuffle — each term's tf is a
    per-row ``size(filter(tokens, = term))`` array expression, so the tf
    pass runs at scan speed (for a handful of query terms, re-scanning
    the token array per term is far cheaper than exploding the corpus
    into one row per token). Corpus stats (N, Σdl, per-term df) are ONE
    fused 1-row tree-aggregate broadcast onto the scoring frame. The
    tokenizer materializes once behind a spread-repartition barrier
    (q73's rationale: collapsed projections re-inline the tokenizer into
    every tf/dl reference). The final top-k is orderBy+limit — Spark
    plans TakeOrderedAndProject: per-partition heap top-k merged on one
    reducer, never a global sort.

    Returns (doc_id, <tf_term...>, dl, score) for the top-k docs, score
    ties broken by lowest doc id.
    """
    from pyspark.sql import functions as F

    if not terms:
        raise ValueError("terms must be non-empty")

    sc = df.sparkSession.sparkContext
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("w")
    ).repartition(sc.defaultParallelism, F.col("doc_id"))
    def _tf(term: str):
        # NB: a 2-param lambda (even `t=t` defaulted) would be read by
        # F.filter as (element, index) — build the predicate via closure
        return F.size(F.filter("w", lambda x: x == F.lit(term))).cast("long")

    feat = toks.select(
        "doc_id",
        *[_tf(t).alias(f"tf_{t}") for t in terms],
        F.size("w").cast("long").alias("dl"),
    )
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
    )
    any_hit = None
    for t in terms:
        cond = F.col(f"tf_{t}") > 0
        any_hit = cond if any_hit is None else (any_hit | cond)
    scored = feat.filter(any_hit).crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    den_norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    score = F.lit(0.0)
    for t in terms:  # fixed summation order — bit-identical to the oracle
        idf = (
            F.col("n_docs").cast("double")
            - F.col(f"df_{t}").cast("double")
            + F.lit(0.5)
        ) / (F.col(f"df_{t}").cast("double") + F.lit(0.5))
        tf_d = F.col(f"tf_{t}").cast("double")
        part = idf * ((tf_d * F.lit(k1 + 1.0)) / (tf_d + F.lit(k1) * den_norm))
        score = score + part
    return (
        scored.select(
            "doc_id", *[f"tf_{t}" for t in terms], "dl",
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.col("doc_id"))
        .limit(topk)
    )


def corpus_quantiles(
    docs,
    exact: bool = True,
    accuracy: int = 10000,
):
    """q88's engine surface with the 100 TB knob as a code path: per-
    language length-distribution stats. ``exact=True`` uses
    ``percentile`` (linear interpolation — matches DuckDB
    ``quantile_cont`` bit-exactly; buffers each group's values, the
    oracle-parity mode). ``exact=False`` swaps in
    ``percentile_approx`` — a mergeable sketch whose partial
    aggregates combine map-side, bounded memory per group at any
    cardinality; rank error ≤ 1/``accuracy``. Nulls/min-max/count
    behavior identical in both modes.
    """
    from pyspark.sql import functions as F

    def q(col, p, alias):
        if exact:
            return F.percentile(F.col(col), F.lit(p)).alias(alias)
        return F.percentile_approx(
            F.col(col), F.lit(p), F.lit(accuracy)
        ).cast("double").alias(alias)

    t = docs.select(
        "lang",
        F.col("n_chars").cast("double").alias("nc"),
        token_count_ws(F.col("text")).cast("double").alias("nt"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        q("nc", 0.5, "chars_p50"),
        q("nc", 0.9, "chars_p90"),
        q("nc", 0.99, "chars_p99"),
        q("nt", 0.5, "tokens_p50"),
        q("nt", 0.9, "tokens_p90"),
    )
