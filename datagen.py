#!/usr/bin/env python
"""Full star-schema synthetic data generator (round 10).

Two kinds of evidence the driver's fixtures (/root/testdata, read-only,
sf <= 0.1) cannot provide:

1. ``--sf N``: a FULL star schema + events/documents/embeddings at scale
   factors ABOVE sf0.1 — same arrow schemas, key ranges, value domains
   and marginal distributions as the driver fixtures (profiled from
   /root/testdata; see the per-table comments), so ``verify_all.py --sf
   .scaledata/star_sf1`` can run the Spark-vs-DuckDB oracle census at
   sf1 (~6M lineitem, 1M events). Oracle parity is data-independent —
   both engines read the SAME parquet — so builder-generated data is as
   probative as driver data; what sf1 adds is evidence that per-query
   plans hold an order of magnitude past the committed censuses.

2. ``--adversarial``: an sf0.001-scale HOSTILE variant — NULLs, empty
   and whitespace-only strings, accented unicode, duplicate primary
   keys, planted duplicate rows, zero-norm embeddings, malformed JSON
   props, zero/negative amounts, and boundary timestamps (unix epoch,
   int32-seconds rollover, leap day) injected into every fact table.
   The same census on this directory (``verify_all.py --sf
   .scaledata/adversarial``) catches the class of oracle divergence the
   clean fixtures cannot — e.g. round 8's q202 NULL-history bug, and
   any Spark-vs-DuckDB NULL-ordering / NULL-semantics drift. NaN
   doubles are deliberately NOT injected: NaN ordering/equality is an
   engine-level representation choice (both engines are internally
   consistent but canon() text round-trips differ), so NaN rows would
   flag reader-level noise, not query bugs.

3. ``--skew`` (round 11): a skew-hostile variant at any ``--sf`` —
   value-clean (every oracle runs unchanged; parity is data-independent)
   but with the key distributions a 100 TB pipeline actually fears: one
   supplier on 20% of lineitems, one customer on 10% of orders, one user
   on 20% of events (the hot FK the salted join / AQE skew split guard),
   and one LSH-hot 40-word boilerplate template shared by 2% of
   documents (pairwise Jaccard ~0.9 — one giant near-dup cluster
   stressing the banded-join hot-band caps, df-cap pruning, and
   connected-components paths). ``verify_all.py --sf
   .scaledata/star_sf1_skew`` runs the census on it (q97's recursive-CTE
   oracle is data-infeasible on the hot user — the harness substitutes
   its sanctioned python-recurrence arbiter automatically, r12); the
   ``scale_ladder.py --skew-tasks`` arm records per-stage task max/median
   times uniform-vs-skew for the join/dedup/CC headliners.

Dimension tables nation/region stay clean in adversarial mode: they are
the join spine, and a broken spine fails every query identically
instead of exercising distinct code paths.

Deterministic: numpy PCG64(seed=42), no wall clock — same CLI args
reproduce byte-identical parquet. Writes only under .scaledata/
(gitignored). Never touches /root/testdata.

Profile notes (measured on /root/testdata/sf0.01, the conventions this
generator reproduces):
- rows: customer 150k*sf, supplier 10k*sf, part 200k*sf, orders
  1.5M*sf, lineitem exactly 4*orders (per-order counts ~ Poisson(4),
  tail-trimmed; ~1.7% of orders carry zero lines), events 1M*sf over
  30 days of Jan 2024 with 15k*sf users, documents/embeddings follow
  the sf0.1 profile (5k/2k at sf0.1 -> 50k/20k at sf1, floor 500).
- events.value ~ Exponential(mean 50) rounded to cents, floor 0.01;
  props = '{"k": <0..99>}'.
- documents: 31-word Spark vocab (read from the fixture), 10..99 words
  per doc, source = src{doc_id % 20}, lang ~ {en .44, zh/es/fr .14-.15,
  de .14}, exact-duplicate texts planted at the sf0.1 rate (8/5000).
- embeddings: 64-dim float32 unit vectors in 10 label clusters.
"""

from __future__ import annotations

import argparse
import os

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
SEED = 42
EVENT_TYPES = ("signup", "error", "click", "view", "purchase")
EVENT_T0 = "2024-01-01T00:00:00"
EVENT_SPAN_US = 30 * 24 * 3600 * 1_000_000
MKT_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
ORDER_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
PART_ADJS = ("small", "large", "red", "blue", "hot", "cold", "new", "old")
PART_NOUNS = ("widget", "gear", "bolt", "ring", "anvil", "rod", "plate")
PART_TYPES = ("ECONOMY", "STANDARD", "PROMO", "SMALL", "MEDIUM", "LARGE")
REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
DOC_LANGS = ("en", "zh", "es", "fr", "de")
DOC_LANG_P = (0.44, 0.14, 0.14, 0.14, 0.14)
ORDERDATE_T0 = "1995-01-01T00:00:00"
ORDERDATE_SPAN_DAYS = 2405  # 1995-01-01 .. 2001-08-01 inclusive


def _vocab() -> list[str]:
    """The fixture documents' 31-word vocabulary, read from the driver
    parquet so a fixture refresh cannot silently diverge the generator."""
    import pyarrow.parquet as pq

    ref = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    return sorted({w for t in ref.column("text").to_pylist() for w in t.split()})


def generate(
    out_dir: str, sf: float, adversarial: bool = False, skew: bool = False
) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if adversarial and skew:
        raise ValueError("pick one hostile axis: --adversarial or --skew")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    m = sf / 0.001  # multiplier vs the smallest driver fixture

    n_cust = int(150 * m)
    n_supp = int(10 * m)
    n_part = int(200 * m)
    n_orders = int(1500 * m)
    n_events = int(1000 * m)
    n_users = max(2, int(15 * m))
    n_docs = max(500, int(5000 * sf / 0.1))
    n_vecs = max(500, int(2000 * sf / 0.1))

    def write(name: str, table: "pa.Table") -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    # --- dims (clean in both modes — see module docstring) --------------
    write("region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(list(REGIONS)),
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
    }))

    # --- customer --------------------------------------------------------
    c_key = np.arange(n_cust, dtype=np.int64)
    c_name = [f"Customer#{i:09d}" for i in range(n_cust)]
    c_bal = np.round(rng.uniform(-1000, 10000, n_cust), 2)
    c_seg = rng.choice(np.array(MKT_SEGMENTS), size=n_cust)
    c_nat = rng.integers(0, 25, size=n_cust, dtype=np.int32)
    c_cols = {"c_custkey": pa.array(c_key), "c_name": None,
              "c_nationkey": pa.array(c_nat), "c_acctbal": None,
              "c_mktsegment": None}
    if adversarial:
        for i in _pick(rng, n_cust, 0.01):
            c_name[i] = ""                       # empty name
        for i in _pick(rng, n_cust, 0.01):
            c_name[i] = f"Cústomer#ñ{i:07d}"     # accented unicode
        c_cols["c_acctbal"] = _null_some(pa, rng, c_bal, 0.02)
        c_cols["c_mktsegment"] = _null_some(pa, rng, c_seg, 0.02)
        c_cols["c_name"] = pa.array(c_name)
        # duplicate primary keys: re-append 5 existing keys with fresh rows
        dup = rng.choice(c_key, size=min(5, n_cust), replace=False)
        tbl = pa.table(c_cols)
        extra = pa.table({
            "c_custkey": pa.array(dup),
            "c_name": pa.array([f"Customer#DUP{int(k)}" for k in dup]),
            "c_nationkey": pa.array(rng.integers(0, 25, size=len(dup), dtype=np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, len(dup)), 2)),
            "c_mktsegment": pa.array(rng.choice(np.array(MKT_SEGMENTS), size=len(dup))),
        })
        write("customer", pa.concat_tables([tbl, extra]))
    else:
        c_cols["c_name"] = pa.array(c_name)
        c_cols["c_acctbal"] = pa.array(c_bal)
        c_cols["c_mktsegment"] = pa.array(c_seg)
        write("customer", pa.table(c_cols))

    # --- supplier ----------------------------------------------------------
    s_bal = np.round(rng.uniform(-1000, 10000, n_supp), 2)
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp, dtype=np.int32)),
        "s_acctbal": (_null_some(pa, rng, s_bal, 0.02)
                      if adversarial else pa.array(s_bal)),
    }))

    # --- part ---------------------------------------------------------------
    p_name = [f"{PART_ADJS[int(a)]} {PART_NOUNS[int(b)]}"
              for a, b in zip(rng.integers(0, len(PART_ADJS), n_part),
                              rng.integers(0, len(PART_NOUNS), n_part))]
    p_brand = np.array([f"Brand#{i}" for i in range(25)])[
        rng.integers(0, 25, size=n_part)]
    p_price = rng.integers(9000, 10000, size=n_part) / 100.0
    if adversarial:
        for i in _pick(rng, n_part, 0.01):
            p_name[i] = ""
        neg = _pick(rng, n_part, 0.01)
        p_price[neg] = -p_price[neg]             # negative retail price
        p_price[_pick(rng, n_part, 0.005)] = 0.0
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array(p_name),
        "p_brand": (_null_some(pa, rng, p_brand, 0.02)
                    if adversarial else pa.array(p_brand)),
        "p_type": pa.array(rng.choice(np.array(PART_TYPES), size=n_part)),
        "p_size": pa.array(rng.integers(1, 51, size=n_part, dtype=np.int32)),
        "p_retailprice": pa.array(p_price),
    }))

    # --- orders -------------------------------------------------------------
    o_key = np.arange(n_orders, dtype=np.int64)
    t0 = np.datetime64(ORDERDATE_T0, "us")
    o_days = rng.integers(0, ORDERDATE_SPAN_DAYS, size=n_orders)
    o_date = t0 + o_days * np.int64(86400_000_000)
    o_price = np.round(rng.uniform(1000, 500000, n_orders), 2)
    o_cust = rng.integers(0, n_cust, size=n_orders, dtype=np.int64)
    if skew:
        # one customer owns 10% of all orders (hot FK into customer)
        o_cust[_pick(rng, n_orders, 0.10)] = 13 % n_cust
    o_cols = {
        "o_orderkey": pa.array(o_key),
        "o_custkey": pa.array(o_cust),
        "o_orderstatus": pa.array(rng.choice(np.array(["P", "O", "F"]), size=n_orders)),
        "o_totalprice": pa.array(o_price),
        "o_orderdate": pa.array(o_date),
        "o_orderpriority": pa.array(rng.choice(np.array(ORDER_PRIORITIES), size=n_orders)),
    }
    if adversarial:
        # boundary timestamps: unix epoch, int32-seconds rollover, leap day
        for i, b in zip(_pick(rng, n_orders, 0.005),
                        ("1970-01-01T00:00:00", "2038-01-19T03:14:07",
                         "2024-02-29T00:00:00")):
            o_date[i] = np.datetime64(b, "us")
        o_cols["o_orderdate"] = _null_some(pa, rng, o_date, 0.01)
        o_cols["o_totalprice"] = _null_some(pa, rng, o_price, 0.01)
        tbl = pa.table(o_cols)
        dup_idx = rng.choice(n_orders, size=min(3, n_orders), replace=False)
        write("orders", pa.concat_tables([tbl, tbl.take(pa.array(dup_idx))]))
    else:
        write("orders", pa.table(o_cols))

    # --- lineitem: per-order counts ~ Poisson(4), trimmed/padded to 4x ------
    counts = rng.poisson(4.0, n_orders)
    target = 4 * n_orders
    drift = int(counts.sum()) - target
    if drift > 0:  # trim from the tail, never below zero lines
        i = n_orders - 1
        while drift > 0 and i >= 0:
            take = min(drift, int(counts[i]))
            counts[i] -= take
            drift -= take
            i -= 1
    elif drift < 0:
        counts[-1] += -drift
    n_li = target
    li_order = np.repeat(o_key, counts)
    li_line = (np.arange(n_li) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts) + 1
    ).astype(np.int32)
    li_qty = rng.integers(1, 51, size=n_li).astype(np.float64)
    li_ship = np.repeat(o_date, counts) + rng.integers(
        1, 96, size=n_li) * np.int64(86400_000_000)
    li_disc = rng.integers(0, 11, size=n_li) / 100.0
    li_tax = rng.integers(0, 9, size=n_li) / 100.0
    li_rf = rng.choice(np.array(["A", "N", "R"]), size=n_li)
    li_supp = rng.integers(0, n_supp, size=n_li, dtype=np.int64)
    if skew:
        # one supplier carries 20% of all lineitems (hot join/group key)
        li_supp[_pick(rng, n_li, 0.20)] = 7 % n_supp
    li_cols = {
        "l_orderkey": pa.array(li_order),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n_li, dtype=np.int64)),
        "l_suppkey": pa.array(li_supp),
        "l_linenumber": pa.array(li_line),
        "l_quantity": pa.array(li_qty),
        "l_extendedprice": pa.array(np.round(li_qty * rng.uniform(900, 1000, n_li), 2)),
        "l_discount": pa.array(li_disc),
        "l_tax": pa.array(li_tax),
        "l_returnflag": pa.array(li_rf),
        "l_linestatus": pa.array(rng.choice(np.array(["O", "F"]), size=n_li)),
        "l_shipdate": pa.array(li_ship),
    }
    if adversarial:
        li_qty[_pick(rng, n_li, 0.01)] = 0.0       # zero quantities
        li_cols["l_quantity"] = pa.array(li_qty)
        li_cols["l_discount"] = _null_some(pa, rng, li_disc, 0.02)
        li_cols["l_tax"] = _null_some(pa, rng, li_tax, 0.02)
        li_cols["l_returnflag"] = _null_some(pa, rng, li_rf, 0.01)
        # NULL shipdate (orderdate NULLs already propagate a NULL lead time)
        li_cols["l_shipdate"] = _null_some(pa, rng, li_ship, 0.01)
        tbl = pa.table(li_cols)
        dup_idx = rng.choice(n_li, size=min(8, n_li), replace=False)
        write("lineitem", pa.concat_tables([tbl, tbl.take(pa.array(dup_idx))]))
    else:
        write("lineitem", pa.table(li_cols))

    # --- events ----------------------------------------------------------
    ev_t0 = np.datetime64(EVENT_T0, "us")
    ev_ts = ev_t0 + rng.integers(0, EVENT_SPAN_US, size=n_events)
    ev_user = rng.integers(0, n_users, size=n_events, dtype=np.int64)
    if skew:
        # one user fires 20% of all events — the hot key q63's salted
        # join and AQE's skew-join split exist for (user_id joins
        # customer.c_custkey across the registry)
        ev_user[_pick(rng, n_events, 0.20)] = 0
    ev_type = rng.choice(np.array(EVENT_TYPES), size=n_events)
    ev_val = np.maximum(np.round(rng.exponential(50.0, n_events), 2), 0.01)
    ev_props = [f'{{"k": {int(k)}}}'
                for k in rng.integers(0, 100, size=n_events)]
    ev_cols = {
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(ev_ts),
        "user_id": pa.array(ev_user),
        "event_type": pa.array(ev_type),
        "value": pa.array(ev_val),
        "props": pa.array(ev_props),
    }
    if adversarial:
        # boundary timestamps + exact (user_id, ts) ties — LAG/rank
        # determinism stressors
        b_idx = _pick(rng, n_events, 0.005)
        for i, b in zip(b_idx, ("1970-01-01T00:00:00", "2038-01-19T03:14:07",
                                "2024-01-15T00:00:00", "2024-01-31T23:59:59")):
            ev_ts[i] = np.datetime64(b, "us")
        tie = _pick(rng, n_events, 0.01)
        if len(tie) >= 2:  # pairs share (user, ts) but differ in event_id
            half = len(tie) // 2
            ev_ts[tie[:half]] = ev_ts[tie[half:2 * half]]
            ev_user[tie[:half]] = ev_user[tie[half:2 * half]]
        for i in _pick(rng, n_events, 0.005):
            ev_props[i] = ""                     # empty props
        for i in _pick(rng, n_events, 0.005):
            ev_props[i] = "{"                    # malformed JSON
        ev_cols["ts"] = pa.array(ev_ts)
        ev_cols["user_id"] = _null_some(pa, rng, ev_user, 0.01)
        ev_cols["event_type"] = _null_some(pa, rng, ev_type, 0.02)
        ev_cols["value"] = _null_some(pa, rng, ev_val, 0.02)
        ev_cols["props"] = _null_some_list(pa, rng, ev_props, 0.01)
        write("events", pa.table(ev_cols))
    else:
        write("events", pa.table(ev_cols))

    # --- documents -------------------------------------------------------
    vocab = np.array(_vocab())
    n_words = rng.integers(10, 100, size=n_docs)
    word_ids = rng.integers(0, len(vocab), size=int(n_words.sum()))
    texts: list[str | None] = []
    pos = 0
    for k in n_words:
        texts.append(" ".join(vocab[word_ids[pos:pos + k]]))
        pos += int(k)
    n_dups = max(1, round(n_docs * 8 / 5000))
    for d in rng.choice(np.arange(1, n_docs), size=n_dups, replace=False):
        texts[int(d)] = texts[int(rng.integers(0, d))]
    if skew:
        # one LSH-hot template: 2% of documents share a 40-word
        # boilerplate prefix plus one distinct suffix word each —
        # pairwise Jaccard ~0.9, so they land in the same MinHash/SimHash
        # bands and form one giant near-dup cluster (the crawl-scale
        # boilerplate case the hot-band caps, df-cap pruning, and
        # big-star CC exist for)
        template = " ".join(vocab[np.arange(40) % len(vocab)])
        for j, d in enumerate(sorted(_pick(rng, n_docs, 0.02))):
            texts[int(d)] = template + " " + vocab[j % len(vocab)]
    langs = rng.choice(np.array(DOC_LANGS), size=n_docs, p=np.array(DOC_LANG_P))
    d_cols = {
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": None,
        "lang": None,
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": None,
    }
    if adversarial:
        for i in _pick(rng, n_docs, 0.01):
            texts[i] = ""                        # empty documents
        for i in _pick(rng, n_docs, 0.01):
            texts[i] = "   "                     # whitespace-only
        for i in _pick(rng, n_docs, 0.01):
            texts[i] = "café naïve Ñandú mañana 北京 œuvre"  # unicode
        for i in _pick(rng, n_docs, 0.01):
            texts[i] = None                      # NULL text
        d_cols["text"] = pa.array(texts, type=pa.string())
        d_cols["lang"] = _null_some(pa, rng, langs, 0.02)
        d_cols["n_chars"] = pa.array(
            [len(t) if t is not None else None for t in texts],
            type=pa.int64())
        tbl = pa.table(d_cols)
        dup_idx = rng.choice(n_docs, size=min(3, n_docs), replace=False)
        write("documents", pa.concat_tables([tbl, tbl.take(pa.array(dup_idx))]))
    else:
        d_cols["text"] = pa.array(texts, type=pa.string())
        d_cols["lang"] = pa.array(langs)
        d_cols["n_chars"] = pa.array([len(t) for t in texts], type=pa.int64())
        write("documents", pa.table(d_cols))

    # --- embeddings: 10 unit-norm clusters in 64-d -------------------------
    dim, n_lab = 64, 10
    centers = rng.normal(size=(n_lab, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_lab, size=n_vecs)
    vecs = centers[labels] * 2.0 + rng.normal(size=(n_vecs, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    lab32 = labels.astype(np.int32)
    if adversarial:
        vecs[_pick(rng, n_vecs, 0.01)] = 0.0     # zero-norm vectors
        emb_list: list = [v for v in vecs.tolist()]
        for i in _pick(rng, n_vecs, 0.01):
            emb_list[i] = None                   # NULL embedding
        e_cols = {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(emb_list, type=pa.list_(pa.float32())),
            "label": _null_some(pa, rng, lab32, 0.02),
        }
        tbl = pa.table(e_cols)
        dup_idx = rng.choice(n_vecs, size=min(2, n_vecs), replace=False)
        write("embeddings", pa.concat_tables([tbl, tbl.take(pa.array(dup_idx))]))
    else:
        write("embeddings", pa.table({
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array(lab32),
        }))
    return out_dir


def _pick(rng, n: int, frac: float):
    """Deterministic sample of ~frac*n distinct row indices (>=1)."""
    k = max(1, int(n * frac))
    return rng.choice(n, size=min(k, n), replace=False)


def _null_some(pa, rng, arr, frac: float):
    """Arrow array with ~frac of entries nulled (numpy input)."""
    mask = __import__("numpy").zeros(len(arr), dtype=bool)
    mask[_pick(rng, len(arr), frac)] = True
    return pa.array(arr, mask=mask)


def _null_some_list(pa, rng, values: list, frac: float):
    vals = list(values)
    for i in _pick(rng, len(vals), frac):
        vals[i] = None
    return pa.array(vals, type=pa.string())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None,
                    help="output dir (default .scaledata/star_sf{sf} or "
                         ".scaledata/adversarial)")
    ap.add_argument("--adversarial", action="store_true",
                    help="sf0.001-scale hostile variant (NULLs, dup keys, "
                         "boundary timestamps, empty strings, zero vectors)")
    ap.add_argument("--skew", action="store_true",
                    help="skew-hostile variant at the given --sf: one "
                         "supplier on 20%% of lineitems, one customer on "
                         "10%% of orders, one user on 20%% of events, one "
                         "LSH-hot document template on 2%% of documents — "
                         "value-clean, so the same oracles run unchanged; "
                         "exercises the salted-join/AQE-skew and hot-band/"
                         "df-cap paths under real volume")
    args = ap.parse_args()
    if args.adversarial:
        sf = 0.001 if args.sf == 1.0 else args.sf
        out = args.out or os.path.join(REPO_ROOT, ".scaledata", "adversarial")
    else:
        sf = args.sf
        sf_tag = f"{sf:g}"
        suffix = "_skew" if args.skew else ""
        out = args.out or os.path.join(
            REPO_ROOT, ".scaledata", f"star_sf{sf_tag}{suffix}")
    generate(out, sf, adversarial=args.adversarial, skew=args.skew)
    import pyarrow.parquet as pq

    for t in sorted(os.listdir(out)):
        p = os.path.join(out, t)
        print(t, pq.read_metadata(p).num_rows)


if __name__ == "__main__":
    raise SystemExit(main())
