"""Generate driver-shaped synthetic testdata at an arbitrary scale factor.

The driver ships read-only parquet at sf0.001/0.01/0.1 (TESTDATA.md).
Scale-step validation (VERDICT r5 ask #1) needs an sf1 (~6M-row
lineitem) dataset; this generator reproduces the driver tables'
schemas, key spaces, and value distributions — profiled from
``/root/testdata/sf0.1`` — at any ``--sf``, so the full bench and the
DuckDB oracle gate can run at 10x and the per-query scaling exponent
becomes a measurement instead of a design claim.

Faithfulness notes (everything below was measured on the driver data):

* row counts scale linearly: lineitem = 6_000_000*sf, orders = sf*1.5M,
  customer = sf*150k, supplier = sf*10k, part = sf*200k, events = sf*1M,
  documents = sf*50k, embeddings = sf*20k; region(5)/nation(25) fixed
  (copied verbatim from the driver's sf0.1 — they are sf-invariant).
* orders: o_orderdate uniform midnight-timestamps in [1995-01-01,
  2001-08-01]; status/priority uniform; totalprice uniform
  [1000, 500000] round 2.
* lineitem: l_orderkey uniform over orders (NOT grouped — the driver's
  sf0.1 has 147,236/150,000 distinct orderkeys, the uniform-draw
  expectation); l_shipdate uniform and INDEPENDENT of o_orderdate
  (measured shipdate-orderdate spans -2399..+2496 days); discount in
  {0.00..0.10}, tax in {0.00..0.08} (cent steps); flags uniform.
* part: p_name = 8 colors x 8 nouns (64 names), p_retailprice =
  900 + (p_partkey % 1000)/10 (exact driver rule), Brand#1..25,
  6 types, size 1..50.
* events: ts = sorted uniform over 30 days of 2024-01; value ~
  Exp(mean 50) capped at 600 round 2 (measured mean ~50, max ~560);
  props = {{"k": 0..99}}; user_id space = sf*15k.
* documents: 10..100 words from the driver's 30-word vocab; lang
  p(en)=.41 rest .1475; source = src0..19 uniform; exactly 5% of docs
  get a trailing " dup" token; ~1.7% are near-dup copies of an earlier
  doc (tail mutated) and ~0.2% exact copies — matching the planted
  dup/near-dup structure the dedup operators are graded on.
* embeddings: 64-dim unit vectors, 10 labels, v = normalize(0.55*c_l+g)
  which reproduces the measured weak pull (mean cos to own centroid
  ~0.07) and the no-near-dup-pairs property (max offdiag cos ~0.6).

Usage: python tools/make_testdata.py --sf 1 --out .localdata/sf1
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_SF01 = "/root/testdata/sf0.1"

COLORS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = (
    "key agg row scan slow fast table value part hash a the merge batch "
    "window spark order data column join small line customer query group "
    "sort stream filter big vector"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

DAY_US = 86_400_000_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_days(rng: np.random.Generator, n: int, lo: str, hi: str) -> pa.Array:
    lo_d = np.datetime64(lo, "D").astype("datetime64[us]").astype(np.int64)
    hi_d = np.datetime64(hi, "D").astype("datetime64[us]").astype(np.int64)
    days = rng.integers(0, (hi_d - lo_d) // DAY_US + 1, n)
    return pa.array(lo_d + days * DAY_US, type=pa.timestamp("us"))


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation are sf-invariant dimensions: copy the driver's.
    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(REF_SF01, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
        print(f"  {t}: copied from driver sf0.1 (sf-invariant)")

    ck = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{k:09d}" for k in ck],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    sk = np.arange(n_supp, dtype=np.int64)
    _write(out, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": [f"Supplier#{k:09d}" for k in sk],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part, dtype=np.int64)
    names = np.array([f"{c} {n}" for c in COLORS for n in NOUNS])
    _write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": names[rng.integers(0, 64, n_part)],
        "p_brand": np.char.add("Brand#", rng.integers(1, 26, n_part).astype(str)),
        "p_type": np.array(TYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    ok = np.arange(n_ord, dtype=np.int64)
    _write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_days(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_line),
        "l_partkey": rng.integers(0, n_part, n_line),
        "l_suppkey": rng.integers(0, n_supp, n_line),
        "l_linenumber": rng.integers(1, 8, n_line).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_line), 2),
        "l_discount": rng.integers(0, 11, n_line) / 100.0,
        "l_tax": rng.integers(0, 9, n_line) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_line)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_line)],
        "l_shipdate": _ts_days(rng, n_line, "1995-01-02", "2001-11-04"),
    }))

    lo = np.datetime64("2024-01-01", "us").astype(np.int64)
    hi = np.datetime64("2024-01-31", "us").astype(np.int64)
    ts = np.sort(rng.integers(lo, hi, n_evt))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": rng.integers(0, int(15_000 * sf), n_evt),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)],
        "value": np.round(np.minimum(rng.exponential(50.0, n_evt), 600.0), 2),
        "props": np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, n_evt).astype(str)), "}"
        ),
    }))

    # documents: planted dup / near-dup structure (see module docstring)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.019:  # near-dup: copy an earlier doc, mutate tail
            words = texts[rng.integers(0, i)].split()
            for j in range(1, min(4, len(words)) + 1):
                words[-j] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
            continue
        n_words = rng.integers(10, 101)
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    dup_ids = rng.choice(n_doc, n_doc // 20, replace=False)
    for i in dup_ids:
        texts[i] = texts[i] + " dup"
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.char.add("src", rng.integers(0, 20, n_doc).astype(str)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = 0.55 * cents[labels] + rng.standard_normal((n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32)), type=pa.list_(pa.float32())),
        "label": labels.astype(np.int32),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(f"generating sf={args.sf} -> {args.out}")
    generate(args.sf, args.out, args.seed)


if __name__ == "__main__":
    main()
