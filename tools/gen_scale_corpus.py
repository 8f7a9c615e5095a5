"""Deterministic scale-corpus generator for the slope bench.

Generates the same ten tables as ``/root/testdata`` (schemas and value
distributions modeled on the driver corpus at sf0.1) at ARBITRARY
scale factor, so the worst headline queries can be timed at two sizes
a decade apart and a per-query scaling exponent measured
(``tools/bench_scale.py`` -> ``BENCH_SCALE.json``). The 5 s budget at
sf0.1 cannot distinguish O(n) from O(n^2) on blocked-pair families;
the slope can (VERDICT r7 task 3).

One DELIBERATE divergence from the driver corpus, documented here and
in BENCH_SCALE.json: ``documents`` uses a LARGE vocabulary (5,000
words) with explicitly injected near-duplicate clusters of BOUNDED
size (<= 4 members), instead of the driver's 31-word salad. With a
31-word vocabulary, two random short docs collide into near-dup pairs
by chance, so the TRUE pair count grows ~quadratically with corpus
size and every pair-LISTING query is super-linear in its OUTPUT — the
slope would measure the corpus, not the algorithm. Bounded clusters
keep expected output linear in n, so a super-linear slope in
BENCH_SCALE.json indicts the plan, which is exactly what the gate
(tests/test_scale_slope.py) wants to catch.

Row counts per unit sf (matching the driver's sf0.1 ratios):
lineitem 6M, orders 1.5M, customer 150k, part 200k, supplier 10k,
events 1M (15k users over 30 days), documents 50k, embeddings 20k
(dim 64, unit vectors), region 5, nation 25.

Usage: python tools/gen_scale_corpus.py --sf 1.0 --out .scale_corpus/sf1
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_BASE_WORDS = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group the key query agg table stream filter big merge join window "
    "vector data customer"
).split()

_LANGS = ["en", "de", "zh", "fr", "es"]
_EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
_SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
_PTYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
_PNAMES = [
    "large ring", "hot bolt", "small screw", "dim washer", "red nut",
    "blue clip", "green pin", "plain rod",
]

VOCAB_SIZE = 5000
CLUSTER_MAX = 4          # injected near-dup cluster cap (see module doc)
NEARDUP_FRACTION = 0.15  # docs that are perturbed copies of a base doc
EXACT_DUP_EVERY = 600    # every 600th doc copies its neighbor verbatim

_DAY_US = 86_400_000_000


def _vocab() -> list[str]:
    out = list(_BASE_WORDS)
    i = 0
    while len(out) < VOCAB_SIZE:
        out.append(f"{_BASE_WORDS[i % len(_BASE_WORDS)]}{i}")
        i += 1
    return out


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def generate(sf: float, out_dir: str, seed: int = 7) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    counts = {
        "lineitem": int(6_000_000 * sf),
        "orders": int(1_500_000 * sf),
        "customer": int(150_000 * sf),
        "part": int(200_000 * sf),
        "supplier": int(10_000 * sf),
        "events": int(1_000_000 * sf),
        "users": max(int(15_000 * sf), 10),
        "documents": int(50_000 * sf),
        "embeddings": int(20_000 * sf),
    }

    # region / nation ------------------------------------------------------
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # customer / supplier / part ------------------------------------------
    n = counts["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n, dtype=np.int32), pa.int32()
        ),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n), 2),
        "c_mktsegment": pa.array(
            np.array(_SEGMENTS)[rng.integers(0, len(_SEGMENTS), n)]
        ),
    }))
    n = counts["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n, dtype=np.int32), pa.int32()
        ),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n), 2),
    }))
    n = counts["part"]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array(
            np.array(_PNAMES)[rng.integers(0, len(_PNAMES), n)]
        ),
        "p_brand": pa.array(
            np.char.add("Brand#", rng.integers(1, 50, n).astype(str))
        ),
        "p_type": pa.array(
            np.array(_PTYPES)[rng.integers(0, len(_PTYPES), n)]
        ),
        "p_size": pa.array(
            rng.integers(1, 51, n, dtype=np.int32), pa.int32()
        ),
        "p_retailprice": np.round(900.0 + np.arange(n) * 0.1 % 1100, 2),
    }))

    # orders / lineitem ----------------------------------------------------
    n = counts["orders"]
    date_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(
        np.int64
    )
    date_hi = np.datetime64("2001-08-02").astype("datetime64[us]").astype(
        np.int64
    )
    odate = (
        date_lo
        + (rng.integers(0, (date_hi - date_lo) // _DAY_US, n)) * _DAY_US
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, counts["customer"], n), pa.int64()
        ),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n)]
        ),
        "o_totalprice": np.round(rng.uniform(800, 500_000, n), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(_PRIORITIES)[rng.integers(0, len(_PRIORITIES), n)]
        ),
    }))
    n = counts["lineitem"]
    sdate = (
        date_lo
        + (rng.integers(0, (date_hi - date_lo) // _DAY_US, n)) * _DAY_US
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, counts["orders"], n), pa.int64()
        ),
        "l_partkey": pa.array(rng.integers(0, counts["part"], n), pa.int64()),
        "l_suppkey": pa.array(
            rng.integers(0, counts["supplier"], n), pa.int64()
        ),
        "l_linenumber": pa.array(
            rng.integers(1, 8, n, dtype=np.int32), pa.int32()
        ),
        "l_quantity": rng.integers(1, 51, n).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n), 2),
        "l_discount": np.round(rng.integers(0, 11, n) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n) * 0.01, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n)]
        ),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    # events ---------------------------------------------------------------
    n = counts["events"]
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span = 30 * _DAY_US
    ts = t0 + np.sort(rng.integers(0, span, n))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, counts["users"], n), pa.int64()),
        "event_type": pa.array(
            np.array(_EVENT_TYPES)[rng.integers(0, len(_EVENT_TYPES), n)]
        ),
        "value": np.round(
            np.minimum(rng.exponential(50.0, n), 600.0), 2
        ),
        "props": pa.array(
            np.char.add(
                np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)),
                "}",
            )
        ),
    }))

    # documents ------------------------------------------------------------
    n = counts["documents"]
    vocab = np.array(_vocab())
    n_copies = int(n * NEARDUP_FRACTION)
    n_base = n - n_copies
    texts: list[str] = []
    base_words: list[np.ndarray] = []
    for i in range(n_base):
        k = int(rng.integers(8, 101))
        w = vocab[rng.integers(0, VOCAB_SIZE, k)]
        base_words.append(w)
        texts.append(" ".join(w))
    # injected near-dup clusters, size <= CLUSTER_MAX (base + <=3 copies)
    for j in range(n_copies):
        src = base_words[(j // (CLUSTER_MAX - 1)) % n_base]
        w = src.copy()
        # alternate light (~5%) and heavier (~10%) mutation so both
        # high-threshold (>=0.9 jaccard) and mid-threshold near-dup
        # families see non-empty match sets
        n_mut = max(1, len(w) // (20 if j % 2 == 0 else 10))
        pos = rng.integers(0, len(w), n_mut)
        w[pos] = vocab[rng.integers(0, VOCAB_SIZE, n_mut)]
        texts.append(" ".join(w))
    # exact duplicates at a fixed, scale-independent rate
    for i in range(EXACT_DUP_EVERY - 1, n, EXACT_DUP_EVERY):
        texts[i] = texts[i - 1]
    langs = np.array(_LANGS)[
        np.where(
            rng.random(n) < 0.41, 0, rng.integers(1, len(_LANGS), n)
        )
    ]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": texts,
        "lang": pa.array(langs),
        "source": [f"src{i % 20}" for i in range(n)],
        "n_chars": pa.array(
            np.array([len(t) for t in texts]), pa.int64()
        ),
    }))

    # embeddings -----------------------------------------------------------
    n = counts["embeddings"]
    dim = 64
    vecs = rng.normal(0, 1, (n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, 10, n, dtype=np.int32), pa.int32()
        ),
    }))

    manifest = {"sf": sf, "seed": seed, "counts": counts}
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def ensure(sf: float, out_dir: str, seed: int = 7) -> str:
    """Generate only if the manifest is absent or mismatched."""
    mpath = os.path.join(out_dir, "MANIFEST.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            m = json.load(fh)
        if m.get("sf") == sf and m.get("seed") == seed:
            return out_dir
    generate(sf, out_dir, seed)
    return out_dir


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    print(json.dumps(generate(args.sf, args.out, args.seed)))
