"""Deterministic scale-factor data generator (sf1 rehearsal).

Reproduces the driver's testdata SCHEMAS (TESTDATA.md: TPC-H-ish star
schema + events/documents/embeddings) at larger scale factors so the
engine can be rehearsed beyond the shipped sf0.1. Distribution shapes
mirror the shipped fixtures (value ranges, vocab, key ratios, near-dup
document clusters); byte-parity with the driver's generator is NOT a
goal — every sf1 check is Spark-vs-DuckDB over the same files.

Usage: python tools/gen_sf.py <sf> [out_dir]
  e.g. python tools/gen_sf.py 1 localdata/sf1

Writes one parquet FILE per table (same layout as /root/testdata).
Deterministic: numpy PCG64 seeded per (table, sf).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
PCOLORS = ["red", "blue", "green", "small", "large", "shiny"]
PNOUNS = ["widget", "bolt", "ring", "gear", "cog", "pin"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
EVENT_W = [0.45, 0.30, 0.10, 0.05, 0.10]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_W = [0.5, 0.2, 0.12, 0.1, 0.08]
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "the line sort window order data column join small customer query "
    "big group stream filter a"
).split()


def _zipf_vocab(n_tail: int = 10_000) -> tuple[list[str], np.ndarray]:
    """Zipf-distributed vocabulary: the 30 historical head words (rank
    1-30 — every registry query's literal search terms keep appearing)
    plus ``n_tail`` syllable-built tail words. Returns (vocab, probs).

    The round-4 sf1 sweep showed WHY this matters: with a ~30-word
    vocabulary every long document's distinct-token set converges to
    the full vocabulary, token-set Jaccard saturates, and every pair
    'qualifies' — the near-dup family's outputs become O(n²) and its
    oracles corpus-degenerate. A heavy-tailed 10⁴-term vocab makes
    random pairs dissimilar (near-dup pair counts O(n), all planted)
    while the head keeps term-match queries populated."""
    syl = [c + v for c in "bdfgklmnprstvz" for v in "aeiou"]  # 70
    tail = [
        syl[i % 70] + syl[(i // 70) % 70] + syl[i // 4900]
        for i in range(n_tail)
    ]
    vocab = VOCAB + tail
    ranks = np.arange(1, len(vocab) + 1, dtype="float64")
    probs = 1.0 / ranks**1.07
    probs /= probs.sum()
    return vocab, probs

TS0 = np.datetime64("2024-01-01T00:00:00", "us")
DAY_US = 86_400_000_000


def _rng(table: str, sf: float) -> np.random.Generator:
    # hashlib, NOT builtin hash(): str hashing is PYTHONHASHSEED-salted
    # per process, which silently broke the "deterministic" contract —
    # two runs produced different corpora
    import hashlib

    digest = hashlib.sha256(f"{table}|{round(sf * 1000)}".encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    # ≥32 row groups per table: Spark can only split a parquet FILE at
    # row-group boundaries, so a single-row-group fixture serializes
    # every scan onto one task no matter what maxPartitionBytes says —
    # measured 87s vs 4s on the sf1 documents token scans. Values are
    # unchanged (seeded); only the physical layout is parallelizable.
    rg = max(1024, table.num_rows // 32)
    pq.write_table(
        table, path, compression="snappy", row_group_size=rg
    )
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_arr(us: np.ndarray) -> pa.Array:
    # timestamp[us] WITHOUT timezone — parquet isAdjustedToUTC=false,
    # i.e. Spark TIMESTAMP_NTZ, the round-3+ testdata encoding
    return pa.Array.from_pandas(
        (TS0 + us.astype("timedelta64[us]")),
        type=pa.timestamp("us"),
    )


def gen(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li_per = 4  # ~6M lineitems at sf1
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(50_000 * sf)

    _write(
        out_dir,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    _write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    r = _rng("customer", sf)
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    r.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(r.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": pa.array(
                    [SEGMENTS[i] for i in r.integers(0, 5, n_cust)]
                ),
            }
        ),
    )

    r = _rng("supplier", sf)
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    r.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(r.uniform(-999, 9999, n_supp), 2),
            }
        ),
    )

    r = _rng("part", sf)
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [
                    f"{PCOLORS[i % 6]} {PNOUNS[(i // 6) % 6]}"
                    for i in range(n_part)
                ],
                "p_brand": [
                    f"Brand#{i}" for i in r.integers(1, 26, n_part)
                ],
                "p_type": [PTYPES[i] for i in r.integers(0, 5, n_part)],
                "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(
                    900.0 + 0.1 * np.arange(n_part) % 1100, 2
                ),
            }
        ),
    )

    r = _rng("orders", sf)
    o_date_us = r.integers(0, 2404, n_ord) * DAY_US  # 1995..2001 span
    # shift epoch to 1995-01-01
    o_base = np.datetime64("1995-01-01T00:00:00", "us")
    o_ts = o_base + o_date_us.astype("timedelta64[us]")
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    r.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    [["O", "F", "P"][i] for i in r.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(r.uniform(900, 400000, n_ord), 2),
                "o_orderdate": pa.Array.from_pandas(
                    o_ts, type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    [PRIORITIES[i] for i in r.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    r = _rng("lineitem", sf)
    n_li_each = r.integers(1, 2 * n_li_per, n_ord)  # 1..7, mean ~4
    n_li = int(n_li_each.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), n_li_each)
    l_linenumber = np.concatenate(
        [np.arange(c, dtype=np.int32) for c in n_li_each]
    )
    ship_delay = r.integers(1, 95, n_li) * DAY_US
    l_ship = (
        o_base
        + np.repeat(o_date_us, n_li_each).astype("timedelta64[us]")
        + ship_delay.astype("timedelta64[us]")
    )
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(
                    r.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    r.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(l_linenumber, pa.int32()),
                "l_quantity": r.integers(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(
                    r.uniform(900, 100000, n_li), 2
                ),
                "l_discount": np.round(r.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(r.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    [["A", "N", "R"][i] for i in r.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    [["O", "F"][i] for i in r.integers(0, 2, n_li)]
                ),
                "l_shipdate": pa.Array.from_pandas(
                    l_ship, type=pa.timestamp("us")
                ),
            }
        ),
    )

    r = _rng("events", sf)
    n_users = max(int(n_events * 0.015), 10)
    ts_us = np.sort(r.integers(0, 30 * DAY_US, n_events))
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_events), pa.int64()),
                "ts": _ts_arr(ts_us),
                "user_id": pa.array(
                    r.integers(0, n_users, n_events), pa.int64()
                ),
                "event_type": pa.array(
                    [
                        EVENT_TYPES[i]
                        for i in r.choice(5, n_events, p=EVENT_W)
                    ]
                ),
                "value": np.round(r.uniform(0.01, 490.02, n_events), 2),
                "props": [
                    '{"k": %d}' % k for k in r.integers(0, 100, n_events)
                ],
            }
        ),
    )

    r = _rng("documents", sf)
    vocab, vprobs = _zipf_vocab()
    texts = []
    langs = [LANGS[i] for i in r.choice(5, n_docs, p=LANG_W)]
    # one bulk Zipf draw for every base document's words (single
    # r.choice call — per-doc calls rebuild the 10k-alias table each
    # time and dominate generation at sf3)
    n_w_all = r.integers(10, 111, n_docs)
    word_pool = r.choice(len(vocab), int(n_w_all.sum()), p=vprobs)
    pool_off = np.concatenate([[0], np.cumsum(n_w_all)])
    mut_pool = r.choice(len(vocab), 2 * n_docs, p=vprobs)  # bulk, like words
    mut_i = 0
    base_words = None
    base_at = -2
    for i in range(n_docs):
        if i % 100 == 4 and base_words is not None:
            # planted EXACT duplicate (1%): the Zipf draw virtually
            # never repeats a text by chance, so exact-dedup keeps a
            # real survivor population to prune
            w = list(base_words)
            langs[i] = langs[base_at]
        elif i % 10 in (8, 9) and base_words is not None and base_at >= i - 3:
            # planted near-dup cluster: docs i%10∈{8,9} mutate the
            # cluster base (doc i-1 / i-2) in 1-2 positions — pairs at
            # Jaccard ≥ 0.8 stay O(n) and clusters reach size 3
            w = list(base_words)
            for _ in range(int(r.integers(1, 3))):
                w[int(r.integers(0, len(w)))] = vocab[mut_pool[mut_i]]
                mut_i += 1
            langs[i] = langs[base_at]  # dups share the block key
        else:
            w = [vocab[j] for j in word_pool[pool_off[i]:pool_off[i + 1]]]
            base_words = w
            base_at = i
        texts.append(" ".join(w))
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": [f"src{i}" for i in r.integers(0, 20, n_docs)],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )

    r = _rng("embeddings", sf)
    vecs = r.standard_normal((n_vecs, 64)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True) * 2.0  # |x|<=~0.5
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    r.integers(0, 10, n_vecs), pa.int32()
                ),
            }
        ),
    )


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "localdata",
            f"sf{sf:g}",
        )
    )
    print(f"generating sf={sf} -> {out}")
    gen(sf, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
