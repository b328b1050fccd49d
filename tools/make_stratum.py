#!/usr/bin/env python3
"""Materialize a deterministic md5-stratum subset of the sf1 (or, via
--src, any scale) dataset so
the DuckDB-intractable oracles get DIRECT sf1 value-hash evidence
(r10 verdict item 3 — the join_cardinality_estimate trick applied to
whole queries).

The six intractable oracles (dedup_minhash_band_sweep,
dedup_cross_lingual, the recursive-CC class) blow up DuckDB on the
PAIR/closure stage at sf1 (>80 GB spill / OOM).  Restricting documents
to a 1/16 md5 stratum shrinks the pair bill ~256x while keeping sf1's
per-document geometry (text lengths, shingle distributions) intact.
The filter is applied ONCE here, at materialization — both engines then
read the identical parquet rows, so no cross-engine filter-semantics
drift is possible, and tools/check_oracle.py runs UNCHANGED against the
stratum dir:

    python tools/make_stratum.py            # writes /root/repo/.sf1_stratum16
    SPARK_GRAFT_ORACLE_SF=/root/repo/.sf1_stratum16 \
        python tools/check_oracle.py dedup_minhash_band_sweep ...

documents are filtered on md5(doc_id), embeddings on md5(vec_id) (their
own key); the TPC-H tables and events are symlinked through unchanged.
md5(key) rather than key % k so the stratum is uncorrelated with any
id-adjacency pattern the synthetic near-dup generator might have.
"""

from __future__ import annotations

import argparse
import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PASSTHROUGH = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(REPO, ".sf1"))
    ap.add_argument("--mod", type=int, default=16, help="keep doc_id strata where md5 %% mod == 0")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--tpch",
        action="store_true",
        help="ALSO filter the trade graph: customer/orders on the same"
        " md5(custkey) stratum, lineitem semi-joined to kept orders,"
        " events on md5(user_id) — for graph-oracle variants whose"
        " DuckDB replay (iterative peel / closure) spills at full sf1",
    )
    args = ap.parse_args()
    # default out name follows the SOURCE scale dir (r11 verdict item 5:
    # the same cutter serves .sf10 for 100x-scale value evidence):
    # .sf1 -> .sf1_stratum16, .sf10 -> .sf10_stratum16
    base = os.path.basename(os.path.normpath(args.src)).lstrip(".")
    out = args.out or os.path.join(
        REPO, f".{base}_stratum{args.mod}{'t' if args.tpch else ''}"
    )
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    for t, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        pred = (
            f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15))::BIGINT"
            f" % {args.mod} = 0"
        )
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') WHERE {pred}"
            f" ORDER BY {key})"
            f" TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")
    filtered = set()
    if args.tpch:
        def strat(col):
            return (
                f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"
                f" % {args.mod} = 0"
            )

        tp = {
            "customer": f"SELECT * FROM src WHERE {strat('c_custkey')} ORDER BY c_custkey",
            "orders": f"SELECT * FROM src WHERE {strat('o_custkey')} ORDER BY o_orderkey",
            "lineitem": (
                "SELECT l.* FROM src l WHERE EXISTS (SELECT 1 FROM orders_kept o"
                " WHERE o.o_orderkey = l.l_orderkey) ORDER BY l_orderkey, l_linenumber"
            ),
            "events": f"SELECT * FROM src WHERE {strat('user_id')} ORDER BY event_id",
        }
        for t in ("customer", "orders", "lineitem", "events"):
            src = os.path.join(args.src, f"{t}.parquet")
            dst = os.path.join(out, f"{t}.parquet")
            if os.path.islink(dst) or os.path.exists(dst):
                os.remove(dst)
            sql = tp[t].replace("src", f"read_parquet('{src}')", 1)
            if t == "lineitem":
                sql = sql.replace(
                    "orders_kept",
                    f"read_parquet('{os.path.join(out, 'orders.parquet')}')",
                )
            con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
            n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
            print(f"{t}: {n} rows -> {dst}")
            filtered.add(t)
    for t in PASSTHROUGH:
        if t in filtered:
            continue
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    print(f"stratum dir ready: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
