"""Deterministic Zipf-skewed variant of sf0.1 (round-10, VERDICT r9 Next #4).

Every gate corpus so far is uniform TPC-H-ish; real 100 TB joins and groupbys
see power-law keys. This builds /tmp/sfskew (default) from /root/testdata/sf0.1
with three deterministic hot-key injections — no RNG, rebuildable
bit-identically:

- orders.o_custkey: rows with o_orderkey % 3 < 2 are remapped to the single
  hottest customer (min custkey) → ~2/3 of all orders on one key;
- lineitem.l_partkey: rows with (l_orderkey * 7 + l_linenumber) % 2 = 0 are
  remapped to the hottest part → ~1/2 of all lineitems on one key;
- events.user_id: rows with event_id % 2 = 0 are remapped to the hottest
  user → ~1/2 of events in one window partition.

Hot keys are chosen from the existing dimension tables, so referential
integrity holds and every join still matches. All other tables pass through
unchanged. Both the Spark queries and the DuckDB oracles read the SAME files,
so running tools/oracle_check.py against the output differentially gates the
engine under skew (drift classes that only appear on hot keys: accumulation
order inside one huge group, tie-band explosions in windows, salted-join
reassembly).

Usage: python tools/make_skew_corpus.py [out_dir=/tmp/sfskew]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
PASSTHROUGH = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "documents",
    "embeddings",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    hot_cust = con.sql(
        f"SELECT min(c_custkey) FROM '{SRC}/customer.parquet'"
    ).fetchone()[0]
    hot_part = con.sql(f"SELECT min(p_partkey) FROM '{SRC}/part.parquet'").fetchone()[0]
    hot_user = con.sql(f"SELECT min(user_id) FROM '{SRC}/events.parquet'").fetchone()[0]

    def copy(sql: str, table: str) -> None:
        dst = f"{out}/{table}.parquet"
        if os.path.exists(dst):
            os.remove(dst)
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        print("wrote", dst)

    for t in PASSTHROUGH:
        copy(f"SELECT * FROM '{SRC}/{t}.parquet'", t)
    copy(
        f"""
        SELECT * REPLACE (
            CASE WHEN o_orderkey % 3 < 2 THEN {hot_cust} ELSE o_custkey END
                AS o_custkey)
        FROM '{SRC}/orders.parquet'
        """,
        "orders",
    )
    copy(
        f"""
        SELECT * REPLACE (
            CASE WHEN (l_orderkey * 7 + l_linenumber) % 2 = 0
                 THEN {hot_part} ELSE l_partkey END AS l_partkey)
        FROM '{SRC}/lineitem.parquet'
        """,
        "lineitem",
    )
    copy(
        f"""
        SELECT * REPLACE (
            CASE WHEN event_id % 2 = 0 THEN {hot_user} ELSE user_id END
                AS user_id)
        FROM '{SRC}/events.parquet'
        """,
        "events",
    )
    n = con.sql(
        f"SELECT count(*) FILTER (WHERE o_custkey = {hot_cust}) * 1.0 / count(*) "
        f"FROM '{out}/orders.parquet'"
    ).fetchone()[0]
    print(f"hot-custkey share of orders: {n:.3f}")


if __name__ == "__main__":
    main()
