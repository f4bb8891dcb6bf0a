"""Build the 100x RELATIONAL scale corpus (round-12, VERDICT r11 Next #1).

The docs and embeddings families have 100x differential evidence
(/tmp/sfdoc100, /tmp/sfemb100); joins/groupbys/windows/TPC-H stop at 10x +
Zipf-skew. This tool grows the relational tables 100x with REFERENTIAL
INTEGRITY: copy i shifts every key column in a domain by i * domain_base, so
lineitem copy i still joins orders/part/supplier copy i and orders copy i
joins customer copy i — realistic "more customers, more orders" weak-scaling
growth, not orphaned foreign keys or a 100x hot-key pileup (sfskew covers
hot keys).

Domains (base = max over the defining table's key + 1):
  orderkey: orders.o_orderkey, lineitem.l_orderkey
  custkey:  customer.c_custkey, orders.o_custkey
  partkey:  part.p_partkey,    lineitem.l_partkey
  suppkey:  supplier.s_suppkey, lineitem.l_suppkey
  eventid:  events.event_id
  userid:   events.user_id      (distinct users per copy — per-user window
                                 volume stays constant; sfskew covers growth
                                 of a single partition key)

nation/region (join-consistent tiny dims) and documents/embeddings (own 100x
corpora) pass through at 1x. Per-table incremental skip like the other
corpus builders; bit-identical rebuild (no RNG).

Usage: [REL_COPIES=100] python tools/make_rel_corpus.py [out_dir=/tmp/sfrel100]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("REL_COPIES", "100"))

# domain -> (defining_table, defining_key)
DOMAIN_DEF = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
}

# table -> {column: domain}
TABLE_DOMAIN_COLS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
}


def build(spark, out_dir: str) -> None:
    from legate_pandas_spark.sources.tables import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    bases = {
        dom: load_table(spark, SRC, tbl).agg(F.max(key)).collect()[0][0] + 1
        for dom, (tbl, key) in DOMAIN_DEF.items()
    }
    print(f"domain bases: {bases}", file=sys.stderr)
    for name in TABLES:
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(path):
            continue
        df = load_table(spark, SRC, name)
        cols = TABLE_DOMAIN_COLS.get(name)
        if not cols:
            df.write.mode("overwrite").parquet(path)
            print(f"passthrough {name}: x1", file=sys.stderr)
            continue
        parts = []
        for i in range(COPIES):
            c = df
            for col, dom in cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * bases[dom]))
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(path)
        print(f"built {name}: x{COPIES}", file=sys.stderr)


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfrel100"
    from legate_pandas_spark.session import get_spark

    build(get_spark("make_rel_corpus"), out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
