"""Interleaved A/B of runtime-settable SQL confs (round-12 measurement aid).

Within ONE session, alternate conf variants per query pass (A,B,A,B,...) so
machine drift hits both variants equally; report per-query medians.

Usage: python tools/ab_conf_r12.py "k=v,k=v" "k=v,k=v" query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse(s: str) -> dict:
    out = {}
    for kv in s.split(","):
        if kv:
            k, v = kv.split("=", 1)
            out[k] = v
    return out


def main() -> int:
    conf_a, conf_b = parse(sys.argv[1]), parse(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))

    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("ab_conf_r12")

    def run(name, conf):
        for k, v in conf.items():
            spark.conf.set(k, v)
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both variants once (codegen both plan shapes)
    for name in names:
        run(name, conf_a)
        run(name, conf_b)

    res = {n: {"a": [], "b": []} for n in names}
    for _ in range(rounds):
        for name in names:
            res[name]["a"].append(run(name, conf_a))
            res[name]["b"].append(run(name, conf_b))
    for name in names:
        ma = statistics.median(res[name]["a"])
        mb = statistics.median(res[name]["b"])
        print(
            f"{name:38s} A {ma:6.3f}  B {mb:6.3f}  B/A {mb / ma:5.2f}"
            f"   (a={[round(x,2) for x in res[name]['a']]},"
            f" b={[round(x,2) for x in res[name]['b']]})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
