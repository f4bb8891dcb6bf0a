"""Interleaved A/B of the binary-search bucket_of vs the filter-HOF form.

Within ONE session, alternate SPARK_GRAFT_BSEARCH_BUCKET per pass (A=kernel,
B=expression) so machine drift hits both variants equally; report per-query
medians. Both variants are oracle-identical (see bucket_of), so this is a
pure performance comparison.

Usage: python tools/ab_bucket_r12.py query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))

    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("ab_bucket_r12")

    def run(name, kernel: bool):
        os.environ["SPARK_GRAFT_BSEARCH_BUCKET"] = "1" if kernel else "0"
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both variants once (codegen both plan shapes + build both caches)
    for name in names:
        run(name, True)
        run(name, False)

    res = {n: {"a": [], "b": []} for n in names}
    for _ in range(rounds):
        for name in names:
            res[name]["a"].append(run(name, True))
            res[name]["b"].append(run(name, False))
    for name in names:
        ma = statistics.median(res[name]["a"])
        mb = statistics.median(res[name]["b"])
        print(
            f"{name:38s} bsearch {ma:6.3f}  expr {mb:6.3f}  k/e {ma / mb:5.2f}"
            f"   (k={[round(x, 2) for x in res[name]['a']]},"
            f" e={[round(x, 2) for x in res[name]['b']]})"
        )
    os.environ.pop("SPARK_GRAFT_BSEARCH_BUCKET", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
