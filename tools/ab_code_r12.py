"""One-off interleaved A/B for code variants gated on SPARK_GRAFT_AB.

Like ab_kernel_r12.py, but clears the session cache before every timed pass
so a persist() in one variant cannot feed the other via CacheManager
plan-dedup. Usage: python tools/ab_code_r12.py query [query ...]
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
    spark = get_spark("ab_code_r12")

    def run(name, new: bool):
        os.environ["SPARK_GRAFT_AB"] = "1" if new else "0"
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

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
            f"{name:38s} new {ma:6.3f}  old {mb:6.3f}  n/o {ma / mb:5.2f}"
            f"   (n={[round(x, 2) for x in res[name]['a']]},"
            f" o={[round(x, 2) for x in res[name]['b']]})"
        )
    os.environ.pop("SPARK_GRAFT_AB", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
