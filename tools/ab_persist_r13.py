"""Cold interleaved A/B over SPARK_GRAFT_AB_PERSIST variants (round-13,
VERDICT r12 Next #4 — re-measure the r12 persist trades cold).

Clears the session cache before every timed pass so a persist() in one
variant cannot feed the other via CacheManager plan-dedup (same protocol as
ab_code_r12.py). Variant A is AB_A (default "" = current code), variant B is
AB_B (e.g. "nocp,noe0" = r11 no-persist form).

Usage: AB_B="nocp,noe0" AB_ROUNDS=5 python tools/ab_persist_r13.py q1 [q2 ...]
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
    val_a = os.environ.get("AB_A", "")
    val_b = os.environ.get("AB_B", "nocp,noe0")

    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("ab_persist_r13")

    def run(name, val):
        os.environ["SPARK_GRAFT_AB_PERSIST"] = val
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in names:  # codegen warm-up, both variants
        run(name, val_a)
        run(name, val_b)

    res = {n: {"a": [], "b": []} for n in names}
    for _ in range(rounds):
        for name in names:
            res[name]["a"].append(run(name, val_a))
            res[name]["b"].append(run(name, val_b))
    for name in names:
        ma = statistics.median(res[name]["a"])
        mb = statistics.median(res[name]["b"])
        print(
            f"{name:38s} A[{val_a or 'cur'}] {ma:6.3f}  B[{val_b}] {mb:6.3f}  a/b {ma / mb:5.2f}"
            f"   (a={[round(x, 2) for x in res[name]['a']]},"
            f" b={[round(x, 2) for x in res[name]['b']]})"
        )
    os.environ.pop("SPARK_GRAFT_AB_PERSIST", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
