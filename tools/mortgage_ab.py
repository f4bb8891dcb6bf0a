"""A/B harness for pd_mortgage_e2e_full perf work (bench-methodology
replica: warm-up at sf0.001, then best-of-3 timed passes at sf0.1 without
cache clearing, noop sink)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("mortgage-ab")
    name = sys.argv[1] if len(sys.argv) > 1 else "pd_mortgage_e2e_full"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    best = None
    for i in range(3):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        print(f"pass {i}: {el:.2f}s")
        best = el if best is None or el < best else best
    print(f"BEST {name}: {best:.2f}s")


if __name__ == "__main__":
    main()
