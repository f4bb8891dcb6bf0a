"""Skew-corpus wall-time tracker (round-11, VERDICT r10 Next #6).

The Zipf-skew gate (/tmp/sfskew, tools/make_skew_corpus.py) is
correctness-only; wall time under hot keys is exactly where plans regress
SILENTLY — an AQE skew split that stops firing, a salted join that
de-salts, a basket cap edited away all stay green while their skew cost
explodes. This benches the skew-sensitive tracked set at /tmp/sfskew
(bench.py protocol: input page-cache warm-up, best-of-3 interleaved
passes) and writes skew_bench_results.json; SCALE.md carries the
round-over-round table.

Usage: python tools/skew_bench.py [skew_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the skew-sensitive tracked set: hot-key join, hot-group agg, the mortgage
# multi-stage pipeline (partitioning reuse under skew), and the two
# basket-cap consumers (C(k,2) densification guard)
TRACKED = [
    "join_multikey",
    "groupby_multi_agg",
    "pd_mortgage_style_pipeline",
    "triangle_count_copurchase",
    "market_basket_pairs",
]


def main() -> int:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    if not os.path.isdir(skew_dir):
        print(
            f"skew corpus missing at {skew_dir} — build it with "
            "`python tools/make_skew_corpus.py`",
            file=sys.stderr,
        )
        return 2
    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("skew_bench")

    for root, _dirs, files in os.walk(skew_dir):  # page-cache warm-up, untimed
        for fn in files:
            try:
                with open(os.path.join(root, fn), "rb") as f:
                    while f.read(1 << 22):
                        pass
            except OSError:
                pass

    import random

    timings: dict[str, float] = {}
    for i in range(3):
        order = TRACKED[:]
        random.Random(2000 + i).shuffle(order)
        for name in order:
            t0 = time.time()
            QUERIES[name](spark, skew_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.time() - t0
            if name not in timings or el < timings[name]:
                timings[name] = el
    result = {
        "metric": "skew_query_wall_time",
        "unit": "sec",
        "skew_dir": skew_dir,
        "queries": {n: round(t, 3) for n, t in timings.items()},
        "value": round(sum(timings.values()), 3),
    }
    line = json.dumps(result)
    print(line)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "skew_bench_results.json",
    )
    with open(out, "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
