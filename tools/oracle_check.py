"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle side-by-side at a given
scale factor, compares row count, column names/dtypes, and an order-insensitive
value comparison (column-name-sorted, row-sorted). Exit code 0 iff all match.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    # dtype-family check (mirror a strict driver schema compare): int vs float
    # disagreements are flagged even when the values coincide
    for c in sc:
        ka, kb = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        fam = lambda k: {"i": "num_i", "u": "num_i", "f": "num_f", "b": "bool"}.get(k, "obj")
        if fam(ka) != fam(kb) and not (len(spark_pdf) == 0 or len(duck_pdf) == 0):
            problems.append(f"dtype family {c!r}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}")
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            eq = ((av - bv).abs() < 1e-9) | (av.isna() & bv.isna())
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
        if not bool(eq.all()):
            bad = (~eq).idxmax()
            problems.append(
                f"col {c!r}: first mismatch row {bad}: spark={a[c][bad]!r} duck={b[c][bad]!r}"
                f" ({int((~eq).sum())} rows differ)"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from legate_pandas_spark.operators import (
        QUERIES,
        ORACLES,
        ORACLE_OVERRIDES,
        load_all,
    )
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("oracle_check")

    con = duckdb.connect()
    # Bound the in-process DuckDB side (round-10): at the 100x-documents
    # corpus, one oracle's hash join ballooned the gate process to 99 GB
    # anon RSS and the kernel OOM-killed it — which presents as a SILENT
    # mid-run death (the round-9 "3-JVM" incident was this, not JVM count).
    # A memory cap + spill dir turns that into a slow (or cleanly failing)
    # query instead of a dead gate.
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_DUCK_MEM', '24GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    from legate_pandas_spark.sources.tables import TABLES

    for t in TABLES:
        # Spark writes tables as DIRECTORIES of part files (the synthetic
        # scale corpora); the driver testdata is single files — glob both
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")

    failures = []
    results: dict = {}
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "FAIL", "err": f"spark error: {exc}"[:300]}
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in ORACLES:
            results[name] = {"status": "ROWS", "rows": len(spark_pdf)}
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        oracle_sql, routed = ORACLES[name], False
        if name in ORACLE_OVERRIDES:
            # corpus-dependent plan routing (e.g. the blocked-cosine exact→LSH
            # cutover): gate the regime that actually ran with the oracle that
            # matches its semantics, and record the swap in the artifact
            alt = ORACLE_OVERRIDES[name](spark, sf_dir)
            if alt is not None:
                oracle_sql, routed = alt, True
        try:
            duck_pdf = con.execute(oracle_sql).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "FAIL", "err": f"duckdb error: {exc}"[:300]}
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = compare(spark_pdf, duck_pdf)
        tag = " [routed oracle]" if routed else ""
        if problems:
            failures.append(name)
            results[name] = {"status": "FAIL", "err": "; ".join(problems)[:300]}
            if routed:
                results[name]["routed_oracle"] = True
            print(f"FAIL  {name}{tag} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            results[name] = {"status": "OK", "rows": len(spark_pdf)}
            if routed:
                results[name]["routed_oracle"] = True
            print(f"OK    {name}: {len(spark_pdf)} rows{tag} [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    # Structured artifact (committed per round so the full-gate result — not
    # just the driver's 50-query sample — is reviewable): only written for
    # FULL runs, a filtered run would clobber it with a partial picture —
    # unless ORACLE_SUBSET_OUT names an explicit path (the table-subset gate
    # corpora: 100×-documents / 100×-embeddings carry only their scaled
    # table's query family, so their artifacts ARE subset runs by design).
    subset_out = os.environ.get("ORACLE_SUBSET_OUT")
    if not only or subset_out:
        import json

        out = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_ok": sum(1 for r in results.values() if r["status"] == "OK"),
            "n_rows_only": sum(1 for r in results.values() if r["status"] == "ROWS"),
            "n_fail": len(failures),
            "failures": failures,
            "results": results,
        }
        if only:
            out["note"] = os.environ.get(
                "ORACLE_SUBSET_NOTE",
                "table-subset gate run (see sf_dir): only the scaled table's "
                "query family is meaningful on this corpus",
            )
        path = subset_out or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "oracle_full_results.json",
        )
        try:
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
        except OSError:
            pass
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
