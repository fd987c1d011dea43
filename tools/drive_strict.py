"""Strict driver simulation: run registry keys Spark-vs-DuckDB with the
SAME canonicalization discipline the spark-graft driver uses, plus a
repr-level hash that catches IEEE -0.0 and dtype drift.

Usage:
    python tools/drive_strict.py q_key1 q_key2 ...   # specific keys
    python tools/drive_strict.py --all               # whole oracled registry
    python tools/drive_strict.py --fresh50           # projected driver window
    python tools/drive_strict.py --rows-only         # rows-only keys (the
        driver still executes + canonicalizes these; a crash or a
        complex-typed column would be a red CORRECTNESS row)

Exit nonzero on any mismatch. Two canonicalizers are applied:

1. driver-style: ``df.sort_values(by=all_columns)`` over RAW values — this
   is what the real driver does, and it dies with "unhashable type:
   numpy.ndarray" on Array/Map/Struct-typed columns (r3's only red row,
   q_text_boilerplate). Running it here means complex-typed outputs fail
   in-repo, before the driver ever sees them.
2. strict repr-hash: sort columns by name, repr each row tuple, sort, hash.
   repr('-0.0') != repr('0.0'), so negative-zero drift is caught even when
   float equality would pass.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def vhash(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    lines = sorted(repr(tuple(r)) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def driver_canon(df):
    """The driver's canonicalization step: raises on unsortable cells."""
    if len(df.columns):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(argv: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    queries, oracles = e.queries(), e.oracle_sql()
    rows_only_mode = bool(argv) and argv[0] == "--rows-only"
    if argv and argv[0] == "--all":
        keys = [k for k in queries if k in oracles]
    elif argv and argv[0] == "--fresh50":
        # The REAL driver window: the first 50 keys of queries() dict
        # order INCLUDING rows-only keys (the driver executes those too
        # and records a rows-only row — a crash or complex-typed column
        # there is a red CORRECTNESS row). Filtering to oracled keys
        # first would skip exactly the keys whose only pre-driver check
        # is this tool, while simulating keys outside the window.
        keys = list(queries)[:50]
    elif rows_only_mode:
        keys = [k for k in queries if k not in oracles]
    else:
        keys = argv
    if not keys:
        print("no keys given (use --all, --fresh50, --rows-only, or key names)")
        return 2

    failures = 0
    for name in keys:
        try:
            sdf = queries[name](spark, sf).toPandas()
            # Driver-style canonicalization must not raise (complex types).
            driver_canon(sdf)
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                driver_canon(odf)
                ok = (
                    len(sdf) == len(odf) and vhash(sdf) == vhash(odf) and len(sdf) > 0
                )
                print(f"{name}: rows {len(sdf)}/{len(odf)} strict_ok={ok}", flush=True)
            else:  # rows-only: executes + canonicalizes, rows recorded
                ok = len(sdf) > 0
                print(f"{name}: rows {len(sdf)} rows_only_ok={ok}", flush=True)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            ok = False
        failures += not ok
    print(f"checked={len(keys)} failed={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
