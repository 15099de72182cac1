"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir, compare row count,
column names, and order-insensitive values (exact)."""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> list[tuple]:
    """Type-exact normalization: ints and floats are kept distinct (the
    driver's value hash is type-sensitive, so `527863281` != `527863281.0`).
    Only numpy scalars are unwrapped to the matching Python type."""
    cols = sorted(df.columns)
    rows = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if hasattr(v, "timestamp") and not isinstance(v, (int, float)):
                vals.append(("ts", v.isoformat()))
            elif isinstance(v, (bool,)) or type(v).__name__ == "bool_":
                vals.append(("bool", bool(v)))
            elif isinstance(v, float) or type(v).__name__.startswith("float"):
                fv = float(v)
                vals.append(("float", "NaN" if math.isnan(fv) else fv))
            elif isinstance(v, int) or type(v).__name__.startswith(("int", "uint")):
                vals.append(("int", int(v)))
            elif v is None:
                vals.append(("null", None))
            else:
                vals.append(("str", str(v)))
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


def main(sf_dir: str, only: list[str] | None = None):
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        ok_rows = len(spark_pdf) == len(duck_pdf)
        ok_cols = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        ok_vals = ok_rows and ok_cols and normalize(spark_pdf) == normalize(duck_pdf)
        status = "OK   " if (ok_rows and ok_cols and ok_vals) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(
            f"{status}{name}: rows {len(spark_pdf)}/{len(duck_pdf)} cols={ok_cols} "
            f"vals={ok_vals} [{time.time()-t0:.1f}s]"
        )
        if not ok_vals and ok_rows and ok_cols:
            a, b = normalize(spark_pdf), normalize(duck_pdf)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"      spark={x}\n      duck ={y}")
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(main(sf, only))
