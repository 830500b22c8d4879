"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given scale factor, compare row count + schema + order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [name ...]"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _arr_str(v) -> str:
    """Engine-neutral stringification of an array value: NULL-safe
    (a NULL array must read as a comparable token, not crash the whole
    gate), and numpy arrays go through .tolist() so elements repr as
    plain python scalars — under numpy >= 2, list(ndarray) yields
    np.int64(1)-style reprs that would false-fail against the Spark
    side's plain lists."""
    if v is None:
        return NULL_SENTINEL
    if isinstance(v, np.ndarray):
        v = v.tolist()
    return str(list(v))


#: collision-proof NULL sentinel — contains \x00, which no genuine
#: string value in either engine's textual output carries, so a real
#: NULL-vs-'NULL'-string divergence cannot false-pass the parity gate
#: (ADVICE r10)
NULL_SENTINEL = "\x00__NULL__"


def _null_token(v):
    """Canonical missing-value token for object columns: Spark's
    toPandas yields None where duckdb's fetchdf yields float NaN for
    the SAME NULL — astype(str) would compare 'None' vs 'nan' and
    false-fail every NULL-bearing row (surfaced by the r10 dirty-data
    sweep). The sentinel is outside the data alphabet so a genuine
    'NULL' string stays distinguishable from SQL NULL."""
    try:
        if v is None or (np.isscalar(v) and pd.isna(v)):
            return NULL_SENTINEL
    except (TypeError, ValueError):
        pass
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:  # lists/arrays aren't sortable; stringify
        if df[col].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[col] = df[col].map(_arr_str)
        if df[col].dtype == object:
            df[col] = df[col].map(_null_token)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for col in a.columns:  # dtype drift is a driver-hash risk: surface it
        if str(a[col].dtype) != str(b[col].dtype):
            problems.append(
                f"col {col}: dtype spark={a[col].dtype} duck={b[col].dtype} (warning)"
            )
    if len(a) != len(b):
        return problems
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            eq = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
            if not eq:
                close = np.allclose(av.astype(float), bv.astype(float), rtol=1e-9, equal_nan=True)
                problems.append(f"col {col}: float mismatch (close={close})")
        else:
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                problems.append(f"col {col}: value mismatch")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from gamma_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only check, {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(spark_pdf)} rows)")
    spark.stop()
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
