"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count, column names, and order-insensitive
values (exact; floats bit-compared after float64 normalization).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns: spark={sorted(got.columns)} duck={sorted(exp.columns)}"]
    if len(got) != len(exp):
        problems.append(f"rows: spark={len(got)} duck={len(exp)}")
        return problems
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv):
            a, b = gv.to_numpy(), ev.to_numpy()
            bad = ~((a == b) | (np.isnan(a) & np.isnan(b)))
            if bad.any():
                i = int(np.where(bad)[0][0])
                problems.append(f"col {c}: {bad.sum()} diffs, e.g. {a[i]!r} vs {b[i]!r} (row {i})")
        else:
            neq = ~(gv.eq(ev) | (gv.isna() & ev.isna()))
            if neq.any():
                i = int(np.where(neq.to_numpy())[0][0])
                problems.append(f"col {c}: {neq.sum()} diffs, e.g. {gv[i]!r} vs {ev[i]!r} (row {i})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # thread the sf dir into data-dependent oracles (ivf_trained trains
    # its centroids from the compared tables); assignment, not
    # setdefault — a stale exported value must not silently train the
    # oracle on a different dir than the one being compared
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from gmql_spark.session import get_spark

    spark = get_spark(8, app_name="check-entry", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
