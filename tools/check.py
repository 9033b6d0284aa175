#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers the testdata parquet tables as DuckDB views, runs each oracle
SQL from <verifyOutDir>/oracle_sql.json, and compares (column-name-sorted,
row-sorted) against the Spark-written parquet in <verifyOutDir>/<name>/.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sort across dtypes; keep values for comparison
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, oracle_df):
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"COLUMNS differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT differ: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        # The driver hashes string renderings: an integer column on one side
        # and a float on the other ("123" vs "123.0") fails there even when
        # values are numerically equal (DuckDB HUGEINT -> pandas float64).
        a_float = np.issubdtype(a[c].dtype, np.floating)
        b_float = np.issubdtype(b[c].dtype, np.floating)
        if a_float != b_float:
            return (f"DTYPE-MIX col={c}: spark={a[c].dtype} oracle={b[c].dtype}"
                    " (driver string-hash sees '123' vs '123.0' -- CAST the oracle sum AS BIGINT)")
        if a_float or b_float:
            af = av.astype(float); bf = bv.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            exact = (af == bf) | both_nan
            if not exact.all():
                close = np.isclose(af, bf, rtol=1e-12, atol=1e-12) | both_nan
                n_bad = int((~exact).sum())
                worst = np.nanmax(np.abs(af - bf))
                tag = "FLOAT-CLOSE-BUT-NOT-EXACT" if close.all() else "VALUES differ"
                return f"{tag} col={c} n={n_bad} maxabsdiff={worst}"
        else:
            eq = pd.Series(av).astype(str).values == pd.Series(bv).astype(str).values
            if not eq.all():
                i = int(np.argmax(~eq))
                return f"VALUES differ col={c} n={int((~eq).sum())} first: spark={av[i]!r} oracle={bv[i]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
