#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the sfDir parquet tables, and compares: row count, schema (column
names sorted), and a value hash over rows sorted by all columns.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Driver-faithful: sort RAW cells (the driver's canonicalizer does
    # not stringify first, so array/map/struct cells crash sort_values
    # with "unhashable type" — that crash is the real signal; round 18
    # hid it here with an astype(str) patch and shipped two queries the
    # driver ERR'd on). Complex output columns are now banned at build
    # time (RegistrySchemaLintSpec) and at dump time (Verify lints);
    # this replica must crash exactly where the driver would.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    # str(), not repr(): pandas Timestamp vs datetime.date stringify
    # identically when the values match, mirroring the driver compare.
    for row in df.astype(str).itertuples(index=False):
        h.update(("|".join(row)).encode())
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            oracle_df = canon(con.sql(sql).df())
            rows = len(spark_df) == len(oracle_df)
            schema = list(spark_df.columns) == list(oracle_df.columns)
            hmatch = rows and schema and value_hash(spark_df) == value_hash(oracle_df)
            status = "OK  " if (rows and schema and hmatch) else "FAIL"
            if status == "FAIL":
                fails += 1
            print(f"{status} {name}: rows={len(spark_df)}/{len(oracle_df)} "
                  f"schema={schema} hash={hmatch}")
            if not schema:
                print(f"     spark : {list(spark_df.columns)}")
                print(f"     oracle: {list(oracle_df.columns)}")
            elif not hmatch and rows:
                for c in spark_df.columns:
                    if not spark_df[c].astype(str).equals(oracle_df[c].astype(str)):
                        s, o = spark_df[c], oracle_df[c]
                        idx = (s.astype(str) != o.astype(str)).idxmax()
                        print(f"     col {c} differs first at row {idx}: "
                              f"spark={s[idx]!r} oracle={o[idx]!r} "
                              f"(dtypes {s.dtype}/{o.dtype})")
        except Exception as e:
            fails += 1
            print(f"ERR  {name}: {e}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
