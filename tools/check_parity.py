#!/usr/bin/env python3
"""Dev-only parity checker mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>/<name>/ and each entry in
oracle_sql.json: run the SQL in DuckDB with views for every table in sfDir,
normalize both frames (columns sorted by name, rows sorted), and diff.
"""
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    # stringify for robust compare (timestamps, floats already rounded)
    df = df.astype(str)
    rows = sorted(map(tuple, df.values.tolist()))
    return list(df.columns), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"MISSING RESULT {name}")
            n_bad += 1
            continue
        try:
            spark_cols, spark_rows = normalize(
                con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')"))
            ora_cols, ora_rows = normalize(con.sql(sql))
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
            continue
        if spark_cols != ora_cols:
            print(f"SCHEMA MISMATCH {name}: spark={spark_cols} oracle={ora_cols}")
            n_bad += 1
        elif spark_rows != ora_rows:
            print(f"ROW MISMATCH {name}: spark {len(spark_rows)} rows vs oracle {len(ora_rows)}")
            for i, (a, b) in enumerate(zip(spark_rows, ora_rows)):
                if a != b:
                    print(f"  first diff at {i}: spark={a} oracle={b}")
                    break
            else:
                k = min(len(spark_rows), len(ora_rows))
                print(f"  prefix equal; extra: spark={spark_rows[k:k+2]} oracle={ora_rows[k:k+2]}")
            n_bad += 1
        else:
            n_ok += 1
            print(f"OK {name} ({len(spark_rows)} rows)")
    # rows-only entries (no oracle)
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as e:
                print(f"ROWS-ONLY {name}: ERROR {e}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
