#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: run each
oracle SQL on the sf parquet tables, compare with the Spark result parquet
(columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        rows.append("|".join(repr(v) for v in row))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
            ignore_index=True)
        duck_df = con.execute(sql).fetchdf()
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            fails += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            fails += 1
            continue
        hs, hd = canon(spark_df), canon(duck_df)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(spark_df)} rows)")
            # show first diff
            a = spark_df.reindex(sorted(spark_df.columns), axis=1).sort_values(s_cols).reset_index(drop=True)
            b = duck_df.reindex(sorted(duck_df.columns), axis=1).sort_values(d_cols).reset_index(drop=True)
            for i in range(min(len(a), 200000)):
                if not a.iloc[i].equals(b.iloc[i]):
                    print("  spark:", dict(a.iloc[i]))
                    print("  duck :", dict(b.iloc[i]))
                    break
            fails += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1

rows_only = [n for n in glob.glob(f"{out_dir}/*") if n.split("/")[-1] not in oracle
             and not n.endswith(".json")]
for n in sorted(rows_only):
    name = n.split("/")[-1]
    try:
        df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{n}/*.parquet"))],
                       ignore_index=True)
        print(f"ROWS {name}: {len(df)} rows (no oracle)")
    except Exception as e:
        print(f"ERROR {name}: {e}")

sys.exit(1 if fails else 0)
