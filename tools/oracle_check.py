#!/usr/bin/env python3
"""Replicates the driver's DuckDB-oracle comparison for local iteration.
Usage: python3 tools/oracle_check.py [voutDir] [sfDir]"""
import duckdb, json, sys
vout = sys.argv[1] if len(sys.argv) > 1 else '/tmp/vout'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['lineitem','documents','embeddings','events','orders','customer',
          'region','nation','part','supplier']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{vout}/oracle_sql.json'))
def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted([tuple(str(x) for x in r) for r in df.itertuples(index=False)])
    return cols, rows
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{vout}/{name}/*.parquet')").df()
        duck_df = con.execute(sql).df()
        sc, sr = norm(spark_df); dc, dr = norm(duck_df)
        if sc != dc: print(f"{name}: COLUMN MISMATCH spark={sc} duck={dc}"); fails += 1
        elif len(sr) != len(dr): print(f"{name}: ROWCOUNT {len(sr)} vs {len(dr)}"); fails += 1
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"{name}: VALUE MISMATCH e.g. {diff}"); fails += 1
        else: print(f"{name}: OK ({len(sr)} rows)")
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}"); fails += 1
sys.exit(1 if fails else 0)
