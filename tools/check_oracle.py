import duckdb, json, glob, os, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracles = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracles.items()):
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{out}/{name}/*.parquet")], ignore_index=True)
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"duckdb error: {e}")); continue
    # driver-like compare: sort columns by name, sort rows, compare values
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        bad.append((name, f"columns: spark={list(s.columns)} duck={list(d.columns)}")); continue
    if len(s) != len(d):
        bad.append((name, f"rows: spark={len(s)} duck={len(d)}")); continue
    s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True).astype(str)
    d2 = d.sort_values(by=list(d.columns)).reset_index(drop=True).astype(str)
    if s2.equals(d2):
        ok.append(name)
    else:
        diff = (s2 != d2).any(axis=1)
        ex = pd.concat([s2[diff].head(3).add_prefix("s_"), d2[diff].head(3).add_prefix("d_")], axis=1)
        bad.append((name, f"value mismatch ({diff.sum()} rows)\n{ex}"))
print("OK:", ok)
for name, msg in bad:
    print(f"\n=== FAIL {name}: {msg}")
# rows-only entries
for name in sorted(os.listdir(out)):
    if name != "oracle_sql.json" and name not in oracles:
        n = sum(len(pd.read_parquet(p)) for p in glob.glob(f"{out}/{name}/*.parquet"))
        print(f"rows-only {name}: {n} rows")
