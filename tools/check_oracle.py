# Local replica of the driver's correctness gate: run each oracle SQL in
# DuckDB over the sf parquet tables, compare to Verify's parquet output
# (columns sorted by name, values hashed after string normalization).
import duckdb, json, sys, glob, os
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf_dir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def norm(df):
    df = df[sorted(df.columns)]
    return [tuple(str(x) for x in row) for row in df.itertuples(index=False)]

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f'{out_dir}/{name}')
        want = con.execute(sql).df()
        g, w = norm(got), norm(want)
        if g == w:
            print(f'OK    {name} ({len(g)} rows)')
        else:
            fails += 1
            print(f'FAIL  {name}: spark {len(g)} rows vs duckdb {len(w)} rows')
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f'      first diff row {i}: spark={a} duckdb={b}')
                    break
    except Exception as e:
        fails += 1
        print(f'ERROR {name}: {e}')
print('FAILURES:', fails)
