import duckdb, json, sys, glob

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_sf0.001'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.001'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"create view {t} as select * from read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); continue
    try:
        files = glob.glob(f'{outdir}/{name}/*.parquet')
        got = con.execute(f"select * from read_parquet({files!r})".replace('[','[').replace(']',']')).fetchdf() if files else None
        if got is None: print(f"{name}: NO SPARK OUTPUT"); continue
    except Exception as e:
        print(f"{name}: read error {e}"); continue
    ec = sorted(exp.columns); gc = sorted(got.columns)
    if ec != gc:
        print(f"{name}: COLUMN MISMATCH oracle={ec} spark={gc}"); continue
    exp = exp[ec].sort_values(ec, na_position='first').reset_index(drop=True)
    got = got[ec].sort_values(ec, na_position='first').reset_index(drop=True)
    if len(exp) != len(got):
        print(f"{name}: ROWCOUNT oracle={len(exp)} spark={len(got)}"); continue
    ok = True
    for c in ec:
        a, b = exp[c], got[c]
        if not a.equals(b):
            try:
                import numpy as np
                if np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True): continue
            except Exception: pass
            print(f"{name}: VALUE MISMATCH col {c}")
            mism = (a != b) & ~(a.isna() & b.isna())
            print("  oracle:", a[mism].head(3).tolist(), " spark:", b[mism].head(3).tolist())
            ok = False
    if ok: print(f"{name}: OK rows={len(exp)}")
