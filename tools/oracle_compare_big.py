import duckdb, json, sys, glob, os

# Value-level oracle compare for QUERY OUTPUTS TOO BIG FOR PANDAS
# (the sf1 ladder's fixed-cardinality quadratics: q_block_equi /
# q_pairs_assembly emit 202M pair rows at sf1, q_scoring 94M — the
# standard tools/oracle_compare.py sorts both frames in pandas, which
# would need tens of GB per side). This variant never materializes a
# row: both sides are reduced INSIDE DuckDB to
#   (count(*), sum(hash(col1, col2, ...)))
# an order-independent checksum over every row's every column, so a
# single differing value flips the sum while streaming in bounded
# memory. Weaker than the sorted compare only for exotic multiset
# collisions (two wrong rows whose 64-bit hashes cancel); columns are
# name-aligned first so schema drift still fails loudly.
#
# Floats are rounded to 9 significant-ish decimals before hashing
# (round(x, 9)) on BOTH sides — the sorted compare's np.allclose has
# no streaming analogue; queries whose floats differ below 1e-9 are
# out of scope here (the three giants are integer/string-only).
#
# Usage: oracle_compare_big.py <verify_outdir> <sfdir> q_a,q_b,...

outdir, sfdir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(',')
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    path = f'{sfdir}/{t}.parquet'
    if os.path.isdir(path):
        path = f'{path}/*.parquet'
    con.execute(f"create view {t} as select * from read_parquet('{path}')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
failures = 0
for name in names:
    sql = oracle.get(name)
    if sql is None:
        print(f"{name}: NO ORACLE SQL"); failures += 1; continue
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); failures += 1; continue
    spark_rel = con.sql(f"select * from read_parquet({files!r})")
    oracle_rel = con.sql(sql)
    scols, ocols = sorted(spark_rel.columns), sorted(oracle_rel.columns)
    if scols != ocols:
        print(f"{name}: COLUMN MISMATCH oracle={ocols} spark={scols}")
        failures += 1; continue
    def digest(rel, cols, src):
        types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        exprs = []
        for c in cols:
            t = types[c]
            if t in ('FLOAT', 'DOUBLE'):
                exprs.append(f'round("{c}", 9)')
            else:
                exprs.append(f'"{c}"')
        q = f"select count(*) n, sum(hash({', '.join(exprs)})) h from ({src})"
        return con.execute(q).fetchone()
    sn, sh = digest(spark_rel, scols, f"select * from read_parquet({files!r})")
    on, oh = digest(oracle_rel, ocols, sql)
    if sn != on:
        print(f"{name}: ROWCOUNT oracle={on} spark={sn}"); failures += 1
    elif sh != oh:
        print(f"{name}: CHECKSUM MISMATCH rows={sn} oracle_h={oh} spark_h={sh}")
        failures += 1
    else:
        print(f"{name}: OK rows={sn} (checksum)")
if failures:
    print(f"FAILURES: {failures}")
    sys.exit(1)
