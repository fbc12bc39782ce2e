import duckdb, json, sys, glob, os

# Compares Spark parquet dumps (graft.Verify output) against the DuckDB
# oracle SQL, the way the driver does — but STRICTER on dtypes: the driver
# hashes stringified values, so an integer column that DuckDB returns as
# HUGEINT/DECIMAL (-> pandas float64, "42.0") vs Spark's int64 ("42") is a
# driver-side hash mismatch even when the values are numerically equal.
# Round 7 shipped four such rows (q_calibration, q_label_agreement,
# q_novelty, q_vocab_coverage) that were green here and red in the driver;
# this tool now treats int-vs-float dtype skew as a hard failure.
# Exits 1 if any query fails, so it can gate commits.

args = [a for a in sys.argv[1:] if a != '--materialize-ctes']
# --materialize-ctes: rewrite every CTE to `AS MATERIALIZED (...)`.
# DuckDB inlines CTEs referenced more than once, so the chained-CTE
# graph oracles (q_hits, q_pagerank, ...) recompute each round's
# predecessor 2-3x per round — q_hits at sf1 measured 75 min inlined
# vs minutes materialized. Semantics are identical (MATERIALIZED is
# an optimizer fence, not a rewrite); used for the sf1 ladder sweep.
materialize = '--materialize-ctes' in sys.argv[1:]
outdir = args[0] if len(args) > 0 else '/tmp/verify_sf0.001'
sfdir = args[1] if len(args) > 1 else '/root/testdata/sf0.001'
only = set(args[2].split(',')) if len(args) > 2 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    # Driver-written tables are single files; Spark-written fixtures (the
    # sf1 scale ladder under /tmp/graft_scale_sf1) are DIRECTORIES named
    # *.parquet holding part files — glob those for DuckDB.
    path = f'{sfdir}/{t}.parquet'
    if os.path.isdir(path):
        path = f'{path}/*.parquet'
    con.execute(f"create view {t} as select * from read_parquet('{path}')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
failures = 0
def fail(msg):
    global failures
    failures += 1
    print(msg)
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    if materialize:
        # `AS (` opens either a CTE body or a named-WINDOW clause in
        # these oracles (column aliases are `AS name`, derived tables
        # are `) alias`) — rewrite all (case-insensitively, tolerating
        # a newline before the paren), then undo the WINDOW ones.
        import re as _re
        sql = _re.sub(r'\b(AS)\s*\(', r'\1 MATERIALIZED (', sql, flags=_re.IGNORECASE)
        # Undo inside WINDOW clauses, including multi-window
        # `WINDOW w1 AS (...), w2 AS (...)`. A regex with a fixed
        # nesting budget mis-parses deeply-parenthesized specs (e.g.
        # PARTITION BY abs(floor(x/25))), so scan each WINDOW clause
        # with a balanced-paren walk instead: the clause runs from the
        # keyword to the first depth-0 clause terminator (ORDER/LIMIT/
        # set-op/semicolon) or the enclosing subquery's closing paren;
        # every `AS MATERIALIZED (` inside it reverts to `AS (`.
        _term = _re.compile(r'(ORDER|LIMIT|UNION|EXCEPT|INTERSECT)\b', _re.IGNORECASE)
        _kw = _re.compile(r'\bWINDOW\b', _re.IGNORECASE)
        pos = 0
        while True:
            m = _kw.search(sql, pos)
            if not m:
                break
            start, depth, end = m.end(), 0, len(sql)
            j = start
            while j < len(sql):
                ch = sql[j]
                if ch == '(':
                    depth += 1
                elif ch == ')':
                    if depth == 0:
                        end = j
                        break
                    depth -= 1
                elif ch == ';' and depth == 0:
                    end = j
                    break
                elif depth == 0 and (j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == '_')) \
                        and _term.match(sql, j):
                    end = j
                    break
                j += 1
            fixed = _re.sub(r'\b(AS)\s+MATERIALIZED\s*\(', r'\1 (', sql[start:end],
                            flags=_re.IGNORECASE)
            sql = sql[:start] + fixed + sql[end:]
            pos = start + len(fixed)
    try:
        rel = con.sql(sql)
        ducktypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        exp = rel.fetchdf()
    except Exception as e:
        fail(f"{name}: ORACLE SQL ERROR: {e}"); continue
    # Driver-portability check: every oracle output column must be a type
    # whose pandas rendering matches the Spark parquet dtype exactly.
    widetypes = {c: t for c, t in ducktypes.items()
                 if t in ('HUGEINT', 'UHUGEINT') or t.startswith('DECIMAL')}
    if widetypes:
        fail(f"{name}: WIDE ORACLE TYPE (cast to BIGINT in the SQL): {widetypes}")
        continue
    try:
        files = glob.glob(f'{outdir}/{name}/*.parquet')
        got = con.execute(f"select * from read_parquet({files!r})").fetchdf() if files else None
        if got is None: fail(f"{name}: NO SPARK OUTPUT"); continue
    except Exception as e:
        fail(f"{name}: read error {e}"); continue
    ec = sorted(exp.columns); gc = sorted(got.columns)
    if ec != gc:
        fail(f"{name}: COLUMN MISMATCH oracle={ec} spark={gc}"); continue
    exp = exp[ec].sort_values(ec, na_position='first').reset_index(drop=True)
    got = got[ec].sort_values(ec, na_position='first').reset_index(drop=True)
    if len(exp) != len(got):
        fail(f"{name}: ROWCOUNT oracle={len(exp)} spark={len(got)}"); continue
    ok = True
    import numpy as np
    for c in ec:
        a, b = exp[c], got[c]
        afloat = np.issubdtype(a.dtype, np.floating)
        bfloat = np.issubdtype(b.dtype, np.floating)
        if afloat != bfloat:
            print(f"{name}: DTYPE MISMATCH col {c} oracle={a.dtype} spark={b.dtype} "
                  f"(driver hashes '42.0' != '42' — align the types)")
            ok = False
            continue
        if not a.equals(b):
            try:
                if afloat and bfloat and np.allclose(a, b, rtol=0, atol=0, equal_nan=True):
                    continue
                # int32 vs int64 etc: same stringified values driver-side.
                if (not afloat and not bfloat
                        and np.issubdtype(a.dtype, np.integer)
                        and np.issubdtype(b.dtype, np.integer)
                        and np.array_equal(a.to_numpy(np.int64), b.to_numpy(np.int64))):
                    continue
            except Exception: pass
            print(f"{name}: VALUE MISMATCH col {c}")
            mism = (a != b) & ~(a.isna() & b.isna())
            print("  oracle:", a[mism].head(3).tolist(), " spark:", b[mism].head(3).tolist())
            ok = False
    if ok: print(f"{name}: OK rows={len(exp)}")
    else: failures += 1
if failures:
    print(f"FAILURES: {failures}")
    sys.exit(1)
