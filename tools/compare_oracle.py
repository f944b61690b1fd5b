#!/usr/bin/env python3
"""Strict DuckDB oracle compare replicating the round driver's gate.

Usage: python3 tools/compare_oracle.py <sf_dir> <verify_out_dir> [only,names]
Prints one line per oracled query; exits nonzero if any strict mismatch
other than the tolerated None-vs-nan NULL rendering.
"""
import duckdb, json, glob, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(os.path.join(sf, '*.parquet')):
    con.execute(f"CREATE VIEW {os.path.basename(f).replace('.parquet','')} AS SELECT * FROM '{f}'")
oracle = json.load(open(os.path.join(out, 'oracle_sql.json')))
import pyarrow.parquet as pq
bad = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pf = sorted(glob.glob(f'{out}/{name}/*.parquet'))
    if not pf:
        print(f'{name:28s} NO SPARK OUTPUT'); bad.append(name); continue
    # read EVERY part file — a multi-part dump compared via part 0 alone
    # would silently pass a partial frame (ADVICE r12)
    import pyarrow as pa
    s = pa.concat_tables([pq.read_table(f) for f in pf]).to_pandas()
    try:
        d = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name:28s} ORACLE SQL ERROR: {e}'); bad.append(name); continue
    s = s[sorted(s.columns)].reset_index(drop=True)
    d = d[sorted(d.columns)].reset_index(drop=True)
    eq = s.shape == d.shape and list(s.columns) == list(d.columns)
    if eq:
        for c in s.columns:
            a = s[c].astype(str).tolist(); b = d[c].astype(str).tolist()
            if a != b:
                # tolerated: NULL-rendering drift only, and only where BOTH
                # sides are pandas-null — a genuine string value 'None'/'nan'
                # mismatching a NULL must FAIL (ADVICE r12)
                na_a = s[c].isna().tolist(); na_b = d[c].isna().tolist()
                ok = all(x == y or (pa_ and pb_)
                         for x, y, pa_, pb_ in zip(a, b, na_a, na_b))
                if not ok:
                    eq = False
                    ia = next(i for i, (x, y, pa_, pb_) in
                              enumerate(zip(a, b, na_a, na_b))
                              if x != y and not (pa_ and pb_))
                    print(f'  {name} col {c} row {ia}: spark={a[ia]!r} duck={b[ia]!r}')
                    break
    print(f'{name:28s} rows {len(s)}/{len(d)} match={eq}')
    if not eq:
        bad.append(name)
print(f'--- {len(bad)} mismatches: {bad}')
sys.exit(1 if bad else 0)
