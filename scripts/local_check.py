#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/local_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<query>/ parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, then compares:
column names (sorted), row counts, and cell values (rows sorted, floats
compared exactly after float() coercion).
"""
import sys, json, glob, math, os
import duckdb

def norm(v):
    # always a (tag, payload) tuple so mixed null/str/num columns still sort
    if v is None:
        return ('_', '')
    if isinstance(v, bool):
        return ('b', v)
    if isinstance(v, float):
        return ('f', repr(v))
    if isinstance(v, int):
        return ('i', v)
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ('f', repr(float(v)))
    if isinstance(v, datetime.datetime):
        return ('t', v.isoformat())
    if isinstance(v, list):
        return ('l', tuple(norm(x) for x in v))
    return ('s', str(v))

def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    n_pass = n_fail = n_noracle = 0
    # Output-type gate (VERDICT r15 #2): the driver hashes SERIALIZED
    # results, so an oracle projecting HUGEINT/DECIMAL(38) hash-reds
    # against Spark's INT64 even when every value matches. DESCRIBE is
    # data-free; fail here so the violation class can't re-enter.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracle_type_gate import gate as type_gate
    type_bad = set()
    for name, why in type_gate(con, oracles):
        print(f"FAIL  {name}: type gate: {why}")
        type_bad.add(name)
    n_fail += len(type_bad)
    for name in names:
        if name in type_bad:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
        if name not in oracles:
            print(f"NOORACLE {name}: rows={len(srows)}"); n_noracle += 1; continue
        try:
            duck_rel = con.sql(oracles[name])
            dcols, drows = duck_rel.columns, duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        sc, dc = sorted(scols), sorted([c.lower() for c in dcols])
        if sc != [c.lower() for c in sc] or sc != dc:
            print(f"FAIL  {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1; continue
        sidx = [scols.index(c) for c in sc]
        didx = [[c.lower() for c in dcols].index(c) for c in sc]
        s_sorted = sorted(tuple(norm(r[i]) for i in sidx) for r in srows)
        d_sorted = sorted(tuple(norm(r[i]) for i in didx) for r in drows)
        if s_sorted != d_sorted:
            bad = next(i for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark={s_sorted[bad]}")
            print(f"      duck ={d_sorted[bad]}")
            n_fail += 1; continue
        print(f"PASS  {name}: rows={len(srows)}")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
