#!/usr/bin/env python3
"""Oracle output-type gate (VERDICT r15 "Next round" #2).

The driver's correctness gate hashes SERIALIZED results, so an oracle
whose projected column types differ from Spark's dump (INT64) can
hash-red even when every cell value is identical. That is exactly what
ate rounds 11-15: five oracles projected DuckDB HUGEINT (an uncast
sum(BIGINT)) while every driver-green oracle CASTs. This gate makes the
repo convention — "counts/ranks cast to BIGINT" — machine-enforced:
DESCRIBE every dumped oracle and FAIL on any projected HUGEINT /
UHUGEINT / DECIMAL(38,*) column. DESCRIBE binds without executing, so
the sweep is data-free and runs in milliseconds.

Usage:
  python3 scripts/oracle_type_gate.py <oracle_sql.json> <sf_dir>
  python3 scripts/oracle_type_gate.py --selftest
"""
import sys, json, os, re
import duckdb

FORBIDDEN = re.compile(r"^(U?HUGEINT$|DECIMAL\(38,)", re.I)

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def attach(con, sf):
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def gate(con, oracles):
    """Returns [(name, reason)] for every oracle whose projected output
    contains a forbidden type, or whose DESCRIBE fails to bind."""
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.sql("DESCRIBE " + sql).fetchall()
        except Exception as e:
            bad.append((name, f"describe error: {e}"))
            continue
        for row in rows:
            col, typ = row[0], row[1]
            if FORBIDDEN.match(typ):
                bad.append((name, f"column '{col}' projects {typ}"))
    return bad


def selftest():
    con = duckdb.connect()
    uncast = gate(con, {"fixture_uncast":
        "SELECT sum(v) AS m FROM (VALUES (CAST(1 AS BIGINT))) t(v)"})
    assert uncast and "HUGEINT" in uncast[0][1], \
        f"gate missed the deliberately-uncast fixture: {uncast}"
    cast = gate(con, {"fixture_cast":
        "SELECT CAST(sum(v) AS BIGINT) AS m "
        "FROM (VALUES (CAST(1 AS BIGINT))) t(v)"})
    assert not cast, f"gate false-positived on the cast fixture: {cast}"
    dec = gate(con, {"fixture_dec38":
        "SELECT CAST(1 AS DECIMAL(38,6)) AS d"})
    assert dec and "DECIMAL(38," in dec[0][1], \
        f"gate missed the DECIMAL(38,*) fixture: {dec}"
    ok_dec = gate(con, {"fixture_dec18":
        "SELECT CAST(1 AS DECIMAL(18,6)) AS d"})
    assert not ok_dec, f"gate false-positived on DECIMAL(18,6): {ok_dec}"
    print("selftest ok")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    oracle_json, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    attach(con, sf)
    bad = gate(con, json.load(open(oracle_json)))
    for name, why in bad:
        print(f"TYPEFAIL {name}: {why}")
    print(f"== type gate: {len(bad)} violation(s) ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
