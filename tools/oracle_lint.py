#!/usr/bin/env python3
"""Oracle type lint: reject any oracle whose output schema contains a
driver-lossy type (HUGEINT/UHUGEINT/DECIMAL). DuckDB's sum(BIGINT)
returns HUGEINT, which the driver's Arrow fetch renders as
decimal128/float — hash-diverging from Spark's BIGINT even when every
value is identical (the q138/q189 round-11 red rows). Wrap every
final-SELECT aggregate in CAST(... AS BIGINT/DOUBLE).

Uses DESCRIBE <query> so nothing executes — planning only, runs in
seconds over all 188 oracles.

Usage: oracle_lint.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = True
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: cannot plan oracle: {e}")
            ok = False
            continue
        bad = [(c, t) for (c, t, *_rest) in desc
               if any(b in t.upper() for b in BAD_TYPES)]
        if bad:
            print(f"[FAIL] {name}: driver-lossy output types {bad} "
                  f"— wrap in CAST(... AS BIGINT/DOUBLE)")
            ok = False
        else:
            print(f"[ok]   {name}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
