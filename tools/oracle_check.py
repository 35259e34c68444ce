#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the oracle SQL in DuckDB and compare (row count, schema,
value hash) per query. Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # mirror a tolerant hash: fixed decimal form
        return f"{v:.6f}"
    return str(v)

def frame_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = True
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[FAIL] {name}: no spark output")
            ok = False
            continue
        s = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
        scols = [d[0] for d in con.description]
        try:
            # Driver-faithful fetch: the driver reads oracle results via
            # Arrow, where DuckDB HUGEINT (from uncast sum()) and DECIMAL
            # become float64 — invisible to fetchall() (Python ints).
            # Going through .arrow() makes that divergence fail HERE.
            tbl = con.execute(sql).arrow()
            dcols = list(tbl.column_names)
            bad = [f"{c}:{tbl.schema.field(c).type}" for c in dcols
                   if "decimal" in str(tbl.schema.field(c).type)]
            if bad:
                print(f"[FAIL] {name}: oracle output has driver-lossy "
                      f"types (wrap in CAST): {bad}")
                ok = False
                continue
            d = [tuple(col[i].as_py() for col in tbl.columns)
                 for i in range(tbl.num_rows)]
        except Exception as e:
            print(f"[FAIL] {name}: oracle sql error: {e}")
            ok = False
            continue
        if sorted(scols) != sorted(dcols):
            print(f"[FAIL] {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            ok = False
            continue
        if len(s) != len(d):
            print(f"[FAIL] {name}: rows {len(s)} vs {len(d)}")
            ok = False
            continue
        hs, hd = frame_hash(s, scols), frame_hash(d, dcols)
        if hs != hd:
            print(f"[FAIL] {name}: hash mismatch ({len(s)} rows)")
            # show a few differing lines for debugging
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sl = sorted("|".join(norm_cell(r[i]) for i in order) for r in s)
            dl = sorted("|".join(norm_cell(r[i]) for i in order) for r in d)
            shown = 0
            for a, b in zip(sl, dl):
                if a != b and shown < 3:
                    print(f"    spark: {a}\n    duck : {b}")
                    shown += 1
            ok = False
        else:
            print(f"[ok]   {name}: {len(s)} rows match")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
