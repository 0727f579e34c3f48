#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir>

For each <name>.parquet under verify_out_dir, runs the matching SQL from
oracle_sql.json in DuckDB over the sf_dir tables and compares rows/schema/
values (columns sorted by name, values rounded-stringified) — the same
comparison shape the driver uses.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig_cols = [cols[i] for i in order]
    sig_rows = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sig_cols, sig_rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noora = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')")
        s_cols = [c[0] for c in spark_rel.description]
        s_rows = spark_rel.fetchall()
        if name not in oracle:
            n_noora += 1
            print(f"  {name}: no oracle ({len(s_rows)} rows)")
            continue
        o_rel = con.execute(oracle[name])
        o_cols = [c[0] for c in o_rel.description]
        o_rows = o_rel.fetchall()
        sc, sr = frame_sig(s_cols, s_rows)
        oc, orr = frame_sig(o_cols, o_rows)
        ok = sc == oc and sr == orr
        if ok:
            n_pass += 1
            print(f"  {name}: OK ({len(s_rows)} rows)")
        else:
            n_fail += 1
            print(f"  {name}: FAIL  cols {sc} vs {oc}  rows {len(sr)} vs {len(orr)}")
            for i, (a, b) in enumerate(zip(sr, orr)):
                if a != b:
                    print(f"    first diff row {i}: spark={a} oracle={b}")
                    break
    print(f"pass={n_pass} fail={n_fail} no_oracle={n_noora}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
