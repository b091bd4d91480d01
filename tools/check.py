#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of
the Scala library; duckdb/pyarrow are driver-side tools). Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify

Compares each <name>.parquet dumped by graft.Verify against the oracle
SQL in oracle_sql.json executed by DuckDB on the same parquet tables.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({spark_tbl.num_rows} rows)")
            continue
        try:
            oracle_tbl = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ok = True
        # column set + order-insensitive: sort columns by name
        scols, ocols = sorted(spark_tbl.column_names), sorted(oracle_tbl.column_names)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}"); n_fail += 1; continue
        if spark_tbl.num_rows != oracle_tbl.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} vs {oracle_tbl.num_rows}")
            n_fail += 1; continue
        s = spark_tbl.select(scols).to_pylist()
        o = oracle_tbl.select(scols).to_pylist()
        mismatch = None
        for i, (rs, ro) in enumerate(zip(s, o)):
            if rs != ro:
                mismatch = (i, rs, ro); break
        # schema (type) check, informational
        stypes = {c: str(spark_tbl.schema.field(c).type) for c in scols}
        otypes = {c: str(oracle_tbl.schema.field(c).type) for c in scols}
        tdiff = {c: (stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]}
        if mismatch:
            i, rs, ro = mismatch
            print(f"FAIL {name}: row {i}\n  spark : {rs}\n  oracle: {ro}")
            n_fail += 1
        else:
            extra = f" [type diffs: {tdiff}]" if tdiff else ""
            print(f"PASS {name} ({spark_tbl.num_rows} rows){extra}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
