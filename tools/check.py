#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of
the Scala library; duckdb/pyarrow are driver-side tools). Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify \
        [--artifact OUT.json] [--timeout SEC]

Compares each <name>.parquet dumped by graft.Verify against the oracle
SQL in oracle_sql.json executed by DuckDB on the same parquet tables.

--artifact writes the per-query result map (the committed
CORRECTNESS_sf0.1.json gate artifact). --timeout bounds each ORACLE's
DuckDB execution (the Spark side already ran in Verify): a query whose
oracle is prohibitive at the larger sf is recorded as excluded-with-
reason in the artifact — an explicit list, never a silent cap.
"""
import sys, json, glob, os, threading
import duckdb
import pyarrow.parquet as pq

def main(sf_dir, out_dir, artifact=None, timeout=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    excluded = {}
    def record(name, status):
        results[name] = status
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record(name, "fail: no spark output"); continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({spark_tbl.num_rows} rows)")
            record(name, f"skip: rows-only ({spark_tbl.num_rows} rows)")
            continue
        timed_out = []
        timer = None
        # Two guards close a timer race: if the Timer fires after
        # fetch_arrow_table() returns but before timer.cancel(), a bare
        # con.interrupt() would poison the NEXT oracle on the shared
        # connection (recorded as a spurious 'oracle SQL error' with an
        # empty timed_out list). So (a) each timed oracle runs on its
        # own cursor — a late interrupt dies with the cursor — and (b)
        # a `done` flag set under a lock makes the late interrupt a
        # no-op in the first place.
        done = []
        lock = threading.Lock()
        cur = con.cursor() if timeout else con
        if timeout:
            def interrupt():
                with lock:
                    if done:
                        return
                    timed_out.append(True)
                    cur.interrupt()
            timer = threading.Timer(timeout, interrupt)
            timer.start()
        try:
            oracle_tbl = cur.execute(oracles[name]).fetch_arrow_table()
            with lock:
                done.append(True)
        except Exception as e:
            with lock:
                done.append(True)
            if timer:
                timer.cancel()
            if timed_out:
                reason = f"oracle exceeded {timeout}s in DuckDB at this sf"
                print(f"EXCLUDE {name}: {reason}")
                excluded[name] = reason
                record(name, f"excluded: {reason}")
                continue
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1
            record(name, f"fail: oracle SQL error: {e}"); continue
        finally:
            if timer:
                timer.cancel()
            if cur is not con:
                cur.close()
        ok = True
        # column set + order-insensitive: sort columns by name
        scols, ocols = sorted(spark_tbl.column_names), sorted(oracle_tbl.column_names)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}"); n_fail += 1
            record(name, f"fail: columns {scols} vs {ocols}"); continue
        if spark_tbl.num_rows != oracle_tbl.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} vs {oracle_tbl.num_rows}")
            n_fail += 1
            record(name, f"fail: rows {spark_tbl.num_rows} vs "
                         f"{oracle_tbl.num_rows}"); continue
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
            record(name, f"fail: value mismatch at row {i}")
        else:
            extra = f" [type diffs: {tdiff}]" if tdiff else ""
            print(f"PASS {name} ({spark_tbl.num_rows} rows){extra}")
            n_pass += 1
            record(name, "pass")
    print(f"\n{n_pass} pass, {n_fail} fail"
          + (f", {len(excluded)} excluded" if excluded else ""))
    if artifact:
        with open(artifact, "w") as f:
            json.dump({"sf": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "n_skip": sum(1 for v in results.values()
                                     if v.startswith("skip")),
                       "excluded": excluded, "queries": results},
                      f, indent=1, sort_keys=True)
        print(f"artifact -> {artifact}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    argv = sys.argv[1:]
    art = None
    tmo = None
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--artifact"):
            art = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            i += 1 if "=" not in a else 0
        elif a.startswith("--timeout"):
            v = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            tmo = float(v)
            i += 1 if "=" not in a else 0
        else:
            pos.append(a)
        i += 1
    sys.exit(main(pos[0], pos[1], art, tmo))
