#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of
the Scala library; duckdb/pyarrow are driver-side tools). Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify \
        [--artifact OUT.json] [--timeout SEC] [--resume]

Compares each <name>.parquet dumped by graft.Verify against the oracle
SQL in oracle_sql.json executed by DuckDB on the same parquet tables.

--artifact writes the per-query result map (the committed
CORRECTNESS_sf0.1.json / CORRECTNESS_sf1.json gate artifacts),
INCREMENTALLY after every query, so a killed run leaves a usable
partial artifact. --resume skips queries the artifact already records
(the recovery path after a hang/kill). --timeout bounds each ORACLE's
DuckDB execution: a query whose oracle is prohibitive at the larger sf
is recorded as excluded-with-reason in the artifact — an explicit
list, never a silent cap.

Timed oracles run in a KILLED-ON-TIMEOUT child process, each with its
own DuckDB database. The earlier in-process form (threading.Timer +
cursor.interrupt()) deadlocked DuckDB at sf1.0 — interrupt raced the
query's own teardown and every thread parked on a futex — and an
interrupt can also poison sibling cursors of a shared connection.
Process isolation removes the whole class: a hung/crashed/OOM'd oracle
dies with its child, the parent just times the join. The per-child
view setup re-reads only parquet footers (~ms); peak memory returns to
baseline after every query instead of accumulating in one connection.
"""
import sys, json, glob, os, tempfile, multiprocessing as mp
import duckdb
import pyarrow.parquet as pq


# ---- physical-type gate (round-13; VERDICT r12 ask #2) -------------
# The driver's hash canonicalizes by Arrow PHYSICAL type, so a
# value-equal column whose types drift (Spark decimal128(38,0) vs
# DuckDB's HUGEINT export) passes a pure value compare here and fails
# the real gate — exactly how r12 shipped its one red row
# (agg_power_mde). Type diffs are now FAIL unless the pair normalizes
# to the same class below. The classes are the empirically
# driver-tolerated ones: every equivalence listed here rode a PASSING
# row through the r12 driver artifact (349 greens). Anything outside
# them — decimals, mismatched integer signs/widths beyond the listed
# pairs, nested layout drift — is a gate FAIL until the QUERY is fixed
# (emit a hash-stable type on both sides), never silently tolerated.
def _tclass(t):
    s = str(t)
    # DuckDB exports VARCHAR as string or large_string depending on
    # version; Spark parquet round-trips as string. Same driver class.
    if s in ("string", "large_string"):
        return "string"
    # DuckDB COUNT/SUM yield int64; Spark emits int32 for pyspark-side
    # ints only (not produced here) — keep integer widths DISTINCT
    # except the int64/uint64 pair DuckDB uses for some catalog funcs.
    if s in ("int64", "uint64"):
        return "int64"
    # timestamp unit drift: Spark writes us, DuckDB exports us — equal
    # units pass identity; differing units normalize to the value
    # grain only when both are timestamp without tz
    if s.startswith("timestamp[us]") or s.startswith("timestamp[ns]"):
        return "timestamp" + s[s.index("]") + 1:]
    # nested types: normalize the element/field types recursively via
    # the string form (list<large_string> vs list<string>)
    for a, b in (("large_string", "string"), ("large_list", "list")):
        if a in s:
            s = s.replace(a, b)
    return s


def type_drift(scols, spark_tbl, oracle_tbl):
    """Columns whose Arrow types differ in a way the driver's hash may
    not tolerate: {col: (spark_type, oracle_type)}."""
    out = {}
    for c in scols:
        st = spark_tbl.schema.field(c).type
        ot = oracle_tbl.schema.field(c).type
        if str(st) != str(ot) and _tclass(st) != _tclass(ot):
            out[c] = (str(st), str(ot))
    return out


# marker the oracle child prefixes to its error text so the parent can
# classify a spill-disk ENOSPC against the ACTUAL configured spill dir
# (ADVICE r12: the previous literal-substring '/spill' check broke for
# path forms DuckDB cites differently)
_SPILL_MARK = "SPILL_DIR="


def _views(con, sf_dir):
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def _run_oracle(sf_dir, sql, out_path, err_path):
    """Child-process body: one oracle, one fresh DuckDB, result to
    parquet. Any failure leaves its message in err_path."""
    # computed before the try so the error path can always name it
    spill = os.path.join(os.path.dirname(out_path), "spill")
    try:
        con = duckdb.connect()
        # fail fast and clean instead of driving the box into swap: an
        # oracle that needs more than this at the gate sf is prohibitive
        # (recorded EXCLUDED by the parent), same class as a timeout
        con.execute(
            f"SET memory_limit='{os.environ.get('CHECK_MEM', '24GB')}'")
        # per-child spill dir: concurrent shard children otherwise all
        # spill into the shared cwd ./.tmp and delete each other's
        # temp blocks mid-query (observed as a bogus IO-error FAIL on
        # a correct oracle at sf1.0)
        con.execute(f"SET temp_directory='{spill}'")
        # spill is bounded too: a recursive-CTE replay that wants more
        # than this of disk is the same prohibitive-oracle class as a
        # memory OOM — die with a clean classifiable error instead of
        # filling the filesystem under every concurrent sibling
        con.execute("SET max_temp_directory_size="
                    f"'{os.environ.get('CHECK_SPILL', '40GB')}'")
        _views(con, sf_dir)
        pq.write_table(con.execute(sql).fetch_arrow_table(), out_path)
    except Exception as e:  # noqa: BLE001 — the parent reports it
        with open(err_path, "w") as f:
            # first line names the configured spill dir so the parent
            # can classify ENOSPC against the REAL path, not a literal
            f.write(f"{_SPILL_MARK}{spill}\n{e}")
        sys.exit(1)


def fetch_oracle(sf_dir, sql, timeout, shared_con):
    """Returns (table, err, timed_out). Untimed mode keeps the fast
    shared connection; timed mode isolates in a killable child."""
    if timeout is None:
        try:
            return shared_con.execute(sql).fetch_arrow_table(), None, False
        except Exception as e:  # noqa: BLE001
            return None, str(e), False
    with tempfile.TemporaryDirectory() as td:
        out_path = os.path.join(td, "oracle.parquet")
        err_path = os.path.join(td, "err.txt")
        proc = mp.get_context("fork").Process(
            target=_run_oracle, args=(sf_dir, sql, out_path, err_path),
            daemon=True)
        proc.start()
        proc.join(timeout)
        if proc.is_alive():
            proc.kill()
            proc.join()
            return None, None, True
        if proc.exitcode is not None and proc.exitcode < 0:
            # killed by a signal (SIGABRT from DuckDB's hard-OOM path,
            # OOM-killer SIGKILL): there is no answer to be wrong —
            # prohibitive-oracle class, reported as Out of Memory so
            # the caller records an explicit exclusion
            return None, ("Out of Memory: oracle child killed by "
                          f"signal {-proc.exitcode} at this sf"), False
        if proc.exitcode != 0:
            err = (open(err_path).read() if os.path.exists(err_path)
                   else f"oracle child died (exit {proc.exitcode})")
            return None, err, False
        return pq.read_table(out_path), None, False


def merge(out_path, shard_paths):
    """Combine per-shard artifacts into one gate artifact."""
    queries, excluded, sf = {}, {}, None
    for p in shard_paths:
        a = json.load(open(p))
        queries.update(a.get("queries", {}))
        excluded.update(a.get("excluded", {}))
        sf = a.get("sf", sf)
    n_pass = sum(1 for v in queries.values() if v == "pass")
    n_fail = sum(1 for v in queries.values() if v.startswith("fail"))
    n_skip = sum(1 for v in queries.values() if v.startswith("skip"))
    with open(out_path, "w") as f:
        json.dump({"sf": sf, "n_pass": n_pass, "n_fail": n_fail,
                   "n_skip": n_skip, "excluded": excluded,
                   "queries": queries}, f, indent=1, sort_keys=True)
    print(f"{n_pass} pass, {n_fail} fail"
          + (f", {len(excluded)} excluded" if excluded else "")
          + f" -> {out_path}", flush=True)
    return 1 if n_fail else 0


def main(sf_dir, out_dir, artifact=None, timeout=None, resume=False,
         shard=None):
    # untimed mode shares one connection (the common fast path); timed
    # mode must NOT hold a parent connection across fork()s
    con = duckdb.connect() if timeout is None else None
    if con is not None:
        _views(con, sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    excluded = {}
    if resume and artifact and os.path.exists(artifact):
        prior = json.load(open(artifact))
        results = dict(prior.get("queries", {}))
        excluded = dict(prior.get("excluded", {}))
        print(f"resuming: {len(results)} queries already recorded",
              flush=True)

    def counts():
        n_pass = sum(1 for v in results.values() if v == "pass")
        n_fail = sum(1 for v in results.values() if v.startswith("fail"))
        n_skip = sum(1 for v in results.values() if v.startswith("skip"))
        return n_pass, n_fail, n_skip

    def record(name, status):
        results[name] = status
        if artifact:  # incremental: a killed run leaves a usable gate
            n_pass, n_fail, n_skip = counts()
            with open(artifact + ".tmp", "w") as f:
                json.dump({"sf": sf_dir, "n_pass": n_pass,
                           "n_fail": n_fail, "n_skip": n_skip,
                           "excluded": excluded, "queries": results},
                          f, indent=1, sort_keys=True)
            os.replace(artifact + ".tmp", artifact)

    names = [n for n in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, n))]
    if shard is not None:  # --shard K/N: every Nth name, offset K —
        # wall-clock parallelism for the big-sf gates, where timed-out
        # oracles otherwise serialize 300s sleeps; shard artifacts are
        # combined with --merge
        k, n = shard
        names = [nm for i, nm in enumerate(names) if i % n == k]
    for name in names:
        d = os.path.join(out_dir, name)
        if name in results:
            continue  # --resume
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True)
            record(name, "fail: no spark output"); continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({spark_tbl.num_rows} rows)",
                  flush=True)
            record(name, f"skip: rows-only ({spark_tbl.num_rows} rows)")
            continue
        oracle_tbl, err, timed_out = fetch_oracle(
            sf_dir, oracles[name], timeout, con)
        if timed_out:
            reason = f"oracle exceeded {timeout}s in DuckDB at this sf"
            print(f"EXCLUDE {name}: {reason}", flush=True)
            excluded[name] = reason
            record(name, f"excluded: {reason}"); continue
        # DuckDB's own spill-exhaustion texts only: a raw ENOSPC from
        # any other source (disk filled by an unrelated process) stays
        # an investigable FAIL rather than a recorded exclusion. The
        # ENOSPC case is matched against the child's ACTUAL configured
        # spill dir (the SPILL_DIR= marker line), not a literal
        # substring (ADVICE r12).
        spill_dir = None
        if err is not None and err.startswith(_SPILL_MARK):
            head, _, body = err.partition("\n")
            spill_dir = head[len(_SPILL_MARK):]
            err = body or head
        if err is not None and ("Out of Memory" in err
                                or "space in temporary directory" in err
                                or "max_temp_directory_size" in err
                                or ("No space left on device" in err
                                    and spill_dir is not None
                                    and spill_dir in err)):
            # prohibitive-oracle class, like a timeout: DuckDB could not
            # hold the replay at this sf — an explicit exclusion, not a
            # wrong answer (the sf1.0 run surfaced this on the graph
            # recursive-CTE replays at 160k nodes)
            reason = f"oracle exceeded DuckDB memory at this sf: {err}"
            print(f"EXCLUDE {name}: {reason}", flush=True)
            excluded[name] = reason
            record(name, f"excluded: {reason}"); continue
        if err is not None:
            print(f"FAIL {name}: oracle SQL error: {err}", flush=True)
            record(name, f"fail: oracle SQL error: {err}"); continue
        # column set + order-insensitive: sort columns by name
        scols = sorted(spark_tbl.column_names)
        ocols = sorted(oracle_tbl.column_names)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}", flush=True)
            record(name, f"fail: columns {scols} vs {ocols}"); continue
        if spark_tbl.num_rows != oracle_tbl.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} vs "
                  f"{oracle_tbl.num_rows}", flush=True)
            record(name, f"fail: rows {spark_tbl.num_rows} vs "
                         f"{oracle_tbl.num_rows}"); continue
        s = spark_tbl.select(scols).to_pylist()
        o = oracle_tbl.select(scols).to_pylist()
        mismatch = None
        for i, (rs, ro) in enumerate(zip(s, o)):
            if rs != ro:
                mismatch = (i, rs, ro); break
        # physical-type gate: value-equal but type-drifted columns FAIL
        # here so the builder's mirror catches the driver's hash-fail
        # class (r12's agg_power_mde) before the driver does
        drift = type_drift(scols, spark_tbl, oracle_tbl)
        if mismatch:
            i, rs, ro = mismatch
            print(f"FAIL {name}: row {i}\n  spark : {rs}\n  oracle: {ro}",
                  flush=True)
            record(name, f"fail: value mismatch at row {i}")
        elif drift:
            print(f"FAIL {name}: arrow type drift (values equal): "
                  f"{drift} — emit a hash-stable type on both sides",
                  flush=True)
            record(name, f"fail: arrow type drift {drift}")
        else:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)", flush=True)
            record(name, "pass")
    n_pass, n_fail, _ = counts()
    print(f"\n{n_pass} pass, {n_fail} fail"
          + (f", {len(excluded)} excluded" if excluded else ""),
          flush=True)
    if artifact:
        print(f"artifact -> {artifact}", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--merge":
        sys.exit(merge(argv[1], argv[2:]))
    art = None
    tmo = None
    res = False
    shd = None
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
        elif a.startswith("--shard"):
            v = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            k, n = v.split("/")
            shd = (int(k), int(n))
            i += 1 if "=" not in a else 0
        elif a == "--resume":
            res = True
        else:
            pos.append(a)
        i += 1
    sys.exit(main(pos[0], pos[1], art, tmo, res, shd))
