#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (development aid only;
the shipped Scala library does not depend on this).

Usage: check_oracle.py <verify_out_dir> <sf_dir> [--shard i/k] [--timeout-sec T]

Reads each <name>/ parquet written by graft.Verify, runs the matching
SQL from oracle_sql.json in DuckDB over the sf_dir tables, and compares
schema-insensitively: columns sorted by name, rows sorted, values
compared exactly (floats to 1e-9 relative, and also reported if not
bit-equal, since the real driver may hash exact values).

--shard i/k  run only queries with hash(name) % k == i (parallel sweeps
             at big scale factors); --timeout-sec interrupts a DuckDB
             query after T seconds and reports TIMEOUT instead of
             hanging the sweep (expected for a few recursive oracles at
             sf >= 1 — document them, per SURVEY §6).
"""
import json, math, sys, glob, os, threading, zlib
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def sort_key(v):
    # floats sort by a rounded representation so rows differing only in
    # low float bits pair up with the right partner across engines
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)

def rows_of(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [cols[i] for i in order]
    return sorted(zip(*[[norm(v) for v in c] for c in cols]), key=lambda r: tuple(sort_key(x) for x in r)), [names[i] for i in order]

def main(outdir, sfdir, shard=None, timeout_sec=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if shard:
        i, k = map(int, shard.split("/"))
        oracle = {n: s for n, s in oracle.items()
                  if zlib.crc32(n.encode()) % k == i}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True);  n_fail += 1;  continue
        st = pq.read_table(files[0])
        timer = None
        timed_out = []
        if timeout_sec:
            timer = threading.Timer(timeout_sec,
                                    lambda: (timed_out.append(1), con.interrupt()))
            timer.start()
        try:
            dt = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            if timed_out:
                print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s", flush=True)
            else:
                print(f"FAIL {name}: duckdb error: {e}", flush=True)
                n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
        s_rows, s_names = rows_of([c.to_pylist() for c in st.columns], list(st.schema.names))
        d_rows, d_names = rows_of([c.to_pylist() for c in dt.columns], list(dt.schema.names))
        if s_names != d_names:
            print(f"FAIL {name}: columns {s_names} vs {d_names}");  n_fail += 1;  continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}");  n_fail += 1;  continue
        bad = exact = 0
        first = None
        for a, b in zip(s_rows, d_rows):
            for x, y in zip(a, b):
                # the driver hashes typed values: DuckDB decimal128 (e.g.
                # from sum(BIGINT)) vs Spark int64 mismatches even when
                # numerically equal — flag any cross-type cell pair
                if x is not None and y is not None and type(x) is not type(y):
                    bad += 1
                    first = first or ((a, b), f"type {type(x).__name__} vs {type(y).__name__}")
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if x != y:
                        exact += 1
                        if not (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)):
                            bad += 1
                            first = first or (a, b)
                elif x != y:
                    bad += 1
                    first = first or (a, b)
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells; first {first}")
            n_fail += 1
        elif exact:
            print(f"WARN {name}: values close but {exact} float cells not bit-equal")
            n_pass += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows exact")
            n_pass += 1
    # rows-only queries: no SQL oracle, but a pinned expected row
    # count (expected_rows.json, written by graft.Verify) rows-gates
    # them when the dump ran at the driver's verify scale (sf0.01)
    er_path = f"{outdir}/expected_rows.json"
    if os.path.exists(er_path) and os.path.basename(sfdir.rstrip("/")) == "sf0.01":
        for name, want in sorted(json.load(open(er_path)).items()):
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"SKIP {name}: not in this dump (rows-gate)"); continue
            got = pq.read_table(files[0]).num_rows
            if got == want:
                print(f"PASS {name}: {got} rows (rows-gate, no SQL oracle)"); n_pass += 1
            else:
                print(f"FAIL {name}: rows-gate {got} vs pinned {want}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    shard = timeout = None
    args = sys.argv[1:]
    if "--shard" in args:
        i = args.index("--shard"); shard = args[i + 1]; del args[i:i + 2]
    if "--timeout-sec" in args:
        i = args.index("--timeout-sec"); timeout = float(args[i + 1]); del args[i:i + 2]
    sys.exit(main(args[0], args[1], shard, timeout))
