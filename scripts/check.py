#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <out>/<name>/ parquet + <out>/oracle_sql.json), then this script
runs each oracle SQL in DuckDB over the same sf dir and compares.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, math, os, re, threading
import duckdb

# Optional per-oracle-query timeout (seconds) for big-SF sweeps where a
# handful of DuckDB oracles (recursive-CC closures, AllPairs exact
# joins) are infeasible: CHECK_TIMEOUT_SEC=600 turns a stuck oracle
# into a counted TIMEOUT row instead of a wedged sweep. Unset (the
# driver's mode) = no timeout, identical behavior to before.
TIMEOUT_SEC = float(os.environ.get("CHECK_TIMEOUT_SEC", "0") or "0")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def table_source(sf_dir, t):
    """Driver testdata ships single files (<t>.parquet); graft.GenSf
    writes directory-parquet (<t>.parquet/part-*.parquet). Support both
    so sf1+ sweeps get oracle hashes, not just zero-error runs
    (r11 verdict item 6)."""
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        return f"{p}/*.parquet"
    return p

def norm(v):
    # type-tagged so int 6000 vs float 6000.0 (or numpy width mismatches
    # like int32 vs int64) FAIL here like they fail the driver's hash
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    return (type(v).__name__, v)

def mem_limit(degraded=False):
    lim = os.environ.get("CHECK_MEM_LIMIT", "48GB")
    if not degraded:
        return lim
    # halve the bound for a last-resort retry under sustained HOST
    # memory pressure (r14: a concurrent compare held RAM, so both the
    # OOM and its full-limit retry failed; half-limit spills harder
    # but fits)
    m = re.match(r"(\d+)\s*(\w+)", lim)
    return "%d%s" % (max(1, int(m.group(1)) // 2), m.group(2)) if m else lim

def connect(sf_dir, degraded=False):
    con = duckdb.connect()
    # spill instead of OOM on the big-SF oracles (GenSf sf1+: the
    # near-dup/ssjoin CTEs materialize gram-scale intermediates)
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # bound DuckDB BELOW physical RAM so a pathological oracle spills
    # (or raises a per-query OOM the reconnect path absorbs) instead of
    # exhausting the PROCESS — the r14 sf1 sweep saw a bad_alloc at the
    # default ~80%-of-RAM limit take down thread creation for every
    # query after it. Override via CHECK_MEM_LIMIT.
    con.execute("SET memory_limit='%s'" % mem_limit(degraded))
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_source(sf_dir, t)}'")
    return con

def main(sf_dir, out_dir):
    state = {"con": connect(sf_dir)}

    def get_con():
        # lazy rebuild: if a reconnect() ever failed mid-sweep (e.g.
        # transient memory pressure right after an interrupted giant
        # oracle), the handle is None and is retried HERE per query —
        # never pinned as a closed handle that fails every later query
        # (the r14 sf1 sweep failure mode: one bad rebuild poisoned the
        # whole tail with 'Connection has already been closed')
        if state["con"] is None:
            state["con"] = connect(sf_dir)
        return state["con"]

    def reconnect(degraded=False):
        try:
            if state["con"] is not None:
                state["con"].close()
        except Exception:
            pass
        state["con"] = None
        state["con"] = connect(sf_dir, degraded)

    def execute(q):
        if TIMEOUT_SEC <= 0:
            return get_con().execute(q).df()
        con = get_con()
        fired = [False]

        def kill():
            fired[0] = True
            con.interrupt()
        timer = threading.Timer(TIMEOUT_SEC, kill)
        timer.start()
        try:
            r = con.execute(q).df()
            # timer race: if kill() ran (or is mid-run) while the query
            # was finishing, a stale interrupt could cancel the NEXT
            # query on this handle — drop the handle instead
            timer.cancel()
            if fired[0]:
                reconnect()
            return r
        except Exception:
            timer.cancel()
            raise

    class OracleTimeout(Exception):
        pass

    def run(q):
        """Execute q; on OOM rebuild the connection (an OOM poisons it —
        every later query on the same handle fails) and retry once, so
        one pathological oracle cannot fail the rest of the sweep. A
        fired-timer INTERRUPT is classified as OracleTimeout (and the
        handle rebuilt) wherever it surfaces — oracle OR result read."""
        try:
            return execute(q)
        except Exception as e:
            msg = str(e)
            if TIMEOUT_SEC > 0 and "INTERRUPT" in msg.upper():
                try:
                    reconnect()
                except Exception:
                    pass  # get_con() lazily rebuilds on the next query
                raise OracleTimeout(msg)
            if "Out of Memory" not in msg and "closed" not in msg.lower():
                raise
            reconnect()
            try:
                return execute(q)
            except Exception as e2:
                msg2 = str(e2)
                if ("Out of Memory" not in msg2
                        and "closed" not in msg2.lower()):
                    raise
                # full-limit retry ALSO failed → sustained host-level
                # pressure (r14 sf1 sweep: a concurrent compare held
                # RAM, so both attempts OOM'd and the tail cascaded).
                # Last resort: half the memory bound — spills harder
                # but fits — then restore a full-limit handle.
                reconnect(degraded=True)
                try:
                    return execute(q)
                finally:
                    try:
                        reconnect()
                    except Exception:
                        state["con"] = None  # lazy rebuild next query

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # CHECK_ONLY=a,b,c restricts the compare (resume aid for big-SF
    # sweeps: re-run just the names a process-level failure skipped)
    only = {s for s in os.environ.get("CHECK_ONLY", "").split(",") if s}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    timeouts = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = run(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except OracleTimeout:
            print(f"TIMEOUT {name}: result read exceeded {TIMEOUT_SEC:.0f}s")
            timeouts += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            exp = run(sql)
        except OracleTimeout:
            print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT_SEC:.0f}s "
                  "(DuckDB-side cost, not an engine mismatch)")
            timeouts += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        # driver compare model: sort columns by name, then hash values
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        gr = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        er = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
        gs, es = sorted(gr, key=str), sorted(er, key=str)
        bad = [(a, b) for a, b in zip(gs, es) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gs)} row mismatches; first: ")
            print(f"   spark: {bad[0][0]}")
            print(f"  duckdb: {bad[0][1]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(gs)} rows)")
    tnote = f" ({timeouts} oracle timeouts excluded)" if timeouts else ""
    print(f"\n{len(oracle) - failures - timeouts}/{len(oracle) - timeouts} queries match{tnote}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
