#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (driver-side tooling;
not part of the Scala library). Usage:

    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
first. Compares each <outDir>/<name> parquet against DuckDB executing
oracle_sql.json on the same tables: row count, column names/types, and
exact value hash (columns sorted by name, rows in produced order).
"""
import hashlib
import json
import math
import sys
import threading
from pathlib import Path

import duckdb


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(norm(row[i]) for i in order).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(out_dir, sf_dir, timeout_s=0.0, skip=()):
    """timeout_s/skip are builder-side knobs for ABOVE-GATE cross-checks
    (e.g. generated sf1): a per-oracle DuckDB timeout (the oracle
    formulations are written for gate-SF cost, some are deliberately
    quadratic there) and an explicit by-design exclusion list. The
    driver's 2-arg invocation is unchanged."""
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_rowsonly = 0
    produced = {d.name for d in out.iterdir() if d.is_dir()}
    # A query that threw in Verify writes no dir; count it as a failure
    # instead of silently skipping it (ADVICE r1). query_names.json is
    # the full declared list; oracle keys are the fallback floor.
    names_file = out / "query_names.json"
    declared = set(json.loads(names_file.read_text())) if names_file.exists() \
        else set(oracles)
    for name in sorted(declared - produced):
        print(f"FAIL {name}: no output produced (query threw in Verify?)")
        n_fail += 1
    n_skip = 0
    def run_timed(sql):
        if not timeout_s:
            r = con.execute(sql)
            return r, r.fetchall()
        fired = threading.Event()

        def bang():
            fired.set()
            con.interrupt()
        timer = threading.Timer(timeout_s, bang)
        timer.start()
        try:
            r = con.execute(sql)
            return r, r.fetchall()
        finally:
            timer.cancel()
            if fired.is_set():
                # The timer may have fired AFTER the query completed,
                # leaving a pending interrupt on the connection that
                # would misclassify the NEXT statement as a timeout.
                # bang() sets `fired` BEFORE calling con.interrupt(), so
                # first join the timer thread (guaranteeing the interrupt
                # call itself has been issued), then absorb until a
                # sacrificial statement runs CLEAN — a single attempt
                # could slip in between fired.set() and con.interrupt().
                timer.join()
                for _ in range(10):
                    try:
                        con.execute("SELECT 1").fetchall()
                        break  # clean statement: no interrupt pending
                    except Exception:
                        continue  # absorbed one pending interrupt
    for qdir in sorted(d for d in out.iterdir() if d.is_dir()):
        name = qdir.name
        if name in skip:
            print(f"SKIP {name}: by-design exclusion at this SF")
            n_skip += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
            gcols = [c[0] for c in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(grows) > 0 else "ROWS-ONLY-EMPTY(!)"
            if not grows:
                n_fail += 1
            else:
                n_rowsonly += 1
            print(f"{status} {name}: {len(grows)} rows")
            continue
        try:
            want, wrows = run_timed(oracles[name])
            wcols = [c[0] for c in want.description]
            # The DRIVER reads oracle results through pandas, where a
            # HUGEINT column (any DuckDB sum over an integer type whose
            # result isn't re-cast) degrades to float64 and hash-breaks
            # against Spark's int64 even when every value is equal.
            # fetchall() hides this (HUGEINT -> Python int), so detect
            # the type explicitly and fail the oracle here.
            hugeint_cols = [c for c, t, *_ in con.execute(
                "DESCRIBE " + oracles[name]).fetchall() if t == "HUGEINT"]
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s (excluded)")
            n_skip += 1
            continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s (excluded)")
                n_skip += 1
                continue
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        problems = []
        if hugeint_cols:
            problems.append(
                f"oracle column(s) {hugeint_cols} are HUGEINT — add an "
                "outer ::BIGINT cast (sum(x)::BIGINT, not sum(x::BIGINT))")
        if sorted(gcols) != sorted(wcols):
            problems.append(f"cols spark={sorted(gcols)} duck={sorted(wcols)}")
        elif len(grows) != len(wrows):
            problems.append(f"rows spark={len(grows)} duck={len(wrows)}")
        elif table_hash(grows, gcols) != table_hash(wrows, wcols):
            problems.append("hash mismatch")
            order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
            order_w = sorted(range(len(wcols)), key=lambda i: wcols[i])
            shown = 0
            for ri, (gr, wr) in enumerate(zip(grows, wrows)):
                gv = ["%s=%s" % (gcols[i], norm(gr[i])) for i in order_g]
                wv = ["%s=%s" % (wcols[i], norm(wr[i])) for i in order_w]
                if gv != wv and shown < 3:
                    problems.append(f"  row{ri} spark={gv}")
                    problems.append(f"  row{ri}  duck={wv}")
                    shown += 1
        if problems:
            print(f"FAIL {name}: " + "\n".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(grows)} rows")
            n_pass += 1
    extra = f", {n_skip} skipped/timeout" if n_skip else ""
    print(f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail{extra} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict((a[2:].split("=", 1) + [""])[:2]
                for a in sys.argv[1:] if a.startswith("--"))
    if "" in opts.values():
        sys.exit("usage: check.py <outDir> <sfDir> [--timeout=SECS] "
                 "[--skip=k1,k2,...] (flags need '=value')")
    sys.exit(main(args[0], args[1],
                  timeout_s=float(opts.get("timeout", 0)),
                  skip=set(filter(None, opts.get("skip", "").split(",")))))
