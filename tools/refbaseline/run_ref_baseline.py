#!/usr/bin/env python3
"""Baseline timings for the reference engine (rohankumar42/pandaSQL) on the
SAME sf-scale tables the Spark bench uses, executing the SAME 8 query shapes
as graft.RefBench (which ports reference benchmarks/run_benchmark.py:11-151
onto the star schema).

Protocol mirrors the reference's own harness (run_benchmark.py:154-213):
  - "read":  load input into the engine's frame type
             (pandas: parquet->DataFrame; pandaSQL: ps.DataFrame wrap —
              SQLite ingest is lazy and lands in run, as in the reference)
  - "run":   build the query + force materialization (str(result), exactly
             like the reference harness)
Each (engine, query) pair runs in a FRESH subprocess so pandaSQL's SQLite
materialization cache and temp DB never carry across measurements.

The dask engine from the reference harness is omitted (no dask wheel in the
zero-egress sandbox); pandas + pandaSQL are the two engines the reference's
own README/paper positions against, and pandaSQL is the baseline the 2x
gate is about. `psutil` (imported by pandasql.memory_utils) is satisfied by
the minimal stub in this directory.

Usage:
  python3 tools/refbaseline/run_ref_baseline.py /root/testdata/sf0.1 out.json
  python3 tools/refbaseline/run_ref_baseline.py <sfdir> <out.json> <query>  # one query, in-process
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"

QUERIES = [
    "b_order", "b_join_order", "b_join_select", "b_big_join_select",
    "b_join", "b_triple_join", "b_limit", "b_selection",
]

# ---------------------------------------------------------------- engines

def load_pandas(sfdir, names):
    import pandas as pd
    return {n: pd.read_parquet(os.path.join(sfdir, n + ".parquet")) for n in names}


def run_shape(mod, tables, query):
    """Build one RefBench query shape with `mod` = pandas or pandasql.
    Shapes mirror graft.RefBench (reference run_benchmark.py:11-151)."""
    if query == "b_order":
        o = tables["orders"]
        r = o.sort_values(by=["o_orderdate", "o_orderkey"], ascending=[False, False])
        return r[["o_orderkey", "o_orderdate", "o_totalprice"]]

    if query in ("b_join_order", "b_join_select", "b_join"):
        o, c = tables["orders"], tables["customer"]
        j = mod.merge(o, c, left_on="o_custkey", right_on="c_custkey")
        if query == "b_join":
            j = j[["o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"]]
            return j.sort_values(by=["o_orderkey"], ascending=[True])
        j["spread"] = j["o_totalprice"] - j["c_acctbal"]
        if query == "b_join_order":
            j = j[["o_orderkey", "c_name", "spread"]]
            return j.sort_values(by=["spread", "o_orderkey"], ascending=[False, False])
        j = j[j["spread"] > 300000]
        j = j[["o_orderkey", "c_name", "spread"]]
        return j.sort_values(by=["o_orderkey"], ascending=[True])

    if query == "b_big_join_select":
        s = tables["supplier"][["s_suppkey", "s_name", "s_acctbal"]]
        c = tables["customer"][["c_custkey", "c_acctbal"]]
        if mod.__name__ == "pandas":
            s = mod.DataFrame(s)  # suppress slice-write warning, as reference does
            c = mod.DataFrame(c)
        s["dummy"] = 1
        c["dummy"] = 1
        j = mod.merge(s, c, on="dummy")
        j["joint"] = j["s_acctbal"] + j["c_acctbal"]
        j = j[j["joint"] > 12000]
        j = j[["s_suppkey", "c_custkey", "joint"]]
        return j.sort_values(by=["s_suppkey", "c_custkey"], ascending=[True, True])

    if query == "b_triple_join":
        li = tables["lineitem"][["l_orderkey", "l_linenumber", "l_extendedprice"]]
        o, c = tables["orders"], tables["customer"]
        j = mod.merge(li, o, left_on="l_orderkey", right_on="o_orderkey")
        j = mod.merge(j, c, left_on="o_custkey", right_on="c_custkey")
        j = j[["l_orderkey", "l_linenumber", "l_extendedprice", "o_custkey", "c_name"]]
        return j.sort_values(by=["l_orderkey", "l_linenumber"], ascending=[True, True])

    if query == "b_limit":
        return tables["orders"].head(n=100)

    if query == "b_selection":
        o = tables["orders"]
        sel = o[((o["o_totalprice"] // 100000 + 1) == 4) |
                (o["o_orderpriority"] == "1-URGENT")]
        sel = sel[["o_orderkey", "o_totalprice", "o_orderpriority"]]
        return sel.sort_values(by=["o_orderkey"], ascending=[True])

    raise ValueError(query)


def measure_one(sfdir, query, engines=("pandas", "pandasql")):
    """Time one query under the requested engines in this process.

    The two engines run in sequence by default, so a pandas failure used
    to leave pandaSQL untested for that shape (the sf1 b_big_join_select
    record conflated "the pandas stage died" with "both engines failed").
    `engines=("pandasql",)` skips the pandas run_shape — the parquet load
    via pandas stays, since pandaSQL ingests from pandas frames — so the
    SQLite engine gets its own verdict. Returns dict."""
    needed = {"orders", "customer"}
    if query == "b_big_join_select":
        needed = {"supplier", "customer"}
    if query == "b_triple_join":
        needed |= {"lineitem"}

    out = {"query": query}

    import pandas
    t0 = time.time()
    pdf = load_pandas(sfdir, needed)
    if "pandas" in engines:
        out["pandas_read"] = time.time() - t0
        t0 = time.time()
        r = run_shape(pandas, pdf, query)
        str(r)  # force, as the reference harness does
        out["pandas_run"] = time.time() - t0
        out["rows_pandas"] = int(len(r))
        del r

    if "pandasql" in engines:
        sys.path.insert(0, HERE)       # psutil stub
        sys.path.insert(0, REFERENCE)  # the reference package itself
        os.environ.setdefault("PANDASQL_OFFLOADING", "ALWAYS")
        import pandasql
        t0 = time.time()
        pstables = {n: pandasql.DataFrame(df) for n, df in pdf.items()}
        out["pandasql_read"] = time.time() - t0
        t0 = time.time()
        r = run_shape(pandasql, pstables, query)
        str(r)  # triggers SQLite ingest + SQL execution + result readback
        out["pandasql_run"] = time.time() - t0
        out["rows_pandasql"] = int(len(r.result))
    return out


def describe_failure(p):
    """A diagnosable error record even when stderr is empty (a SIGKILLed
    child — e.g. the host OOM killer — writes nothing): always capture
    the returncode, and name the signal for negative codes. An empty
    error string is never again the whole artifact."""
    rec = {"returncode": p.returncode, "error": p.stderr.strip()[-2000:]}
    if p.returncode < 0:
        import signal as _sig
        try:
            name = _sig.Signals(-p.returncode).name
        except ValueError:
            name = f"signal {-p.returncode}"
        rec["killed_by"] = name
        if not rec["error"]:
            rec["error"] = (f"child killed by {name} with empty stderr "
                            f"(host-level kill, e.g. the OOM killer)")
    elif not rec["error"]:
        rec["error"] = f"child exited {p.returncode} with empty stderr"
    return rec


def main():
    sfdir, outpath = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3 and not sys.argv[3].startswith("--"):
        # child mode: one query, print JSON line
        engines = ("pandas", "pandasql")
        for a in sys.argv[4:]:
            if a.startswith("--engine="):
                engines = tuple(a.split("=", 1)[1].split(","))
        print(json.dumps(measure_one(sfdir, sys.argv[3], engines)))
        return
    # --only=a,b re-measures a subset and MERGES into an existing outpath
    # (for re-running one failed shape without repeating an hours-long
    # sweep); optional --vmem-gib=N caps the child's address space so an
    # over-memory engine dies with a Python MemoryError traceback instead
    # of a silent host OOM kill. Set it to the box's physical RAM to keep
    # the cap non-restrictive — it only converts "killed" into a message.
    only = None
    vmem_gib = None
    engine = None      # --engine=pandasql: single-engine re-measure, MERGED
    timeout_s = 3600   # --timeout-s=N: child wall cap, recorded on expiry
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        if a.startswith("--vmem-gib="):
            vmem_gib = int(a.split("=", 1)[1])
        if a.startswith("--engine="):
            engine = a.split("=", 1)[1]
        if a.startswith("--timeout-s="):
            timeout_s = int(a.split("=", 1)[1])
    results = {}
    if (only or engine) and os.path.exists(outpath):
        with open(outpath) as fh:
            results = json.load(fh)["results"]
    preexec = None
    if vmem_gib is not None:
        import resource

        def preexec():
            cap = vmem_gib * (1 << 30)
            resource.setrlimit(resource.RLIMIT_AS, (cap, cap))
    for q in (only or QUERIES):
        cmd = [sys.executable, os.path.abspath(__file__), sfdir, "-", q]
        if engine:
            cmd.append(f"--engine={engine}")
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout_s, preexec_fn=preexec)
        except subprocess.TimeoutExpired:
            p = None
        # single-engine re-measures MERGE into the query's existing record
        # (the dual-engine pass's fields, incl. a pandas failure, survive);
        # full runs replace it.
        if engine and q in results and isinstance(results[q], dict):
            rec = results[q]
        else:
            rec = results[q] = {}
        if p is None:
            failure = {"returncode": None,
                       "error": f"child exceeded --timeout-s={timeout_s}s wall cap"}
        elif p.returncode != 0:
            failure = describe_failure(p)
        else:
            failure = None
        if failure is not None:
            if vmem_gib is not None:
                failure["vmem_cap_gib"] = vmem_gib
            if engine:
                rec[f"{engine}_failure"] = failure
                # a failed re-measure must not leave the previous run's
                # success fields claiming a current verdict
                for k in (f"{engine}_read", f"{engine}_run", f"rows_{engine}"):
                    rec.pop(k, None)
            else:
                rec.clear()
                rec.update(failure)
            print(f"{q}: FAILED\n{failure['error']}", file=sys.stderr)
        else:
            line = p.stdout.strip().splitlines()[-1]
            rec.update(json.loads(line))
            if engine:
                rec.pop(f"{engine}_failure", None)
                print(f"{q} ({engine} only): " + "  ".join(
                    f"{k}={v:.3f}s" if isinstance(v, float) else f"{k}={v}"
                    for k, v in json.loads(line).items() if k != "query"))
            else:
                print(f"{q}: pandas {rec['pandas_run']:.3f}s  "
                      f"pandaSQL {rec['pandasql_run']:.3f}s  rows={rec['rows_pandasql']}")
    with open(outpath, "w") as fh:
        json.dump({"sfdir": sfdir, "engines": ["pandas", "pandaSQL"],
                   "protocol": "reference run_benchmark.py:154-213 (read/run split, str() forces)",
                   "results": results}, fh, indent=2)
    # flat CSV twin for graft.Bench (no JSON parser on the Scala side):
    # query,pandas_total_sec,pandasql_total_sec  (total = read + run, since
    # the Spark bench times include the parquet scan inside each query)
    csvpath = os.path.splitext(outpath)[0] + ".csv"
    with open(csvpath, "w") as fh:
        fh.write("query,pandas_sec,pandasql_sec\n")
        for q in QUERIES:
            r = results.get(q, {})
            if "error" in r or not r:
                continue
            fh.write(f"{q},{r['pandas_read'] + r['pandas_run']:.3f},"
                     f"{r['pandasql_read'] + r['pandasql_run']:.3f}\n")
    print(f"wrote {outpath} and {csvpath}")


if __name__ == "__main__":
    main()
