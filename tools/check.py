#!/usr/bin/env python3
"""Local dev mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB against views over
<sfDir>/*.parquet, and compares: row count, column set, and values
(columns sorted by name, exact equality; floats compared exactly first,
then with tolerance reporting).
"""
import sys, os, glob, json
import duckdb
import pandas as pd
import numpy as np

def connect(sf_dir):
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con

def run_one(con, files, sql):
    """One compare attempt: (ok, msg, nrows)."""
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    want = con.execute(sql).fetchdf()
    ok, msg = compare(got, want)
    return ok, msg, len(got)

def main(sf_dir, out_dir):
    con = connect(sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # mirror graft.Verify's per-query filter so targeted runs compare
    # only what Verify actually wrote
    only = os.environ.get("SPARK_GRAFT_ONLY", "").strip()
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        oracles = {k: v for k, v in oracles.items() if k in keep}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ok, msg, nrows = run_one(con, files, sql)
        except Exception as e:
            ok, msg, nrows = False, str(e), -1
        if not ok:
            # Known transient: DuckDB under memory pressure right after the
            # Spark JVM exits can misreport a compare. Retry ONCE on a fresh
            # connection (fresh views, fresh parquet reads) before reporting.
            try:
                con2 = connect(sf_dir)
                ok2, msg2, nrows2 = run_one(con2, files, sql)
                con2.close()
                if ok2:
                    print(f"PASS {name} ({nrows2} rows; on retry — first attempt: {msg})")
                    n_pass += 1
                    continue
                msg = msg2
            except Exception as e:
                msg = str(e)
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"PASS {name} ({nrows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def compare(got, want):
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    if len(got) != len(want):
        return False, f"row count: spark={len(got)} oracle={len(want)}"
    g = got[sorted(got.columns)].reset_index(drop=True)
    w = want[sorted(want.columns)].reset_index(drop=True)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            gn = gv.astype(float).to_numpy()
            wn = wv.astype(float).to_numpy()
            exact = np.array_equal(gn, wn, equal_nan=True)
            if not exact:
                close = np.allclose(gn, wn, rtol=0, atol=1e-9, equal_nan=True)
                bad = np.where(~((gn == wn) | (np.isnan(gn) & np.isnan(wn))))[0][:3]
                detail = "; ".join(
                    f"row {i}: spark={gn[i]!r} oracle={wn[i]!r}" for i in bad)
                return False, (f"col {c} float mismatch "
                               f"({'within 1e-9' if close else 'DIVERGENT'}): {detail}")
        else:
            ge = gv.astype(object).where(pd.notnull(gv), None)
            we = wv.astype(object).where(pd.notnull(wv), None)
            neq = [i for i in range(len(ge)) if not _eq(ge[i], we[i])]
            if neq:
                i = neq[0]
                return False, (f"col {c} mismatch at row {i} "
                               f"(+{len(neq)-1} more): spark={ge[i]!r} oracle={we[i]!r} "
                               f"[types {type(ge[i]).__name__}/{type(we[i]).__name__}]")
    # dtypes note (driver may hash raw types — flag divergence, don't fail)
    notes = [f"{c}:{g[c].dtype}!={w[c].dtype}" for c in g.columns
             if str(g[c].dtype) != str(w[c].dtype)]
    if notes:
        print(f"  note dtype diff: {', '.join(notes)}")
    return True, ""

def _eq(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (np.integer, int)) and isinstance(b, (np.integer, int)):
        return int(a) == int(b)
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return np.array_equal(np.asarray(a), np.asarray(b))
    return a == b

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
