#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, registers each parquet table from <sf_dir> as a
DuckDB view, runs every oracle SQL, and compares against the Spark result
parquet in <out>/<name>/ — columns sorted by name, rows sorted by all
columns, values hashed. Dev-only tooling (driver-side python libs); not part
of the Scala library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


STRICT = False  # --strict: bit-exact floats (catches -0.0 vs 0.0 and round ties)


def norm_cell(v):
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, float):
        # default mode tolerates engine noise at 6dp; the DRIVER's gate is
        # bit-exact, so --strict keeps the raw double (repr distinguishes
        # -0.0 from 0.0 and int from float, e.g. DuckDB HUGEINT→float64)
        return v if STRICT else round(v, 6)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def digest(df: pd.DataFrame) -> int:
    # Big results: the per-cell python loop is ~1 min/1M rows and tens of
    # GB of tuples. Above the cutoff, hash vectorized instead: normalize
    # integer widths to int64 (the only dtype tolerance norm_cell grants
    # in strict mode), timestamps to UTC-naive ns, then an
    # order-independent sum of row hashes (canon already row-sorts, and
    # a sum is permutation-invariant anyway). Falls back to the per-cell
    # path when any column is object-typed with non-str content (lists
    # etc. — excluded from oracle outputs by repo convention).
    if len(df) > 200_000:
        try:
            import numpy as np
            h = pd.DataFrame(index=df.index)
            ok = True
            for c in df.columns:
                s = df[c]
                if np.issubdtype(s.dtype, np.integer):
                    s = s.astype("int64")
                elif isinstance(s.dtype, pd.DatetimeTZDtype) or \
                        np.issubdtype(s.dtype, np.datetime64):
                    # normalize the storage UNIT too: datetime64[us] vs
                    # [ns] hash differently while representing the same
                    # instant (norm_cell's isoformat was unit-blind)
                    s = pd.to_datetime(s, utc=True).dt.tz_localize(None) \
                        .astype("datetime64[ns]")
                elif s.dtype == object:
                    if not s.map(lambda v: v is None or
                                 isinstance(v, str)).all():
                        ok = False
                        break
                h[c] = s
            if ok:
                if not STRICT:
                    for c in h.columns:
                        if np.issubdtype(h[c].dtype, np.floating):
                            h[c] = h[c].round(6)
                return int(pd.util.hash_pandas_object(h, index=False)
                           .sum())
        except Exception:
            pass
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=repr)
    return hash(tuple(rows))


def main():
    global STRICT
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timing = "--time" in sys.argv  # print best-of-2 DuckDB seconds per query
    STRICT = "--strict" in sys.argv
    # --timeout N: interrupt any single oracle query after N seconds and
    # record it as a SKIP (big-fixture sweeps: one quadratic oracle must
    # not stall the whole gate). 0 = no limit.
    timeout = 0.0
    if "--timeout" in sys.argv:
        timeout = float(sys.argv[sys.argv.index("--timeout") + 1])
    con = duckdb.connect()
    # spill outside the repo working dir (a big sweep once left 33 GB of
    # duckdb_temp_storage under ./.tmp)
    con.sql("SET temp_directory='/tmp/duckdb_oracle_spill.tmp'")
    for t in TABLES:
        # multi-file fixtures (GenScale output) are DIRECTORIES of parts
        import os
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    def run_df(sql):
        if not timeout:
            return con.sql(sql).df()
        import threading
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            return con.sql(sql).df()
        finally:
            timer.cancel()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    times = {}
    n_skip = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = run_df(sql)
            if timing:
                import time as _time
                best = float("inf")
                for _ in range(2):
                    t0 = _time.time()
                    con.sql(sql).fetchall()
                    best = min(best, _time.time() - t0)
                times[name] = best
        except Exception as e:
            if "INTERRUPT" in str(e).upper() or "interrupted" in str(e):
                print(f"SKIP {name}: oracle exceeded {timeout:.0f}s timeout")
                n_skip += 1
            else:
                print(f"FAIL {name}: oracle error: {e}")
                n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        want_c, got_c = canon(want), canon(got)
        if list(want_c.columns) != list(got_c.columns):
            print(f"FAIL {name}: columns want={list(want_c.columns)} got={list(got_c.columns)}")
            n_fail += 1
            continue
        if len(want_c) != len(got_c):
            print(f"FAIL {name}: rows want={len(want_c)} got={len(got_c)}")
            n_fail += 1
            continue
        if digest(want_c) != digest(got_c):
            print(f"FAIL {name}: value hash mismatch")
            # show first differing rows
            for i in range(min(len(want_c), 2000)):
                wr = tuple(norm_cell(v) for v in want_c.iloc[i])
                gr = tuple(norm_cell(v) for v in got_c.iloc[i])
                if repr(wr) != repr(gr):
                    print(f"  row {i}: want={wr}")
                    print(f"  row {i}:  got={gr}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name} ({len(want_c)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail" +
          (f" / {n_skip} oracle-timeout-skip" if n_skip else ""))
    if timing:
        print(json.dumps({"duckdb_sec": {k: round(v, 4) for k, v in sorted(times.items())},
                          "total_sec": round(sum(times.values()), 3)}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
