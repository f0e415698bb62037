#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not
part of the Spark library): run graft.Verify first, then this script
compares each <out>/<name>/ parquet dump against the DuckDB result of
<out>/oracle_sql.json's SQL over the same fixture tables.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    import os
    for t in TABLES:
        # the driver fixtures are single-file parquet; GenScale fixtures
        # are Spark directory-parquet — glob the parts in that case
        path = (f"{sf}/{t}.parquet/*.parquet"
                if os.path.isdir(f"{sf}/{t}.parquet") else f"{sf}/{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(mine, ref)
        if ok:
            print(f"PASS {name} ({len(ref)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def compare(mine, ref):
    mc, rc = sorted(mine.columns), sorted(ref.columns)
    if mc != rc:
        return False, f"columns differ: spark={mc} oracle={rc}"
    if len(mine) != len(ref):
        return False, f"row count: spark={len(mine)} oracle={len(ref)}"
    mine, ref = mine[mc], ref[mc]
    for c in mc:
        a, b = mine[c].tolist(), ref[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            xn = isinstance(x, float) and math.isnan(x)
            yn = isinstance(y, float) and math.isnan(y)
            if xn and yn:
                continue
            if (x is None) != (y is None) or xn != yn:
                return False, f"col {c} row {i}: spark={x!r} oracle={y!r}"
            if isinstance(x, float) or isinstance(y, float):
                # The driver hashes the rendered values, so an int64 on one
                # side vs a float64 on the other ("3" vs "3.0") fails its
                # gate even when numerically equal — r9's op_gopher oracle
                # emitted a bare SUM(BIGINT) (-> HUGEINT -> pandas float64)
                # and was the round's only hash mismatch. Mirror that here.
                if isinstance(x, float) != isinstance(y, float):
                    return False, (f"col {c} row {i}: int/float dtype split "
                                   f"spark={x!r} oracle={y!r} (driver hash "
                                   f"mismatch even if numerically equal)")
                if float(x) != float(y):
                    return False, (f"col {c} row {i}: spark={x!r} oracle={y!r} "
                                   f"(diff={float(x)-float(y):.3e})")
            elif str(x) != str(y):
                return False, f"col {c} row {i}: spark={x!r} oracle={y!r}"
    # dtype-level report (informational; exact value equality already passed)
    dt = [(c, str(mine[c].dtype), str(ref[c].dtype)) for c in mc
          if str(mine[c].dtype) != str(ref[c].dtype)]
    if dt:
        return True, f"(dtype note: {dt})"
    return True, ""

if __name__ == "__main__":
    main()
