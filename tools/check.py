#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the same parquet tables and compares
against the Spark result dumped by graft.Verify.

Usage: python3 tools/check.py [sfdir] [verify_out]
(Dev tool only — the shipped library is pure Scala/Spark.)
"""
import duckdb, sys, json, os, glob, math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)

def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    srows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return scols, srows

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spath = f"{out}/{name}"
        if not glob.glob(f"{spath}/*.parquet"):
            print(f"FAIL {name}: no spark output at {spath}")
            n_fail += 1
            continue
        try:
            scols, srows = frame(con, f"SELECT * FROM read_parquet('{spath}/*.parquet')")
            ocols, orows = frame(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}; first diffs: {diff}")
            if len(srows) != len(orows):
                so, oo = set(srows), set(orows)
                print(f"   only-spark: {list(so-oo)[:2]}  only-oracle: {list(oo-so)[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
