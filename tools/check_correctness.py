#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle differential check.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB (with one
view per fixture parquet in sfDir), sorts columns by name, and
compares row count, schema-ish, and cell values (exact for
non-floats, tiny epsilon report for floats).
"""
import json, sys, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {qdir}")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(sdf.columns):
            sv, ov = list(sdf[c]), list(odf[c])
            for ri in range(len(sv)):
                a, b = sv[ri], ov[ri]
                an = a is None or (isinstance(a, float) and math.isnan(a))
                bn = b is None or (isinstance(b, float) and math.isnan(b))
                if an and bn:
                    continue
                if an != bn:
                    bad = (c, ri, a, b); break
                if isinstance(a, float) or isinstance(b, float):
                    if a != b:
                        bad = (c, ri, a, b, f"d={abs(a-b)}"); break
                elif str(a) != str(b):
                    bad = (c, ri, a, b); break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r} {bad[4:] if len(bad)>4 else ''}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
