#!/usr/bin/env python3
"""Local emulation of the round driver's correctness gate.

Usage: python3 tools/duckdb_compare.py <sfDir> <verifyOutDir>

Registers every parquet in sfDir as a DuckDB view, runs each SQL from
<verifyOutDir>/oracle_sql.json, and compares (sorted columns, sorted rows,
stringified cells) against the Spark parquet dumps in <verifyOutDir>/<query>/.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def main(sf: str, out: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    bad = 0
    for q, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            got = pd.read_parquet(f"{out}/{q}")
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                print(q, "COLS MISMATCH", list(exp.columns), list(got.columns))
                bad += 1
                continue
            e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            if len(e) != len(g):
                print(q, "ROWCOUNT", len(e), len(g))
                bad += 1
                continue
            eq = all((e[c].astype(str).values == g[c].astype(str).values).all()
                     for c in e.columns)
            print(q, "rows", len(e), "MATCH" if eq else "VALUES DIFFER")
            if not eq:
                bad += 1
                for c in e.columns:
                    m = e[c].astype(str).values != g[c].astype(str).values
                    if m.any():
                        i = m.argmax()
                        print("  first diff col", c, "row", i,
                              repr(e[c].iloc[i]), repr(g[c].iloc[i]))
        except Exception as ex:
            print(q, "ERROR", ex)
            bad += 1
    return bad

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
