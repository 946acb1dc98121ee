#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same sf directory: row count, schema, and a value hash
computed after sorting columns by name and rows by all values —
mirroring the driver's described compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last").reset_index(drop=True)
    return df


def cell(v):
    if v is None or v != v:  # NaN/None
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(got)}
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:200]}
            continue
        g, e = canon(got), canon(exp)
        status = {"rows": len(g) == len(e),
                  "cols": list(g.columns) == list(e.columns)}
        if status["rows"] and status["cols"]:
            hg, he = table_hash(g), table_hash(e)
            status["hash"] = hg == he
            if not status["hash"]:
                # show first mismatching row for debugging
                for i in range(len(g)):
                    rg = [cell(v) for v in g.iloc[i]]
                    re_ = [cell(v) for v in e.iloc[i]]
                    if rg != re_:
                        status["first_diff"] = {"row": i, "got": rg, "exp": re_}
                        break
        else:
            status["got_cols"] = list(g.columns)
            status["exp_cols"] = list(e.columns)
            status["got_rows"] = len(g)
            status["exp_rows"] = len(e)
        ok = all(v for k, v in status.items() if isinstance(v, bool))
        results[name] = {"status": "PASS" if ok else "FAIL", **status}
    npass = sum(1 for r in results.values() if r["status"] == "PASS")
    nfail = sum(1 for r in results.values() if r["status"] == "FAIL")
    for name, r in results.items():
        line = f"{r['status']:>9}  {name}"
        if r["status"] == "FAIL":
            line += "  " + json.dumps({k: v for k, v in r.items() if k != "status"}, default=str)[:500]
        print(line)
    print(f"\n{npass} pass, {nfail} fail, "
          f"{len(results) - npass - nfail} other / {len(results)}")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
