#!/usr/bin/env python3
"""Driver-equivalent local oracle check (dev tool only — NOT part of the
library; the sandbox driver runs the same protocol).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each non-'.parquet'-suffixed key in <verifyOutDir>/oracle_sql.json:
run the SQL in DuckDB with the sf tables registered as views, load the
Spark parquet result, sort columns by name, format floats %.6f, compare
row count, schema width, and an order-insensitive row-hash.
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, ncols):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append("%.6f" % v)
            elif isinstance(v, bool):
                vals.append("true" if v else "false")
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    keys = sorted(k for k in oracle if not k.endswith(".parquet"))
    n_pass = 0
    for k in keys:
        files = sorted(glob.glob(f"{out_dir}/{k}.parquet/*.parquet"))
        if not files:
            print(f"FAIL {k}: no spark output")
            continue
        sp = con.execute(
            "SELECT * FROM read_parquet(?)", [files]).fetch_df()
        sp = sp[sorted(sp.columns)]
        try:
            du = con.execute(oracle[k]).fetch_df()
        except Exception as e:
            print(f"FAIL {k}: oracle error: {e}")
            continue
        du = du[sorted(du.columns)]
        rows_ok = len(sp) == len(du)
        schema_ok = list(sp.columns) == list(du.columns)
        hash_ok = (canon(sp.itertuples(index=False, name=None), len(sp.columns))
                   == canon(du.itertuples(index=False, name=None), len(du.columns)))
        if rows_ok and schema_ok and hash_ok:
            n_pass += 1
            print(f"PASS {k} ({len(sp)} rows)")
        else:
            print(f"FAIL {k}: rows {len(sp)}/{len(du)} schema_ok={schema_ok} "
                  f"cols spark={list(sp.columns)} duck={list(du.columns)} hash_ok={hash_ok}")
    print(f"== {n_pass}/{len(keys)} oracle queries pass ==")
    return 0 if n_pass == len(keys) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
