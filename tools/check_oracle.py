#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (driver-side tooling
only — NOT part of the engine). Usage:

  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

For each query: loads the Spark parquet result, runs the recorded
oracle SQL in DuckDB against views named after the parquet tables,
sorts columns by name, sorts rows, and compares values exactly
(floats to 9 significant digits). Prints PASS/FAIL per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols2 = [cols[i] for i in order]
    rows2 = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols2, rows2


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gtypes = {c: str(t) for c, t in zip(got.columns, got.types)}
            gcols, grows = canon(got.columns, got.fetchall())
            exp = con.sql(sql)
            etypes = {c: str(t) for c, t in zip(exp.columns, exp.types)}
            ecols, erows = canon(exp.columns, exp.fetchall())
            # The driver's hash is type-sensitive (e.g. DuckDB HUGEINT
            # sum vs Spark BIGINT, TIMESTAMP_NS vs TIMESTAMP) — a
            # string-normalized value match is NOT enough.
            if gtypes != etypes:
                mism = {c: (gtypes.get(c), etypes.get(c))
                        for c in set(gtypes) | set(etypes)
                        if gtypes.get(c) != etypes.get(c)}
                print(f"FAIL {name}: column types differ {mism}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
            n_fail += 1
        elif grows != erows:
            diff = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows; "
                  f"first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
