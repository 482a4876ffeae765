#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB against a given SF dir (driver-side
tooling only — NOT part of the engine). The judge's engine-vs-DuckDB
comparison runs the same statements on the same parquet; this script
reproduces the DuckDB side locally so BENCH_DETAIL refreshes can be
annotated with a same-host ratio.

Usage:
  python3 tools/time_oracle.py <sf_dir> <oracle_sql.json> [out.json]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    sqls = json.load(open(sql_path))
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times, errors = {}, {}
    for name in sorted(sqls):
        q = sqls[name]
        try:
            con.execute(q).fetchall()  # warm (parquet footers, caches)
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                con.execute(q).fetchall()
                runs.append(time.monotonic() - t0)
            times[name] = sorted(runs)[1]
        except Exception as e:  # noqa: BLE001 - record and continue
            errors[name] = str(e)[:200]
    total = sum(times.values())
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "n": len(times),
                      "errors": len(errors)}))
    detail = {"total": round(total, 3),
              "queries": {k: round(v, 3) for k, v in times.items()},
              "errors": errors, "sf": sf_dir}
    if out_path:
        json.dump(detail, open(out_path, "w"), indent=0)
    else:
        for k in sorted(times, key=times.get, reverse=True)[:15]:
            print(f"{k:32s} {times[k]:8.3f}")


if __name__ == "__main__":
    main()
