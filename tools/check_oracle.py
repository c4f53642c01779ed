#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query with an oracle in <verifyOutDir>/oracle_sql.json:
  - load the Spark result parquet written by graft.Verify
  - run the oracle SQL in DuckDB with views over <sfDir>/*.parquet
  - compare as multisets (group-by-all + count), columns sorted by name,
    exact value equality.
Prints PASS/FAIL per query and a diff sample on mismatch.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            sp_types = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()}
            du_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
            skew = [c for c in set(sp_types) | set(du_types)
                    if sp_types.get(c) != du_types.get(c)]
            if skew:
                n_fail += 1
                for c in skew:
                    print(f"FAIL {name}: type skew on '{c}': "
                          f"spark={sp_types.get(c)} oracle={du_types.get(c)}")
                continue
            res = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").arrow()
            cols = sorted(res.column_names)
            collist = ", ".join(f'"{c}"' for c in cols)
            con.register("spark_res", res)
            q = f"""
            WITH o AS ({sql}),
                 a AS (SELECT {collist}, count(*) AS __n FROM spark_res GROUP BY ALL),
                 b AS (SELECT {collist}, count(*) AS __n FROM o GROUP BY ALL)
            SELECT 'spark_only' AS side, * FROM (FROM a EXCEPT FROM b)
            UNION ALL
            SELECT 'oracle_only' AS side, * FROM (FROM b EXCEPT FROM a)
            """
            diff = con.execute(q).fetchall()
            nrows = con.execute("SELECT count(*) FROM spark_res").fetchone()[0]
            if diff:
                n_fail += 1
                print(f"FAIL {name}: {len(diff)} differing groups (spark rows={nrows})")
                for row in diff[:6]:
                    print("   ", row)
            else:
                n_pass += 1
                print(f"PASS {name} ({nrows} rows)")
            con.unregister("spark_res")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {str(e)[:300]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
