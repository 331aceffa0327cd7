#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
written by `graft.Verify` (parquet) run the corresponding oracle SQL from
oracle_sql.json in DuckDB over the same scale-factor tables and compare as
canonicalized sorted row sets.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: we target bitwise equality
    return str(v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(",".join(canon(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            # The driver fetches oracle results through pandas, where DuckDB's
            # HUGEINT (e.g. an uncast sum(BIGINT)) degrades to float64 and
            # canonicalizes as "7.0" instead of "7". fetchall() hides that
            # (HUGEINT -> Python int), so hard-fail on the TYPE before it can
            # silently pass here and fail in the driver's gate.
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            huge = [(c, t) for c, t, *_ in desc
                    if "HUGEINT" in str(t).upper()]
            if huge:
                failed.append(name)
                print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                      f"CAST the sum/agg to BIGINT in the oracle SQL")
                continue
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: error {e}")
            continue
        if sorted(gcols) != sorted(ecols):
            failed.append(name)
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}")
            continue
        g, e = rows_to_set(gcols, got), rows_to_set(ecols, exp)
        if g == e:
            print(f"OK   {name} ({len(g)} rows)")
        else:
            failed.append(name)
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            gs, es = set(g), set(e)
            for x in list(gs - es)[:3]:
                print(f"  spark-only:  {x[:200]}")
            for x in list(es - gs)[:3]:
                print(f"  oracle-only: {x[:200]}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} OK")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
