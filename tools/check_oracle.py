"""Local mimic of the driver's correctness gate: run every queries() entry in
Spark and its oracle_sql() in DuckDB at the given sf, compare row count +
order-insensitive value hash (columns sorted by name, values stringified).

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

With --json, also writes the results in the driver's CORRECTNESS schema
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) so each round can commit a durable full-gate artifact
(CORRECTNESS_local_rNN.json) covering the queries the driver's sampled
gate skipped.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm_cell(v):
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    # decimals stringify as-is (no normalize): the driver's hash compares the
    # rendered scale too, so queries must pin one explicit DECIMAL type on
    # both the Spark and oracle sides.
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entrymod
    from sparkrdf.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark("oracle-check", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"unknown queries: {sorted(unknown)} (did the --json flag "
                 "come first? usage is in the module docstring)")
    results = {}
    records = {}  # driver CORRECTNESS schema
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        records[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:200]}"
            rec["err"] = f"spark: {type(e).__name__}: {str(e)[:200]}"
            continue
        rec["spark_rows"] = len(srows)
        if name not in oracles:
            results[name] = f"rows-only: {len(srows)} rows"
            rec["err"] = "no_oracle"
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {type(e).__name__}: {str(e)[:300]}"
            rec["err"] = f"oracle: {type(e).__name__}: {str(e)[:300]}"
            continue
        rec["oracle_rows"] = len(orows)
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if not rec["schema_match"]:
            results[name] = f"SCHEMA MISMATCH: spark={sorted(scols)} oracle={sorted(ocols)}"
            continue
        rec["rows_match"] = len(srows) == len(orows)
        if not rec["rows_match"]:
            results[name] = f"ROWCOUNT MISMATCH: spark={len(srows)} oracle={len(orows)}"
            continue
        sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
        rec["hash_match"] = sh == oh
        if sh != oh:
            # show a few differing lines for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = {tuple(norm_cell(r[i]) for i in order_s) for r in srows}
            oset = {tuple(norm_cell(r[i]) for i in order_o) for r in orows}
            diff_s = sorted(sset - oset)[:3]
            diff_o = sorted(oset - sset)[:3]
            results[name] = f"VALUE MISMATCH: spark-only={diff_s} oracle-only={diff_o}"
        else:
            results[name] = f"OK ({len(srows)} rows)"

    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
            f.write("\n")

    width = max(len(n) for n in results)
    fails = 0
    for name, res in results.items():
        ok = res.startswith("OK") or res.startswith("rows-only")
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL'}  {name:<{width}}  {res}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
