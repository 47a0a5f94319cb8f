"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf_dir, compare
row count + schema (column names) + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [sf_dir] [query ...] [--json OUT]")
            return 2
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entry_mod
    from pdfparse_spark.pipeline.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not produce a green zero-check run
        print("unknown query name(s): %s" % ", ".join(sorted(unknown)))
        return 2
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        results[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            rec["err"] = f"spark: {type(exc).__name__}: {exc}"
            failures += 1
            continue
        dt = time.monotonic() - t0
        rec["spark_rows"] = len(srows)
        if name not in oracles:
            rec["err"] = "no_oracle"
            print(f"ok   {name}: rows-only, {len(srows)} rows ({dt:.1f}s)")
            continue
        try:
            drel = con.sql(oracles[name])
            dcols = drel.columns
            drows = drel.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            rec["err"] = f"duckdb: {type(exc).__name__}: {exc}"
            failures += 1
            continue
        rec["oracle_rows"] = len(drows)
        rec["rows_match"] = len(srows) == len(drows)
        rec["schema_match"] = sorted(scols) == sorted(dcols)
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = value_hash(scols, [tuple(r) for r in srows])
            dh = value_hash(dcols, drows)
            rec["hash_match"] = sh == dh
            if sh != dh:
                problems.append(f"valuehash: spark={sh} duck={dh}")
                # print a few diffs for debugging
                # sort columns by name like value_hash, else differing
                # native column orders print every row as a spurious diff
                sord = sorted(range(len(scols)), key=lambda i: scols[i])
                dord = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {tuple(_norm_cell(r[i]) for i in sord) for r in srows}
                dset = {tuple(_norm_cell(r[i]) for i in dord) for r in drows}
                for r in list(sset - dset)[:3]:
                    print(f"       spark-only: {r}")
                for r in list(dset - sset)[:3]:
                    print(f"       duck-only : {r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match ({dt:.1f}s)")
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {json_out} ({len(results)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
