"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + schema (column names) + order-insensitive value hash.

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def spark_kind(dt) -> str:
    """Coarse type kind for a Spark DataType, for driver-style type checks."""
    name = dt.simpleString()
    if name in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if name in ("float", "double"):
        return "float"
    if name.startswith("decimal"):
        return "decimal"
    return "other"


def pandas_kind(dtype) -> str:
    """Coarse type kind for a pandas dtype (DuckDB .df() output).

    DuckDB maps HUGEINT (the default type of SUM over integers) to
    float64 — the driver's value hash is type-sensitive, so an uncast
    SUM in oracle_sql() shows up here as int-vs-float kind mismatch.
    """
    k = dtype.kind  # numpy kind char
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return "other"


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import __spark_entry__ as entry
    from crawleria_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows-only check, {len(srows)} rows")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            skinds = {f.name: spark_kind(f.dataType) for f in sdf.schema.fields}
            okinds = {c: pandas_kind(odf[c].dtype) for c in odf.columns}
            for c in scols:
                sk, ok = skinds.get(c), okinds.get(c)
                if "other" not in (sk, ok) and sk != ok:
                    problems.append(f"type-kind {c}: spark={sk} duckdb={ok}")
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"value-hash {sh} != {oh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "--debug" in sys.argv:
                o_sorted = sorted(map(str, orows))[:3]
                s_sorted = sorted(map(str, srows))[:3]
                print(f"   spark sample:  {s_sorted}")
                print(f"   duckdb sample: {o_sorted}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
