"""Driver-mimic: run every queries() entry on Spark and its oracle_sql()
on DuckDB over the same sf dir; compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    # Width-insensitive but TYPE-sensitive, matching the driver: numpy
    # int32/int64 both normalize to python int, but a Decimal (DuckDB
    # HUGEINT/decimal via Arrow) renders differently from int — an oracle
    # returning uncast sum() must CAST to BIGINT or this flags it, exactly
    # like the driver did in round 1 (str() normalization masked that).
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from borges_spark.session import get_spark

    spark = get_spark(cores=8, app_name="oracle_check", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(s_rows)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            # Arrow path, not fetchall(): fetchall() converts HUGEINT to
            # python int and hides oracle typing bugs the driver catches.
            tbl = con.sql(oracles[name]).fetch_arrow_table()
            d_cols = tbl.schema.names
            cols = [c.to_pylist() for c in tbl.columns]  # ints stay int, nulls None, HUGEINT -> Decimal
            d_rows = list(zip(*cols)) if cols else []
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {str(ex)[:300]}")
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        else:
            hs = value_hash(s_rows, s_cols)
            hd = value_hash(d_rows, d_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("|".join(norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"first diff:\n  spark: {a[:200]}\n  duck : {b[:200]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(s_rows)} rows match  [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
