"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, column names
(sorted), and exact values (rows sorted, columns sorted by name).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from gents_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def arrow_type_name(t):
    """Canonical Arrow type label.

    Catches the round-1 gate gap: DuckDB sum() over integers returns
    HUGEINT -> Arrow decimal128(38,0) while Spark returns bigint -> int64;
    the driver's typed value-hash distinguishes them even when the Python
    values compare equal. Timestamps are normalized (tz stripped) because
    Spark tags a session tz that the driver tolerates.
    """
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_name(t.value_type)}>"
    # Int widths are normalized: the round-1 driver hash passed queries where
    # Spark returned int32 vs DuckDB int64 (topk rn, token counts, ...), so
    # the gate coerces integer widths; only decimal-vs-int is distinguished.
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    return str(t)


def arrow_types(schema):
    return {f.name.lower(): arrow_type_name(f.type) for f in schema}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtab = rel.arrow()
            drows = [tuple(r.values()) for r in dtab.to_pylist()]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            failures.append((name, f"schema {sorted(scols)} vs {sorted(dcols)}"))
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        stypes = arrow_types(sdf.toArrow().schema)
        dtypes = arrow_types(dtab.schema)
        if stypes != dtypes:
            diff = {
                k: (stypes.get(k), dtypes.get(k))
                for k in set(stypes) | set(dtypes)
                if stypes.get(k) != dtypes.get(k)
            }
            failures.append((name, f"arrow types differ: {diff}"))
            print(f"FAIL {name}: arrow types differ {diff}")
            continue
        a = canon([tuple(r) for r in srows], [c.lower() for c in scols])
        b = canon(drows, [c.lower() for c in dcols])
        if a != b:
            bad = next(i for i in range(len(a)) if a[i] != b[i])
            failures.append((name, f"values differ at sorted row {bad}"))
            print(f"FAIL {name}: values differ\n  spark {a[bad]}\n  duck  {b[bad]}")
            continue
        print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
