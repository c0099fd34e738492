"""Local stand-in for the driver's correctness gate: run every
queries()[k] on Spark and oracle_sql()[k] on DuckDB at the given sf,
compare row count + column names + order-insensitive values + Arrow
column types (the driver's value-hash is dtype-sensitive: DuckDB
sum(BIGINT)→HUGEINT and sum(DECIMAL(18,2))→DECIMAL(38,2) diverge from
Spark LONG/DECIMAL(28,2) even when printed values agree — round-1
lesson; string-normalized comparison alone cannot see it).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from datetime import timezone
from decimal import Decimal

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon_type(t: pa.DataType) -> str:
    """Canonical type token: strict on int width and decimal
    precision/scale (those break the driver hash), lenient on
    representation-only variants (large_string/large_binary, list
    flavors). Timestamps are tz-STRICT on the DuckDB side: the driver
    failed recrawl_schedule in r3 on TIMESTAMPTZ (DuckDB to_timestamp)
    vs plain TIMESTAMP while this gate's old tz-folding passed it — a
    gate more lenient than the driver certifies wrong claims. The
    SPARK side is pre-normalized by _strip_spark_tz below (Spark's
    toArrow always annotates TimestampType with the session tz; the
    driver treats Spark TIMESTAMP == DuckDB naive TIMESTAMP — r3
    requeue_schedule passed with exactly that pairing)."""
    if pa.types.is_timestamp(t):
        return f"timestamp[tz={t.tz}]" if t.tz else "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        # HUGEINT arrives as decimal128(38,0) — keep decimals strict
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_signed_integer(t):
        # int32 vs int64 passed the driver hash in round 1 (row_number
        # results) — the driver normalizes integer widths; match that
        return "int"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def _strip_spark_tz(tbl: pa.Table) -> pa.Table:
    """Fold Spark's session-tz Arrow annotation (TimestampType always
    arrives tz=UTC here) back to the naive TIMESTAMP the driver models
    it as. Applied ONLY to the Spark table — DuckDB tz stays strict."""
    fields = []
    changed = False
    for f in tbl.schema:
        if pa.types.is_timestamp(f.type) and f.type.tz is not None:
            fields.append(pa.field(f.name, pa.timestamp(f.type.unit)))
            changed = True
        else:
            fields.append(f)
    if not changed:
        return tbl
    return tbl.cast(pa.schema(fields))


def norm_cell(v):
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        # Spark arrow timestamps are tz=UTC, DuckDB's naive — same instant
        if getattr(v, "tzinfo", None) is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from hiispider_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="oracle-check", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stbl = _strip_spark_tz(sdf.toArrow())
            srows = [tuple(r.values()) for r in stbl.to_pylist()]
            stypes = {f.name: canon_type(f.type) for f in stbl.schema}
        except Exception as e:
            print(f"FAIL  {name:24s} spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in os_:
            print(
                f"ROWS  {name:24s} rows={len(srows)} (no oracle)  "
                f"{time.time()-t0:.1f}s"
            )
            n_rows_only += 1
            continue
        try:
            otbl = con.execute(os_[name]).fetch_arrow_table()
            ocols = otbl.schema.names
            orows = [tuple(r.values()) for r in otbl.to_pylist()]
            otypes = {f.name: canon_type(f.type) for f in otbl.schema}
        except Exception as e:
            print(f"FAIL  {name:24s} duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_types = ok_cols and all(stypes[c] == otypes[c] for c in scols)
        ok_count = len(srows) == len(orows)
        a = norm_rows(scols, srows)
        b = norm_rows(ocols, orows)
        ok_vals = a == b
        if ok_cols and ok_types and ok_count and ok_vals:
            print(f"PASS  {name:24s} rows={len(srows)}  {time.time()-t0:.1f}s")
            n_pass += 1
        else:
            print(
                f"FAIL  {name:24s} cols_ok={ok_cols} types_ok={ok_types} "
                f"count {len(srows)}vs{len(orows)} vals_ok={ok_vals}"
            )
            if not ok_cols:
                print(f"      spark cols: {sorted(scols)}")
                print(f"      duck  cols: {sorted(ocols)}")
            if ok_cols and not ok_types:
                for c in scols:
                    if stypes[c] != otypes[c]:
                        print(f"      {c}: spark={stypes[c]} duck={otypes[c]}")
            if a != b:
                diff_a = [r for r in a if r not in set(b)][:3]
                diff_b = [r for r in b if r not in set(a)][:3]
                print(f"      only-spark: {diff_a}")
                print(f"      only-duck : {diff_b}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
