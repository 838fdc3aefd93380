"""Local replica of the driver's DuckDB-oracle comparison.

Runs a ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and
an order-insensitive value multiset — the same gate CORRECTNESS_r{N}.json
records, so failures surface here first.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLES:
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return conn


def _arrow_type_tag(t: pa.DataType) -> str:
    """Canonical type-family tag for a result column.

    The driver's value hash is type-sensitive: DuckDB typing a bare
    SUM(INT) as HUGEINT (→ arrow decimal128(38,0)) diverges from Spark's
    bigint even though the Python values compare equal. Tag each column
    with a family so that class of mismatch fails locally. Integer widths
    collapse to one family (the driver accepts i32 vs i64); decimals keep
    their scale (value repr depends on it); timestamps collapse (ns→µs
    truncation is handled at load)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return f"dec(s={t.scale})"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_floating(t):
        return "f64"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{_arrow_type_tag(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_arrow_type_tag(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{_arrow_type_tag(t.key_type)},{_arrow_type_tag(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


_SPARK_SIMPLE = {
    "byte": "int",
    "short": "int",
    "integer": "int",
    "long": "int",
    "float": "f32",
    "double": "f64",
    "boolean": "bool",
    "string": "str",
    "binary": "bin",
    "date": "date",
    "null": "null",
}


def _spark_type_tag(t) -> str:
    from pyspark.sql import types as T

    name = t.typeName()
    if name in _SPARK_SIMPLE:
        return _SPARK_SIMPLE[name]
    if isinstance(t, T.DecimalType):
        return f"dec(s={t.scale})"
    if name.startswith("timestamp"):
        return "ts"
    if isinstance(t, T.ArrayType):
        return f"list<{_spark_type_tag(t.elementType)}>"
    if isinstance(t, T.StructType):
        inner = ",".join(f"{f.name}:{_spark_type_tag(f.dataType)}" for f in t.fields)
        return f"struct<{inner}>"
    if isinstance(t, T.MapType):
        return f"map<{_spark_type_tag(t.keyType)},{_spark_type_tag(t.valueType)}>"
    return name


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark, sf_dir: str, query_fn, sql: str) -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    conn = duckdb_conn(sf_dir)
    try:
        res = conn.execute(sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        duck_arrow = conn.execute(sql).fetch_arrow_table()
    finally:
        conn.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"schema mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    spark_tags = {f.name: _spark_type_tag(f.dataType) for f in sdf.schema.fields}
    duck_tags = {
        f.name: _arrow_type_tag(f.type) for f in duck_arrow.schema
    }
    type_diff = {
        c: (spark_tags[c], duck_tags[c])
        for c in spark_tags
        if spark_tags[c] != duck_tags[c]
    }
    assert not type_diff, (
        "type-family mismatch (driver value hash is type-sensitive): "
        f"{type_diff}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    ns, nd = _norm_rows(spark_cols, spark_rows), _norm_rows(duck_cols, duck_rows)
    if ns != nd:
        diff_s = [r for r in ns if r not in set(nd)][:5]
        diff_d = [r for r in nd if r not in set(ns)][:5]
        raise AssertionError(
            f"value mismatch; spark-only sample={diff_s} duckdb-only sample={diff_d}"
        )
