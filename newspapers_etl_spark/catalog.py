"""Table catalog: declared schemas + loaders for the test fixtures.

Schemas are declared, never inferred (reference duck-types dicts from JSON,
src/01-scrape-images.py:332-338; at 100 TB, inference is a full extra scan,
so the rebuild declares StructTypes up front — SURVEY.md §1.3).

``load_table`` reads one parquet table from a scale-factor directory.  The
read is a plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning and partition pruning on the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
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
)

# Dimension tables small enough to broadcast at every scale factor the
# fixtures ship (region=5, nation=25, supplier/part grow slowly). At 100 TB
# these stay broadcast-joinable; customer/orders/lineitem are fact-sized.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            # parquet isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from the parquet footer (exact),
    validated against the declared schema in tests/test_schemas.py; we do
    NOT pass the declared schema to the reader because parquet is
    self-describing and the footer schema is authoritative — declaration
    exists for documentation and for the streaming/JSON paths where
    inference would cost a scan.

    ``events.ts`` has shipped in two fixture encodings across driver
    generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects outright — read as raw nanos via the session-wide
    ``spark.sql.legacy.parquet.nanosAsLong`` set in session.py, then
    floor-divided to microseconds, the same ns→µs truncation DuckDB
    applies) and plain ``timestamp[us]`` with isAdjustedToUTC=false
    (which Spark reads as TIMESTAMP_NTZ).  Both normalize to session-tz
    TimestampType here, branching on the footer-derived dtype, so every
    downstream operator sees one stable schema."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Belt-and-braces for sessions not built by get_spark (a bare
        # SparkSession.builder in a notebook): the conf must be on
        # before the scan executes, and setting it twice is harmless.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):  # legacy TIMESTAMP(NANOS)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Session tz is UTC (session.py), so the cast is a pure
            # re-tag: identical wall values, identical DuckDB naive
            # semantics on the oracle side.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif not isinstance(ts_type, T.TimestampType):
            # Anything else (e.g. StringType from a corrupt fixture) is
            # a broken input: fail loudly instead of casting to nulls.
            raise TypeError(
                f"events.ts has unsupported dtype {ts_type}; expected "
                "TIMESTAMP, TIMESTAMP_NTZ, or legacy nanos (int64)"
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL entry point."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
