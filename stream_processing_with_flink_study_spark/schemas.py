"""Fixed StructType schemas (SURVEY.md §1 data model).

The reference declares static row types per stream (POJOs:
``SensorReading.java:25-29`` with ``id:String, timestamp:long,
temperature:double``; ``Alert.java:23-24``; enum ``SmokeLevel.java:18-21``;
tuples ``RollingSum.java:34-35``).  We standardize event timestamps on
``TimestampType`` (Structured Streaming watermarks/windows require it),
keeping epoch-millis convenience derivable via ``unix_millis``.

Also declares the driver test tables (TESTDATA.md) so streaming file
sources can load them without inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference sensor domain (SensorReading.java:25-29) -------------------
SENSOR_READING = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("temperature", T.DoubleType(), False),
    ]
)

# SmokeLevel.java:18-21 — enum {LOW, HIGH} as a string column
SMOKE_LEVEL = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("level", T.StringType(), False),
    ]
)

# Alert.java:23-24
ALERT = T.StructType(
    [
        T.StructField("message", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# RollingSum.java:34-35 — Tuple3<Integer,Integer,Integer>
TUPLE3_INT = T.StructType(
    [
        T.StructField("f0", T.IntegerType(), False),
        T.StructField("f1", T.IntegerType(), False),
        T.StructField("f2", T.IntegerType(), False),
    ]
)

# --- driver tables (TESTDATA.md / FIXTURES.md §7) --------------------------
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
    "lineitem": LINEITEM,
    "orders": ORDERS,
}

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
