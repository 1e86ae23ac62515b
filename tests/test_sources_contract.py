"""Source-contract smoke tests (VERDICT.md r3 #2).

The testdata parquet is driver-owned and can be regenerated mid-round with
different physical encodings (round 3 casualty: events.ts flipped from
int64 TIMESTAMP(NANOS) to timestamp[us] and broke 39 tests downstream).
These tests pin the *logical* contract `load_table` must uphold for every
table, under every physical encoding we know can ship, so a drift fails
HERE first with one obvious message instead of as dozens of consumer
failures.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scikit_learn_imputer_spark.sources.tables import TABLES, load_table

# Logical contract: column name -> broad type class each consumer relies on.
# ("integral" covers int/bigint; "fractional" covers float/double/decimal;
#  exact widths are the driver's business, not ours.)
INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)
TIMESTAMPY = (T.TimestampType, T.TimestampNTZType)

EXPECTED = {
    "region": {"r_regionkey": INTEGRAL, "r_name": (T.StringType,)},
    "nation": {
        "n_nationkey": INTEGRAL,
        "n_regionkey": INTEGRAL,
        "n_name": (T.StringType,),
    },
    "customer": {
        "c_custkey": INTEGRAL,
        "c_nationkey": INTEGRAL,
        "c_acctbal": FRACTIONAL,
        "c_mktsegment": (T.StringType,),
    },
    "supplier": {
        "s_suppkey": INTEGRAL,
        "s_nationkey": INTEGRAL,
        "s_acctbal": FRACTIONAL,
    },
    "part": {
        "p_partkey": INTEGRAL,
        "p_brand": (T.StringType,),
        "p_retailprice": FRACTIONAL,
    },
    "orders": {
        "o_orderkey": INTEGRAL,
        "o_custkey": INTEGRAL,
        "o_totalprice": FRACTIONAL,
        "o_orderdate": TIMESTAMPY,
        "o_orderpriority": (T.StringType,),
        "o_orderstatus": (T.StringType,),
    },
    "lineitem": {
        "l_orderkey": INTEGRAL,
        "l_partkey": INTEGRAL,
        "l_suppkey": INTEGRAL,
        "l_quantity": INTEGRAL + FRACTIONAL,
        "l_extendedprice": FRACTIONAL,
        "l_discount": FRACTIONAL,
        "l_tax": FRACTIONAL,
        "l_returnflag": (T.StringType,),
        "l_linestatus": (T.StringType,),
        "l_shipdate": TIMESTAMPY,
    },
    "events": {
        "event_id": INTEGRAL,
        "ts": TIMESTAMPY,
        "user_id": INTEGRAL,
        "event_type": (T.StringType,),
        "value": FRACTIONAL,
        "props": (T.StringType,),
    },
    "documents": {
        "doc_id": INTEGRAL,
        "text": (T.StringType,),
        "lang": (T.StringType,),
        "source": (T.StringType,),
        "n_chars": INTEGRAL,
    },
    "embeddings": {
        "vec_id": INTEGRAL,
        "embedding": (T.ArrayType,),
        "label": INTEGRAL,
    },
}


@pytest.mark.parametrize("name", TABLES)
def test_table_contract(spark, sf_smoke, name):
    path = os.path.join(sf_smoke, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} not in testdata")
    df = load_table(spark, sf_smoke, name)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for col, classes in EXPECTED[name].items():
        assert col in by_name, f"{name}.{col} missing (have {sorted(by_name)})"
        assert isinstance(by_name[col], classes), (
            f"{name}.{col} is {by_name[col]}, expected one of "
            f"{[c.__name__ for c in classes]}"
        )


def test_events_ts_usable_in_time_arithmetic(spark, sf_smoke):
    """The exact operation that broke in round 3: any timestamp arithmetic
    over events.ts must resolve regardless of physical encoding."""
    ev = load_table(spark, sf_smoke, "events")
    out = ev.select(
        F.window("ts", "1 hour").alias("w"),
        F.unix_timestamp("ts").alias("epoch"),
    ).limit(5)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.epoch is not None for r in rows)


def test_events_ts_both_encodings(spark, tmp_path):
    """load_table must normalize BOTH known physical encodings of events.ts
    (legacy int64 nanos and timestamp[us]) to a session-tz timestamp with
    identical values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nanos = [1_700_000_000_000_000_000, 1_700_000_123_456_789_000]
    base = {
        "event_id": pa.array([1, 2], type=pa.int64()),
        "user_id": pa.array([10, 20], type=pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    }

    legacy_dir = tmp_path / "legacy" / "events.parquet"
    legacy_dir.mkdir(parents=True)
    pq.write_table(
        pa.table({**base, "ts": pa.array(nanos, type=pa.timestamp("ns"))}),
        str(legacy_dir / "part-0.parquet"),
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )

    micros_dir = tmp_path / "micros" / "events.parquet"
    micros_dir.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {**base, "ts": pa.array([n // 1000 for n in nanos],
                                    type=pa.timestamp("us"))}
        ),
        str(micros_dir / "part-0.parquet"),
    )

    legacy = load_table(spark, str(tmp_path / "legacy"), "events")
    micros = load_table(spark, str(tmp_path / "micros"), "events")
    for df in (legacy, micros):
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    lv = sorted(r.e for r in legacy.select(
        F.unix_micros("ts").alias("e")).collect())
    mv = sorted(r.e for r in micros.select(
        F.unix_micros("ts").alias("e")).collect())
    assert lv == mv == sorted(n // 1000 for n in nanos)
