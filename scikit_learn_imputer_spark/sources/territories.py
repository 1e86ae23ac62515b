"""The reference's golden fixture as a literal Spark DataFrame.

Source: /root/reference/test_data_territories.csv (19 rows, loaded at
tests.py:31). The pandas index becomes an explicit ``id BIGINT`` column —
Spark DataFrames have no row index (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TERRITORIES_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("Name", StringType(), False),
        StructField("Location", StringType(), True),
        StructField("km2", DoubleType(), True),
        StructField("gdp_per_capita", DoubleType(), True),
        StructField("population", LongType(), False),
    ]
)

_ROWS = [
    (0, "Anguilla", "Caribbean", 91.0, 9850.0, 14869),
    (1, "Bermuda", None, 54.0, 69240.0, 62506),
    (2, "British Virgin Islands", "Caribbean", 153.0, 28040.0, 31758),
    (3, "Cayman Islands", "Caribbean", 264.0, 146250.0, 68076),
    (4, "British Indian Ocean Territory", "Indian_Ocean", 60.0, None, 3000),
    (5, "Falklands", "South_Atlantic", 12173.0, 57170.0, 4727),
    (6, "Gibraltar", "Europe", 6.5, 74960.0, 34951),
    (7, "Montserrat", "Caribbean", 101.0, 25060.0, 5215),
    (8, "Saint Helena", "Mid_Atlantic", None, None, 4349),
    (9, "Ascension", "Mid_Atlantic", None, None, 1800),
    (10, "Tristan Da Cunha", "Mid_Atlantic", None, None, 309),
    (11, "South Georgia", "South_Atlantic", 3903.0, None, 99),
    (12, "Akrotiri and Dhekelia", None, 255.0, None, 15700),
    (13, "Turks & Caicos", "Caribbean", 430.0, 21920.0, 38191),
    (14, "Pitcairn", "Oceania", 47.0, 1700.0, 56),
    (15, "British Antarctic Territory", "Antartica", 1709400.0, None, 400),
    (16, "Jersey", "Europe", 118.2, None, 106800),
    (17, "Guernsey", "Europe", 78.0, None, 65849),
    (18, "Ise of Man", "Europe", 572.0, None, 84997),
]

TERRITORIES_CATEGORICAL = ["Name", "Location"]


def territories_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_ROWS, TERRITORIES_SCHEMA)
