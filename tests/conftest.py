import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (SparkSession.builder
             .master("local[4]")
             .appName("deequ-spark-tests")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "6g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def df_missing(spark):
    """FIXTURES.md F1: att1 has 6 nulls of 12, att2 has 3 nulls of 12."""
    rows = [
        ("1", "a", "f"), ("2", "b", "d"), ("3", None, "f"), ("4", "a", None),
        ("5", "a", "f"), ("6", None, "d"), ("7", None, "d"), ("8", "b", None),
        ("9", "a", "f"), ("10", None, None), ("11", None, "f"), ("12", None, "d"),
    ]
    return spark.createDataFrame(rows, "item string, att1 string, att2 string")


@pytest.fixture(scope="session")
def df_full(spark):
    """FIXTURES.md F2: 4 rows, complete, att1 in {a,b}, att2 in {c,d}."""
    rows = [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"), ("4", "b", "d")]
    return spark.createDataFrame(rows, "item string, att1 string, att2 string")


@pytest.fixture(scope="session")
def df_numeric(spark):
    """FIXTURES.md F4: att1=1..6, att2=(0,0,0,5,6,7)."""
    rows = [("1", 1, 0), ("2", 2, 0), ("3", 3, 0),
            ("4", 4, 5), ("5", 5, 6), ("6", 6, 7)]
    return spark.createDataFrame(rows, "item string, att1 int, att2 int")


@pytest.fixture(scope="session")
def df_unique(spark):
    """FIXTURES.md F5 subset: unique=1..6, nonUnique=(0,0,0,5,6,7)."""
    rows = [(1, 0), (2, 0), (3, 0), (4, 5), (5, 6), (6, 7)]
    return spark.createDataFrame(rows, "unique int, nonUnique int")


@pytest.fixture(scope="session")
def df_distinct(spark):
    """FIXTURES.md F6: att1=(a,a,null,b,b,c), att2=(null,null,x,x,x,y)."""
    rows = [("a", None), ("a", None), (None, "x"),
            ("b", "x"), ("b", "x"), ("c", "y")]
    return spark.createDataFrame(rows, "att1 string, att2 string")
