"""IO shim tests: CSV→AliasDict (S7) and parquet table round-trip."""

from nativeextractor_spark.io import load_alias_dict_csv, read_table, write_table


def test_csv_alias_dict(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("csv")) + "/aliases.csv"
    spark.createDataFrame(
        [("acme", 1), ("globex", 2), ("čapek", 3)], "alias string, entity_id int"
    ).coalesce(1).write.option("header", "true").csv(p)
    d = load_alias_dict_csv(spark, p)
    assert d.lookup(b"acme") == 1
    assert d.lookup("čapek".encode()) == 3
    assert d.longest_prefix([b"globexxx"])[0] == 6


def test_table_roundtrip_parquet_fallback(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tbl")) + "/t"
    df = spark.range(10).withColumnRenamed("id", "k")
    write_table(df, p)
    back = read_table(spark, p)
    assert back.count() == 10 and back.columns == ["k"]
