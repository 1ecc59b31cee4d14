from nativeextractor_spark.io.tables import read_table, write_table, load_alias_dict_csv

__all__ = ["read_table", "write_table", "load_alias_dict_csv"]
