from nativeextractor_spark.datagen.aliases import alias_rows, build_alias_df
from nativeextractor_spark.datagen.pages import (
    FIXTURE_TEXTS,
    generate_pages_df,
    page_rows,
)

__all__ = [
    "alias_rows",
    "build_alias_df",
    "FIXTURE_TEXTS",
    "generate_pages_df",
    "page_rows",
]
