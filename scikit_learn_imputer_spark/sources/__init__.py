from scikit_learn_imputer_spark.sources.tables import TABLES, load_table, register_views
from scikit_learn_imputer_spark.sources.nulls import NULL_RULES, with_nulls, nulls_cte
from scikit_learn_imputer_spark.sources.territories import territories_df
from scikit_learn_imputer_spark.sources.layout import read_layout, write_sorted, write_zorder

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "NULL_RULES",
    "with_nulls",
    "nulls_cte",
    "territories_df",
    "read_layout",
    "write_sorted",
    "write_zorder",
]
