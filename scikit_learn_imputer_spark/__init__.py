"""scikit_learn_imputer_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ONSBigData/scikit-learn-imputer.

The reference (/root/reference/scikit_learn_imputer/scikit_learn_imputer.py) is a
single-table, eager, in-memory pandas/sklearn imputation engine. This package
re-expresses every operator of that engine (SURVEY.md §2) as lazy, distributed
PySpark DataFrame plans, plus the large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing, streaming).

Design stance: DataFrame/SQL-first, Catalyst-optimized, no collect() of
data-sized frames, no single-partition windows, broadcast only provably-small
sides.
"""

from scikit_learn_imputer_spark.imputer import SparkImputer, find_imputation_variance
from scikit_learn_imputer_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["SparkImputer", "find_imputation_variance", "get_spark", "__version__"]
