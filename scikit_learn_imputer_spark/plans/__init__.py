from scikit_learn_imputer_spark.plans.queries import QUERIES, ORACLE

__all__ = ["QUERIES", "ORACLE"]
