"""featuretools_spark — a PySpark-native Deep Feature Synthesis engine.

A from-scratch re-expression of the query semantics of
alteryx/featuretools (reference: /root/reference) on Apache Spark:

- EntitySet data model (typed tables + 1:N relationships + time indexes)
- Feature algebra (identity / direct / aggregation / transform /
  groupby-transform) compiled to Spark DataFrame plans
- Point-in-time correctness (cutoff times, training windows,
  include_cutoff_time) via a sort-merge as-of kernel or a pure-JVM
  conditional-aggregation plan
- A primitive library (aggregation + transform) where every primitive
  is a Catalyst Column-expression builder first, and a vectorized
  pandas kernel only where Spark has no builtin.

Architecture is Spark-first (DataFrame/Catalyst), NOT a port of the
reference's pandas execution engine.
"""

from featuretools_spark.entityset import EntitySet, Relationship
from featuretools_spark.timedelta import Timedelta
from featuretools_spark.features import (
    IdentityFeature,
    DirectFeature,
    AggregationFeature,
    TransformFeature,
    GroupByTransformFeature,
)
from featuretools_spark.cfm import calculate_feature_matrix
from featuretools_spark.dfs import dfs
from featuretools_spark.describe import describe_feature, list_primitives

__version__ = "0.1.0"

__all__ = [
    "describe_feature",
    "list_primitives",
    "EntitySet",
    "Relationship",
    "Timedelta",
    "IdentityFeature",
    "DirectFeature",
    "AggregationFeature",
    "TransformFeature",
    "GroupByTransformFeature",
    "calculate_feature_matrix",
    "dfs",
]
