from featuretools_spark.primitives.base import (
    AggContext,
    AggregationPrimitive,
    TransformContext,
    TransformPrimitive,
    get_aggregation_primitive,
    get_transform_primitive,
    AGG_PRIMITIVES,
    TRANSFORM_PRIMITIVES,
)

# importing registers the standard library
import featuretools_spark.primitives.aggregation  # noqa: F401,E402
import featuretools_spark.primitives.transform  # noqa: F401,E402

__all__ = [
    "AggContext",
    "AggregationPrimitive",
    "TransformContext",
    "TransformPrimitive",
    "get_aggregation_primitive",
    "get_transform_primitive",
    "AGG_PRIMITIVES",
    "TRANSFORM_PRIMITIVES",
]
