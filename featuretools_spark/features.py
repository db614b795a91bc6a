"""Feature algebra — the logical-plan node types.

Mirrors the reference's feature DAG (feature_base/feature_base.py:
IdentityFeature:461, DirectFeature:507, AggregationFeature:632,
TransformFeature:842, GroupByTransformFeature:893) including
deterministic feature-name strings (aggregation_primitive_base.py:4-39,
feature_base.py:790-820) so matrices compare column-by-column.

Nodes are pure metadata; compilation to Spark plans happens in
cfm.py / asof.py.
"""

from __future__ import annotations

from featuretools_spark.entityset import EntitySet, Relationship
from featuretools_spark.timedelta import Timedelta
from featuretools_spark.primitives.base import (
    AggregationPrimitive,
    TransformPrimitive,
)
from featuretools_spark.primitives import (
    get_aggregation_primitive,
    get_transform_primitive,
)


class FeatureBase:
    entity: str  # table whose rows this feature describes

    def get_name(self) -> str:
        raise NotImplementedError

    def get_dependencies(self, deep=False) -> list:
        deps = list(self._deps())
        if deep:
            out = []
            for d in deps:
                out.append(d)
                out.extend(d.get_dependencies(deep=True))
            return out
        return deps

    def _deps(self):
        return []

    def get_depth(self) -> int:
        deps = self._deps()
        if not deps:
            return 0
        return self._own_depth() + max(d.get_depth() for d in deps)

    def _own_depth(self) -> int:
        return 1

    @property
    def number_output_features(self) -> int:
        return 1

    def rename(self, name: str) -> "FeatureBase":
        self._custom_name = name
        return self

    def __repr__(self):
        return f"<Feature: {self.get_name()}>"

    # ---- operator overloading (reference feature_base.py:275-452) ----
    def _binary(self, prim_name, other, scalar_prim_name):
        if isinstance(other, FeatureBase):
            return TransformFeature(get_transform_primitive(prim_name), [self, other])
        p = get_transform_primitive(scalar_prim_name)
        p.value = other
        return TransformFeature(p, [self])

    def __add__(self, other):
        return self._binary("add_numeric", other, "add_numeric_scalar")

    def __sub__(self, other):
        return self._binary("subtract_numeric", other, "subtract_numeric_scalar")

    def __mul__(self, other):
        return self._binary("multiply_numeric", other, "multiply_numeric_scalar")

    def __truediv__(self, other):
        return self._binary("divide_numeric", other, "divide_numeric_scalar")

    def __mod__(self, other):
        return self._binary("modulo_numeric", other, "modulo_numeric_scalar")

    def __gt__(self, other):
        return self._binary("greater_than", other, "greater_than_scalar")

    def __ge__(self, other):
        return self._binary("greater_than_equal_to", other, "greater_than_equal_to_scalar")

    def __lt__(self, other):
        return self._binary("less_than", other, "less_than_scalar")

    def __le__(self, other):
        return self._binary("less_than_equal_to", other, "less_than_equal_to_scalar")

    def __eq__(self, other):  # noqa: builds a feature, not a bool
        return self._binary("equal", other, "equal_scalar")

    def __ne__(self, other):
        return self._binary("not_equal", other, "not_equal_scalar")

    def __and__(self, other):
        return TransformFeature(get_transform_primitive("and"), [self, other])

    def __or__(self, other):
        return TransformFeature(get_transform_primitive("or"), [self, other])

    def __invert__(self):
        return TransformFeature(get_transform_primitive("not"), [self])

    def __abs__(self):
        return TransformFeature(get_transform_primitive("absolute"), [self])

    def __neg__(self):
        return TransformFeature(get_transform_primitive("negate"), [self])

    def __hash__(self):
        return hash(self.get_name())

    def is_null(self):
        return TransformFeature(get_transform_primitive("is_null"), [self])

    def isin(self, values):
        p = get_transform_primitive("isin")
        p.list_of_outputs = list(values)
        return TransformFeature(p, [self])


class IdentityFeature(FeatureBase):
    """A column reference (reference feature_base.py:461)."""

    def __init__(self, es: EntitySet, table: str, column: str):
        self.es = es
        self.entity = table
        self.column = column
        self._custom_name = None

    def get_name(self):
        return self._custom_name or self.column

    def __repr__(self):
        return f"<Feature: {self.entity}.{self.column}>"

    def __hash__(self):
        return hash((self.entity, self.column))

    def _own_depth(self):
        return 0


class TransformFeature(FeatureBase):
    """Row-wise (or windowed) function on the same table
    (reference feature_base.py:842)."""

    def __init__(self, primitive, base_features: list):
        self.primitive = (
            primitive
            if isinstance(primitive, TransformPrimitive)
            else get_transform_primitive(primitive)
        )
        self.base_features = [
            f if isinstance(f, FeatureBase) else f for f in base_features
        ]
        self.entity = self.base_features[0].entity
        self._custom_name = None

    def _deps(self):
        return self.base_features

    def get_name(self):
        if self._custom_name:
            return self._custom_name
        prim = self.primitive
        names = [f.get_name() for f in self.base_features]
        # infix names for operator-built features (reference parity)
        infix = {
            "add_numeric": "+", "subtract_numeric": "-",
            "multiply_numeric": "*", "divide_numeric": "/",
            "modulo_numeric": "%", "greater_than": ">",
            "greater_than_equal_to": ">=", "less_than": "<",
            "less_than_equal_to": "<=", "equal": "=", "not_equal": "!=",
            "and": "AND", "or": "OR",
        }
        if prim.name in infix and len(names) == 2:
            return f"{names[0]} {infix[prim.name]} {names[1]}"
        scalar_fmt = {
            "add_numeric_scalar": "{0} + {v}",
            "subtract_numeric_scalar": "{0} - {v}",
            "scalar_subtract_numeric_feature": "{v} - {0}",
            "multiply_numeric_scalar": "{0} * {v}",
            "divide_numeric_scalar": "{0} / {v}",
            "modulo_numeric_scalar": "{0} % {v}",
            "greater_than_scalar": "{0} > {v}",
            "greater_than_equal_to_scalar": "{0} >= {v}",
            "less_than_scalar": "{0} < {v}",
            "less_than_equal_to_scalar": "{0} <= {v}",
            "equal_scalar": "{0} = {v}",
            "not_equal_scalar": "{0} != {v}",
        }
        if prim.name in scalar_fmt:
            return scalar_fmt[prim.name].format(*names, v=getattr(prim, "value", ""))
        if prim.name == "not":
            return f"NOT({names[0]})"
        if prim.name == "is_null":
            return f"IS_NULL({names[0]})"
        if prim.name == "isin":
            return f"ISIN({names[0]})"
        return f"{prim.display_name()}({', '.join(names)})"


class GroupByTransformFeature(TransformFeature):
    """Transform partitioned by a categorical/FK column
    (reference feature_base.py:893)."""

    def __init__(self, primitive, base_features: list, groupby):
        super().__init__(primitive, base_features)
        self.groupby = groupby  # IdentityFeature

    def _deps(self):
        return self.base_features + [self.groupby]

    def get_name(self):
        if self._custom_name:
            return self._custom_name
        names = [f.get_name() for f in self.base_features]
        return (
            f"{self.primitive.display_name()}({', '.join(names)})"
            f" by {self.groupby.get_name()}"
        )


class AggregationFeature(FeatureBase):
    """Aggregate child rows up a backward relationship path
    (reference feature_base.py:632-748)."""

    def __init__(
        self,
        base_feature,
        parent_table: str,
        primitive,
        es: EntitySet | None = None,
        relationship_path: list[Relationship] | None = None,
        where=None,
        use_previous=None,
    ):
        self.primitive = (
            primitive
            if isinstance(primitive, AggregationPrimitive)
            else get_aggregation_primitive(primitive)
        )
        self.base_features = (
            list(base_feature) if isinstance(base_feature, (list, tuple)) else [base_feature]
        )
        self.child_entity = self.base_features[0].entity
        self.entity = parent_table
        self.es = es or getattr(self.base_features[0], "es", None)
        if relationship_path is None:
            paths = self.es.find_backward_paths(parent_table, self.child_entity)
            if len(paths) != 1:
                raise ValueError(
                    f"{len(paths)} backward paths from {parent_table} to "
                    f"{self.child_entity}; pass relationship_path explicitly"
                )
            relationship_path = paths[0]
        self.relationship_path = relationship_path
        self.where = where  # boolean FeatureBase on the child table
        self.use_previous = Timedelta.parse(use_previous) if use_previous else None
        self._custom_name = None

    def _deps(self):
        deps = list(self.base_features)
        if self.where is not None:
            deps.append(self.where)
        return deps

    def relationship_path_name(self) -> str:
        """Child name when the backward path is unique; the hop-name
        chain ("orders.log") otherwise — reference
        feature_base.py:835-839 + relationship.py:146-152, so diamond
        paths yield distinct feature names instead of colliding."""
        child = self.child_entity
        if self.es is not None:
            try:
                unique = len(
                    self.es.find_backward_paths(self.entity, child)
                ) <= 1
            except Exception:
                unique = True
            if not unique:
                return ".".join(r.child_name for r in self.relationship_path)
        return child

    def get_name(self):
        if self._custom_name:
            return self._custom_name
        prim = self.primitive
        child = self.relationship_path_name()
        kinds = getattr(prim, "input_kinds", ("numeric",))
        if kinds == ("index",):
            base = child  # COUNT(orders)
        elif kinds == ():
            ti = self.es.time_index(self.child_entity) if self.es else "time"
            base = f"{child}.{ti}"  # TIME_SINCE_LAST(orders.ts)
        else:
            base = ", ".join(f"{child}.{f.get_name()}" for f in self.base_features)
        where_str = ""
        if self.where is not None:
            where_str = f" WHERE {self.where.get_name()}"
        window_str = ""
        if self.use_previous is not None:
            window_str = f", Last {self.use_previous.get_name()}"
        return f"{prim.display_name()}({base}{where_str}{window_str})"


class DirectFeature(FeatureBase):
    """Pull a parent-table feature value down to the child via the FK
    (reference feature_base.py:507)."""

    def __init__(self, base_feature: FeatureBase, child_table: str,
                 es: EntitySet | None = None,
                 relationship: Relationship | None = None):
        self.base_feature = base_feature
        self.parent_entity = base_feature.entity
        self.entity = child_table
        self.es = es or getattr(base_feature, "es", None)
        if relationship is None:
            rels = [
                r
                for r in self.es.get_forward_relationships(child_table)
                if r.parent_name == self.parent_entity
            ]
            if len(rels) != 1:
                raise ValueError(
                    f"{len(rels)} relationships {child_table}->{self.parent_entity}"
                )
            relationship = rels[0]
        self.relationship = relationship
        self._custom_name = None

    def _deps(self):
        return [self.base_feature]

    def get_name(self):
        if self._custom_name:
            return self._custom_name
        return f"{self.parent_entity}.{self.base_feature.get_name()}"


class FeatureOutputSlice(FeatureBase):
    """Select one output of a multi-output primitive
    (reference feature_base.py:1012) — array element access."""

    def __init__(self, base_feature: FeatureBase, n: int):
        self.base_feature = base_feature
        self.n = n
        self.entity = base_feature.entity
        self.es = getattr(base_feature, "es", None)
        self._custom_name = None

    def _deps(self):
        return [self.base_feature]

    def get_name(self):
        if self._custom_name:
            return self._custom_name
        return f"{self.base_feature.get_name()}[{self.n}]"


def Feature(es: EntitySet, table: str, column: str) -> IdentityFeature:
    """Convenience constructor mirroring ft.Feature(es[t].ww[c])."""
    return IdentityFeature(es, table, column)
