"""Deep Feature Synthesis — feature enumeration.

Port of the reference's enumeration walk (synthesis/
deep_feature_synthesis.py:382-531: identity → backward recursion →
aggregations per backward path → transforms → forward recursion →
direct features), driven by our schema layer. Enumeration is pure
metadata work on the driver (no data touched); execution happens in
calculate_feature_matrix.

Defaults match the reference (primitives/utils.py:162-190):
agg  = [sum, std, max, skew, min, mean, count, percent_true,
        num_unique, mode]
trans = [day, year, month, weekday, num_words, num_characters]
(haversine/age apply only when latlong/date_of_birth columns exist).
"""

from __future__ import annotations

from featuretools_spark.entityset import EntitySet
from featuretools_spark.features import (
    AggregationFeature,
    DirectFeature,
    IdentityFeature,
    TransformFeature,
)
from featuretools_spark.primitives import (
    get_aggregation_primitive,
    get_transform_primitive,
)
from featuretools_spark.cfm import calculate_feature_matrix

DEFAULT_AGG_PRIMITIVES = [
    "sum", "std", "max", "skew", "min", "mean", "count",
    "percent_true", "num_unique", "mode",
]
DEFAULT_TRANS_PRIMITIVES = ["day", "year", "month", "weekday",
                            "num_words", "num_characters"]


def _column_kind(es: EntitySet, table: str, col: str) -> str:
    cs = es.meta[table].column_schemas.get(col)
    if cs is None:
        return "any"
    tags = cs.semantic_tags
    if "index" in tags:
        return "index"
    if "time_index" in tags:
        return "time_index"
    if "foreign_key" in tags:
        return "foreign_key"
    if cs.is_boolean():
        return "boolean"
    if cs.is_datetime():
        return "datetime"
    if cs.is_text():
        return "text"
    if cs.is_numeric():
        return "numeric"
    if cs.logical_type == "LatLong":
        return "latlong"
    if cs.logical_type == "Tokens":
        return "tokens"
    return "category"


def _matching_columns(es, table, kinds) -> list[str]:
    out = []
    for col in es[table].columns:
        k = _column_kind(es, table, col)
        if k in ("index", "time_index", "foreign_key", "tokens"):
            continue
        if "any" in kinds or k in kinds:
            out.append(col)
    return out


def build_features(
    entityset: EntitySet,
    target_dataframe_name: str,
    agg_primitives=None,
    trans_primitives=None,
    where_primitives=None,
    max_depth: int = 2,
    max_features: int | None = None,
    ignore_columns: dict | None = None,
) -> list:
    es = entityset
    target = target_dataframe_name
    agg_names = agg_primitives if agg_primitives is not None else DEFAULT_AGG_PRIMITIVES
    where_names = where_primitives if where_primitives is not None else ["count"]
    trans_names = (
        trans_primitives if trans_primitives is not None else DEFAULT_TRANS_PRIMITIVES
    )
    ignore = {t: set(cols) for t, cols in (ignore_columns or {}).items()}

    feats: list = []
    seen: set = set()

    def add(f):
        n = f.get_name()
        if n not in seen:
            seen.add(n)
            feats.append(f)

    def usable(table, col):
        return col not in ignore.get(table, set())

    # 1. identity features of the target (non-index/time/fk columns)
    for col in es[target].columns:
        kind = _column_kind(es, target, col)
        if kind in ("index", "time_index", "foreign_key", "tokens"):
            continue
        if usable(target, col):
            add(IdentityFeature(es, target, col))

    # 2. aggregation features over every backward path of depth<=max_depth
    def backward_paths(start, depth):
        if depth == 0:
            return
        for rel in es.get_backward_relationships(start):
            yield [rel]
            for sub in backward_paths(rel.child_name, depth - 1):
                yield [rel] + sub

    agg_prims = [get_aggregation_primitive(a) for a in agg_names]
    for path in backward_paths(target, max_depth):
        child = path[-1].child_name
        for prim in agg_prims:
            kinds = getattr(prim, "input_kinds", ("numeric",))
            if kinds == ("index",):  # count
                base = IdentityFeature(es, child, es.index(child))
                add(AggregationFeature(base, target, type(prim)(), es=es,
                                       relationship_path=path))
                continue
            if kinds == ():  # pure time aggregates
                if es.time_index(child):
                    base = IdentityFeature(es, child, es.time_index(child))
                    add(AggregationFeature(base, target, type(prim)(), es=es,
                                           relationship_path=path))
                continue
            need_time = getattr(prim, "uses_time_index", False) or getattr(
                prim, "uses_calc_time", False
            )
            if need_time and not es.time_index(child):
                continue
            for col in _matching_columns(es, child, kinds):
                if not usable(child, col):
                    continue
                base = IdentityFeature(es, child, col)
                add(AggregationFeature(base, target, type(prim)(), es=es,
                                       relationship_path=path))

    # 2b. WHERE-clause variants from interesting_values
    #     (reference deep_feature_synthesis.py:876-893)
    where_prims = [get_aggregation_primitive(a) for a in where_names]
    for path in backward_paths(target, max_depth):
        child = path[-1].child_name
        iv = es.meta[child].interesting_values
        for col, vals in iv.items():
            for val in vals:
                where = IdentityFeature(es, child, col) == val
                for prim in where_prims:
                    kinds = getattr(prim, "input_kinds", ("numeric",))
                    if kinds == ("index",):
                        base = IdentityFeature(es, child, es.index(child))
                        add(AggregationFeature(base, target, type(prim)(),
                                               es=es, relationship_path=path,
                                               where=where))
                    elif kinds == ():
                        continue
                    else:
                        for bcol in _matching_columns(es, child, kinds):
                            if usable(child, bcol) and bcol != col:
                                base = IdentityFeature(es, child, bcol)
                                add(AggregationFeature(
                                    base, target, type(prim)(), es=es,
                                    relationship_path=path, where=where))

    # 3. transform features on the target
    trans_prims = [get_transform_primitive(t) for t in trans_names]
    for prim in trans_prims:
        if prim.n_inputs != 1:
            continue  # binary transforms enumerate quadratically; opt-in
        kinds = getattr(prim, "input_kinds", ("numeric",))
        for col in _matching_columns(es, target, kinds):
            if usable(target, col):
                add(TransformFeature(type(prim)(), [IdentityFeature(es, target, col)]))

    # 4. direct features from parents (identity at depth>=1,
    #    parent aggregations at depth>=2)
    for rel in es.get_forward_relationships(target):
        parent = rel.parent_name
        for col in es[parent].columns:
            kind = _column_kind(es, parent, col)
            if kind in ("index", "time_index", "foreign_key", "tokens"):
                continue
            if usable(parent, col):
                add(DirectFeature(IdentityFeature(es, parent, col), target,
                                  es=es, relationship=rel))
        if max_depth >= 2:
            for prel in es.get_backward_relationships(parent):
                if prel.child_name == target:
                    continue  # avoid trivially re-aggregating the target
                child = prel.child_name
                for prim in agg_prims:
                    kinds = getattr(prim, "input_kinds", ("numeric",))
                    if kinds == ("index",):
                        base = IdentityFeature(es, child, es.index(child))
                        agg = AggregationFeature(base, parent, type(prim)(), es=es,
                                                 relationship_path=[prel])
                        add(DirectFeature(agg, target, es=es, relationship=rel))

    if max_features:
        feats = feats[:max_features]
    return feats


def dfs(
    entityset: EntitySet = None,
    target_dataframe_name: str = None,
    cutoff_time=None,
    instance_ids=None,
    agg_primitives=None,
    trans_primitives=None,
    where_primitives=None,
    max_depth: int = 2,
    max_features: int | None = None,
    training_window=None,
    include_cutoff_time: bool = True,
    features_only: bool = False,
    ignore_columns: dict | None = None,
    strategy: str = "join",
):
    """Synthesize features and (unless features_only) compute the matrix.
    Mirrors ft.dfs (reference synthesis/dfs.py:12-299)."""
    features = build_features(
        entityset,
        target_dataframe_name,
        agg_primitives=agg_primitives,
        trans_primitives=trans_primitives,
        where_primitives=where_primitives,
        max_depth=max_depth,
        max_features=max_features,
        ignore_columns=ignore_columns,
    )
    if features_only:
        return features
    fm = calculate_feature_matrix(
        features,
        entityset,
        cutoff_time=cutoff_time,
        instance_ids=instance_ids,
        training_window=training_window,
        include_cutoff_time=include_cutoff_time,
        strategy=strategy,
    )
    return fm, features


def get_valid_primitives(entityset: EntitySet, target_dataframe_name: str,
                         max_depth: int = 2):
    """Which primitives would produce at least one feature for this
    target (reference synthesis/get_valid_primitives.py:10)."""
    from featuretools_spark.primitives import AGG_PRIMITIVES, TRANSFORM_PRIMITIVES

    valid_aggs, valid_trans = [], []
    for name in AGG_PRIMITIVES:
        feats = build_features(
            entityset, target_dataframe_name, agg_primitives=[name],
            trans_primitives=[], where_primitives=[], max_depth=max_depth,
        )
        if any(
            getattr(f, "primitive", None) is not None
            and f.primitive.name == name
            for f in feats
        ):
            valid_aggs.append(name)
    for name, cls in TRANSFORM_PRIMITIVES.items():
        if cls.n_inputs != 1 or getattr(cls, "strategy", "") == "pandas":
            continue
        feats = build_features(
            entityset, target_dataframe_name, agg_primitives=[],
            trans_primitives=[name], where_primitives=[], max_depth=1,
        )
        if any(
            getattr(f, "primitive", None) is not None
            and f.primitive.name == name
            for f in feats
        ):
            valid_trans.append(name)
    return valid_aggs, valid_trans
