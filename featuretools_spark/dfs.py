"""Deep Feature Synthesis — feature enumeration.

Re-expression of the reference's enumeration walk (synthesis/
deep_feature_synthesis.py:382-531) over our schema layer, step for
step per visited dataframe:

  1 identity features  ->  2 backward recursion (max_depth-1)
  3 aggregations over every DEEP backward path (stacking on the
    child's own features, incl. its aggregations — the "deep" in DFS)
  4 transforms of identity + aggregation features
  5 forward recursion (max_depth-1)  ->  6 direct features
  7 transforms requiring a direct-feature input
  then interesting-value WHERE clauses for later parent visits.

Stacking legality mirrors can_stack_primitive_on_inputs
(deep_feature_synthesis.py:1124-1160) via the per-primitive
stack_on / stack_on_exclude / stack_on_self / base_of tables below
(values lifted from the reference's primitive declarations), and
transforms never take transform outputs as inputs
(not_a_transform_input, deep_feature_synthesis.py:1060-1066).

Enumeration is pure metadata work on the driver (no data touched);
execution happens in calculate_feature_matrix.

Defaults match the reference (primitives/utils.py:162-190):
agg  = [sum, std, max, skew, min, mean, count, percent_true,
        num_unique, mode]
trans = [age, day, year, month, weekday, haversine, num_words,
         num_characters]
"""

from __future__ import annotations

from featuretools_spark.entityset import LTI_COLUMN_NAME, EntitySet
from featuretools_spark.features import (
    AggregationFeature,
    DirectFeature,
    GroupByTransformFeature,
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
DEFAULT_TRANS_PRIMITIVES = ["age", "day", "year", "month", "weekday",
                            "haversine", "num_words", "num_characters"]

# per-primitive stacking declarations, lifted from the reference's
# aggregation primitives (e.g. sum_primitive.py:20-21, skew.py:24-25,
# count.py:20); absent names use PrimitiveBase defaults
# (stack_on_self=True, everything else None).
_STACK_SELF_FALSE = {
    "all", "any", "count", "count_above_mean", "count_below_mean",
    "count_greater_than", "count_inside_nth_std", "count_inside_range",
    "count_less_than", "count_outside_nth_std", "count_outside_range",
    "date_first_event", "entropy", "first", "first_last_time_delta",
    "has_no_duplicates", "is_monotonically_decreasing",
    "is_monotonically_increasing", "is_unique", "kurtosis", "last",
    "max_consecutive_false", "max_consecutive_negatives",
    "max_consecutive_positives", "max_consecutive_true",
    "max_consecutive_zeros", "max_min_delta", "max", "median_count",
    "min", "n_unique_days", "n_unique_days_of_calendar_year",
    "n_unique_days_of_month", "n_unique_months", "n_unique_weeks",
    "num_consecutive_greater_mean", "num_consecutive_less_mean",
    "num_false_since_last_true", "num_peaks", "num_true_since_last_false",
    "num_unique", "skew", "std", "sum", "time_since_last_false",
    "time_since_last_max", "time_since_last_min", "time_since_last_true",
    "variance",
}
_STACK_ON = {"num_true": set(), "percent_true": set(), "skew": set()}
_STACK_ON_EXCLUDE = {"sum": {"count"}, "num_true": set(),
                     "percent_true": set()}


def _column_kind(es: EntitySet, table: str, col: str) -> str:
    from featuretools_spark.schema import TYPED_STRING_KINDS

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
        # reference Age matches ONLY Datetime(semantic_tags=
        # {'date_of_birth'}) (age.py:29); a dob column still matches
        # plain Datetime inputs (Woodwork tag-superset rule)
        if "date_of_birth" in tags:
            return "date_of_birth"
        return "datetime"
    if cs.logical_type in TYPED_STRING_KINDS:
        return TYPED_STRING_KINDS[cs.logical_type]
    if cs.is_numeric():
        return "numeric"
    if cs.logical_type == "LatLong":
        return "latlong"
    if cs.logical_type == "Tokens":
        return "tokens"
    return "category"


def _feature_kind(es, f) -> str:
    """Kind of a feature's output, for input-type matching."""
    if isinstance(f, IdentityFeature):
        return _column_kind(es, f.entity, f.column)
    if isinstance(f, DirectFeature):
        return _feature_kind(es, f.base_feature)
    prim = getattr(f, "primitive", None)
    rk = getattr(prim, "return_kind", "numeric")
    if rk == "same":
        deps = f.get_dependencies()
        return _feature_kind(es, deps[0]) if deps else "numeric"
    return rk


def _kind_matches(kind: str, wanted: tuple) -> bool:
    """Reference type matching (is_valid_input analog): a time index
    is a Datetime column, an index/foreign key only matches when asked
    for explicitly (Count / groupbys)."""
    if kind in ("index", "foreign_key", "tokens"):
        return kind in wanted
    if kind == "time_index":
        kind = "datetime"
    if kind == "date_of_birth":
        return ("date_of_birth" in wanted or "datetime" in wanted
                or "any" in wanted)
    return kind in wanted or "any" in wanted


def _root_primitive(f):
    """Through DirectFeatures to the original primitive (None for
    identity features) — reference _find_root_primitive."""
    while isinstance(f, DirectFeature):
        f = f.base_feature
    return getattr(f, "primitive", None)


def _can_stack(prim, inputs) -> bool:
    """Reference can_stack_primitive_on_inputs
    (deep_feature_synthesis.py:1124-1160), on primitive names."""
    name = prim.name
    self_ok = name not in _STACK_SELF_FALSE
    stack_on = _STACK_ON.get(name)  # None -> anything
    stack_on_exclude = _STACK_ON_EXCLUDE.get(name, set())
    for f in inputs:
        fp = _root_primitive(f)
        if fp is None:
            continue  # identity input: always allowed
        if not self_ok and fp.name == name:
            return False
        if fp.name in stack_on_exclude:
            return False
        if f.number_output_features > 1:
            return False
        # permitted? (stack_on_self / stack_on / base_of chain)
        if self_ok and fp.name == name:
            continue
        if stack_on is None or fp.name in stack_on:
            continue
        base_of = getattr(fp, "base_of", None)
        if base_of is None or name in base_of:
            continue
        return False
    return True


def _not_a_transform_input(f) -> bool:
    from featuretools_spark.primitives.base import TransformPrimitive

    return not isinstance(_root_primitive(f), TransformPrimitive)


def _all_direct_same_path(inputs) -> bool:
    rel = getattr(inputs[0], "relationship", None)
    for f in inputs:
        if not isinstance(f, DirectFeature) or f.relationship is not rel:
            return False
    return True


def build_features(
    entityset: EntitySet,
    target_dataframe_name: str,
    agg_primitives=None,
    trans_primitives=None,
    where_primitives=None,
    groupby_trans_primitives=None,
    max_depth: int = 2,
    max_features: int | None = None,
    ignore_columns: dict | None = None,
    where_stacking_limit: int = 1,
    return_kinds=None,
    seed_features=None,
    drop_contains=None,
    drop_exact=None,
    ignore_dataframes=None,
    allowed_paths=None,
    primitive_options=None,
) -> list:
    es = entityset
    target = target_dataframe_name
    ignore_df = set(ignore_dataframes or [])
    if target in ignore_df:
        raise ValueError("target dataframe cannot be in ignore_dataframes")
    # reference compares tuple(path.dataframes()) — the start table
    # followed by each hop's destination — against the allowed set
    # (deep_feature_synthesis.py:179-183, 414-420)
    allowed = ({tuple(p) for p in allowed_paths}
               if allowed_paths else None)
    seeds = list(seed_features or [])
    seed_names = {f.get_name() for f in seeds}
    # primitive_options: per-primitive include/ignore filters on input
    # columns/dataframes (reference options_utils.py:204-238
    # column_filter — mirrored exactly, including its first-dependency
    # return under include_dataframes). Keys: primitive name, tuple of
    # names, or a primitive class/instance; values: one option dict
    # for all inputs, or a list of dicts matched per input position.
    popts: dict = {}
    for k, v in (primitive_options or {}).items():
        if isinstance(k, (tuple, list)):
            keys = list(k)
        else:
            keys = [k]
        names = [
            kk if isinstance(kk, str) else getattr(kk, "name", str(kk))
            for kk in keys
        ]
        opts = list(v) if isinstance(v, list) else [v]
        for nm in names:
            popts[nm] = opts

    def _opt_col_filter(f, opt, groupby=False):
        ic = "include_groupby_columns" if groupby else "include_columns"
        xc = "ignore_groupby_columns" if groupby else "ignore_columns"
        idf = ("include_groupby_dataframes" if groupby
               else "include_dataframes")
        xdf = ("ignore_groupby_dataframes" if groupby
               else "ignore_dataframes")
        for b in f.get_dependencies(deep=True) + [f]:
            if isinstance(b, IdentityFeature):
                if ic in opt and b.entity in opt[ic]:
                    if b.get_name() in opt[ic][b.entity]:
                        continue
                    return False
                if (xc in opt and b.entity in opt[xc]
                        and b.get_name() in opt[xc][b.entity]):
                    return False
            if idf in opt:
                return b.entity in opt[idf]
            if xdf in opt and b.entity in opt[xdf]:
                return False
        return True

    def filter_matches(prim, matches, groupby=False):
        opts = popts.get(prim.name)
        if not opts:
            return matches
        if len(opts) > 1:
            return [
                m for m in matches
                if len(m) == len(opts)
                and all(_opt_col_filter(f, o, groupby)
                        for f, o in zip(m, opts))
            ]
        return [m for m in matches
                if all(_opt_col_filter(f, opts[0], groupby) for f in m)]
    agg_prims = [
        get_aggregation_primitive(a)
        for a in (agg_primitives if agg_primitives is not None
                  else DEFAULT_AGG_PRIMITIVES)
    ]
    trans_prims = [
        get_transform_primitive(t)
        for t in (trans_primitives if trans_primitives is not None
                  else DEFAULT_TRANS_PRIMITIVES)
    ]
    where_names = {
        get_aggregation_primitive(a).name
        for a in (where_primitives if where_primitives is not None
                  else ["count"])
    }
    gb_prims = [get_transform_primitive(t)
                for t in (groupby_trans_primitives or [])]
    ignore = {t: set(cols) for t, cols in (ignore_columns or {}).items()}

    all_features: dict[str, dict] = {}
    where_clauses: dict[str, list] = {}
    _depths: dict = {}

    def depth(f) -> int:
        """Feature depth, counting seed features as 0 (reference
        get_feature_depth(stop_at=seed_features) — DFS stacks on a
        seed as if it were an identity column)."""
        key = id(f)
        if key not in _depths:
            if f.get_name() in seed_names:
                _depths[key] = 0
            else:
                deps = f.get_dependencies()
                _depths[key] = (
                    0 if not deps
                    else f._own_depth() + max(depth(d) for d in deps)
                )
        return _depths[key]

    def add(table, f):
        d = all_features[table]
        n = f.get_name()
        if n not in d:
            d[n] = f

    def flat(table, max_d):
        """Candidate input features of `table` with depth <= max_d
        (reference _features_by_type)."""
        if max_d is not None and max_d < 0:
            return []
        if table not in all_features:
            return []
        return [
            f for f in all_features[table].values()
            if max_d is None or depth(f) <= max_d
        ]

    def in_path(f, path_cols) -> bool:
        """Identity feature of a relationship-path key column
        (reference _feature_in_relationship_path)."""
        return (
            isinstance(f, IdentityFeature)
            and (f.entity, f.column) in path_cols
        )

    # ---- step 3 helper ------------------------------------------------
    def build_agg_features(ptable, path, max_d):
        child = path[-1].child_name
        new_md = None if max_d is None else max_d - 1
        wheres = where_clauses.get(child, [])
        path_cols = set()
        for r in path:
            path_cols.add((r.parent_name, r.parent_col))
            path_cols.add((r.child_name, r.child_col))
        pool = flat(child, new_md)
        for prim in agg_prims:
            kinds = getattr(prim, "input_kinds", ("numeric",))
            if kinds == ("index",):
                # COUNT takes the child's index column; like every
                # candidate it must exist in the child's feature dict
                # (absent when recursion depth ran out — reference
                # _features_by_type returns [] then)
                matches = [
                    (f,) for f in pool
                    if isinstance(f, IdentityFeature)
                    and f.column == es.index(child)
                ]
            elif kinds == ():
                if not es.time_index(child):
                    continue
                matches = [
                    (f,) for f in pool
                    if isinstance(f, IdentityFeature)
                    and f.column == es.time_index(child)
                ]
            else:
                need_time = (getattr(prim, "uses_time_index", False)
                             or getattr(prim, "uses_calc_time", False))
                if need_time and not es.time_index(child):
                    continue
                matches = [
                    (f,) for f in pool
                    if _kind_matches(_feature_kind(es, f), kinds)
                    and not (isinstance(f, DirectFeature)
                             and f.parent_entity == ptable)
                    and not in_path(f, path_cols)
                    and f.number_output_features == 1
                ]
            matches = filter_matches(prim, matches)
            for m in matches:
                if not _can_stack(prim, m):
                    continue
                new_f = AggregationFeature(
                    m[0], ptable, type(prim)(), es=es, relationship_path=path
                )
                add(ptable, new_f)
                # limit the stacking of where features (reference
                # where_stacking_limit, deep_feature_synthesis.py:852-866)
                feat_wheres = 0
                for f in m:
                    for ff in [f] + f.get_dependencies(deep=True):
                        if (isinstance(ff, AggregationFeature)
                                and ff.where is not None):
                            feat_wheres += 1
                if feat_wheres >= where_stacking_limit:
                    continue
                if prim.name not in where_names:
                    continue
                base_names = {b.get_name() for b in new_f.base_features}
                for w in wheres:
                    if any(bf.get_name() in base_names
                           for bf in w.base_features):
                        continue
                    add(ptable, AggregationFeature(
                        m[0], ptable, type(prim)(), es=es,
                        relationship_path=path, where=w,
                    ))

    # ---- step 4/7 helper ----------------------------------------------
    def build_transform_features(table, max_d, require_direct=False):
        new_md = None if max_d is None else max_d - 1
        to_add = []
        pool = [
            f for f in flat(table, new_md)
            if _not_a_transform_input(f) and f.number_output_features == 1
        ]
        for prim in trans_prims:
            kinds = getattr(prim, "input_kinds", ("numeric",))
            if prim.n_inputs == 1:
                matches = [
                    (f,) for f in pool
                    if _kind_matches(_feature_kind(es, f), kinds)
                ]
            elif prim.n_inputs == 2:
                # binary transforms declare per-position kinds,
                # e.g. ("numeric", "boolean")
                c0 = [f for f in pool
                      if _kind_matches(_feature_kind(es, f), (kinds[0],))]
                c1 = [f for f in pool
                      if _kind_matches(_feature_kind(es, f), (kinds[1],))]
                matches = []
                if getattr(prim, "commutative", False) and kinds[0] == kinds[1]:
                    for i, a in enumerate(c0):
                        for b in c0[i + 1:]:
                            matches.append((a, b))
                else:
                    for a in c0:
                        for b in c1:
                            if a.get_name() != b.get_name():
                                matches.append((a, b))
            else:
                continue
            if require_direct:
                matches = [
                    m for m in matches
                    if any(isinstance(x, DirectFeature) for x in m)
                    and not _all_direct_same_path(m)
                ]
            for m in filter_matches(prim, matches):
                if _can_stack(prim, m):
                    to_add.append(TransformFeature(type(prim)(), list(m)))
        # groupby transforms: FK features are the default groupbys
        # (reference deep_feature_synthesis.py:686-766)
        if gb_prims:
            # groupby candidates: FK identity columns (the execution
            # layer partitions by the raw column)
            gbs = [f for f in flat(table, new_md)
                   if isinstance(f, IdentityFeature)
                   and _feature_kind(es, f) == "foreign_key"]
            for prim in gb_prims:
                kinds = getattr(prim, "input_kinds", ("numeric",))
                cands = [f for f in pool
                         if _kind_matches(_feature_kind(es, f), kinds)]
                cands = [m[0] for m in
                         filter_matches(prim, [(c,) for c in cands])]
                p_gbs = [m[0] for m in
                         filter_matches(prim, [(g,) for g in gbs],
                                        groupby=True)]
                for c in cands:
                    if not _can_stack(prim, (c,)):
                        continue
                    for g in p_gbs:
                        if require_direct:
                            g_direct = isinstance(g, DirectFeature)
                            c_direct = isinstance(c, DirectFeature)
                            if not c_direct and not g_direct:
                                continue
                            if (c_direct and g_direct
                                    and _all_direct_same_path((c, g))):
                                continue
                        to_add.append(GroupByTransformFeature(
                            type(prim)(), [c], groupby=g))
        for f in to_add:
            add(table, f)

    # ---- step 6 helper -------------------------------------------------
    def build_forward_features(table, rel, max_d):
        parent = rel.parent_name
        path_cols = {(rel.parent_name, rel.parent_col),
                     (rel.child_name, rel.child_col)}
        for f in flat(parent, max_d):
            if in_path(f, path_cols):
                continue
            add(table, DirectFeature(f, table, es=es, relationship=rel))

    def build_where_clauses(table):
        out = []
        for f in all_features[table].values():
            if isinstance(f, IdentityFeature):
                tbl, col = f.entity, f.column
            elif (isinstance(f, DirectFeature)
                  and isinstance(f.base_feature, IdentityFeature)):
                tbl, col = f.base_feature.entity, f.base_feature.column
            else:
                continue
            for val in es.meta[tbl].interesting_values.get(col, []):
                out.append(f == val)
        where_clauses[table] = out

    # ---- the walk (reference _run_dfs) ----------------------------------
    def deep_backward_paths(start, on_path):
        for rel in es.get_backward_relationships(start):
            if rel.child_name in on_path:
                continue
            yield [rel]
            for sub in deep_backward_paths(
                    rel.child_name, on_path | {rel.child_name}):
                yield [rel] + sub

    def path_ok(names: tuple) -> bool:
        return allowed is None or names in allowed

    def run_dfs(table, max_d, path_names):
        if max_d is not None and max_d < 0:
            return
        all_features[table] = {}
        # 1: identity features (every column; type matching gates use)
        for col in es[table].columns:
            if col in ignore.get(table, set()) or col == LTI_COLUMN_NAME:
                continue
            add(table, IdentityFeature(es, table, col))
        # 1b: seed features at this grain join the pool so DFS stacks
        # on them (reference _add_identity_features:584-586)
        for sf in seeds:
            if getattr(sf, "entity", None) == table:
                add(table, sf)
        # 2: backward recursion
        for rel in es.get_backward_relationships(table):
            if (rel.child_name in all_features
                    or rel.child_name in ignore_df
                    or not path_ok(path_names + (rel.child_name,))):
                continue
            run_dfs(rel.child_name, None if max_d is None else max_d - 1,
                    path_names + (rel.child_name,))
        # 3: aggregations over deep backward paths
        for path in deep_backward_paths(table, {table}):
            # reference gates on the terminal child and the full
            # target-relative path tuple (deep_feature_synthesis.py:443-449)
            if path[-1].child_name in ignore_df:
                continue
            full = path_names + tuple(r.child_name for r in path)
            if not path_ok(full):
                continue
            build_agg_features(table, path, max_d)
        # 4: transforms of identity + aggregation features
        build_transform_features(table, max_d)
        # 5: forward recursion
        for rel in es.get_forward_relationships(table):
            if (rel.parent_name in all_features
                    or rel.parent_name in ignore_df
                    or not path_ok(path_names + (rel.parent_name,))):
                continue
            run_dfs(rel.parent_name, None if max_d is None else max_d - 1,
                    path_names + (rel.parent_name,))
        # 6: direct features
        for rel in es.get_forward_relationships(table):
            if (rel.parent_name in ignore_df
                    or not path_ok(path_names + (rel.parent_name,))):
                continue
            build_forward_features(table, rel, max_d)
        # 7: transforms of direct features
        build_transform_features(table, max_d, require_direct=True)
        build_where_clauses(table)

    run_dfs(target, max_depth, (target,))

    # ---- finalize (reference build_features:324-360) --------------------
    feats = list(all_features.get(target, {}).values())
    idx = es.index(target)
    keep_kinds = (
        ("numeric", "category", "boolean")
        if return_kinds is None else return_kinds
    )

    def keep(f):
        if (isinstance(f, IdentityFeature) and f.entity == target
                and f.column == idx):
            return False
        if keep_kinds == "all":
            return True
        k = _feature_kind(es, f)
        if k == "foreign_key":
            # string/categorical FKs carry the category tag in the
            # reference and survive the return-type filter
            col = (f.base_feature.column if isinstance(f, DirectFeature)
                   else getattr(f, "column", None))
            tbl = (f.base_feature.entity if isinstance(f, DirectFeature)
                   else f.entity)
            cs = es.meta[tbl].column_schemas.get(col) if col else None
            if cs is not None and not cs.is_numeric():
                k = "category"
        return k in keep_kinds

    feats = [f for f in feats if keep(f)]
    # name-based drops (reference _filter_features:363-380): substring
    # then exact match, before the max_features cap
    if drop_contains:
        feats = [f for f in feats
                 if not any(s in f.get_name() for s in drop_contains)]
    if drop_exact:
        dx = set(drop_exact)
        feats = [f for f in feats if f.get_name() not in dx]
    feats.sort(key=depth)  # stable: insertion order within each depth
    if max_features:
        feats = feats[:max_features]
    return feats


def dfs(
    dataframes: dict | None = None,
    relationships: list | None = None,
    entityset: EntitySet = None,
    target_dataframe_name: str = None,
    cutoff_time=None,
    instance_ids=None,
    agg_primitives=None,
    trans_primitives=None,
    where_primitives=None,
    groupby_trans_primitives=None,
    allowed_paths=None,
    max_depth: int = 2,
    ignore_dataframes=None,
    ignore_columns: dict | None = None,
    primitive_options=None,
    seed_features=None,
    drop_contains=None,
    drop_exact=None,
    max_features: int | None = None,
    training_window=None,
    approximate=None,
    include_cutoff_time: bool = True,
    features_only: bool = False,
    where_stacking_limit: int = 1,
    strategy: str = "join",
):
    """Synthesize features and (unless features_only) compute the matrix.
    Mirrors ft.dfs (reference synthesis/dfs.py:12-299).

    `dataframes`/`relationships` build an EntitySet inline, reference
    style: {name: (df, index[, time_index])} plus
    [(parent, parent_col, child, child_col), ...]. The reference's
    scheduler knobs (n_jobs, chunk_size, dask_kwargs, save_progress)
    have no equivalent here — Spark partitioning supersedes chunking
    and `featuretools_spark.io` checkpoints supersede save_progress.
    """
    if entityset is None:
        if not dataframes:
            raise ValueError("provide entityset= or dataframes=")
        entityset = EntitySet("dfs_es")
        for name, spec in dataframes.items():
            df, index = spec[0], spec[1]
            ti = spec[2] if len(spec) > 2 else None
            entityset.add_dataframe(name, df, index=index, time_index=ti)
        for rel in relationships or []:
            entityset.add_relationship(*rel)
    features = build_features(
        entityset,
        target_dataframe_name,
        agg_primitives=agg_primitives,
        trans_primitives=trans_primitives,
        where_primitives=where_primitives,
        groupby_trans_primitives=groupby_trans_primitives,
        max_depth=max_depth,
        max_features=max_features,
        ignore_columns=ignore_columns,
        where_stacking_limit=where_stacking_limit,
        seed_features=seed_features,
        drop_contains=drop_contains,
        drop_exact=drop_exact,
        ignore_dataframes=ignore_dataframes,
        allowed_paths=allowed_paths,
        primitive_options=primitive_options,
    )
    if features_only:
        return features
    fm = calculate_feature_matrix(
        features,
        entityset,
        cutoff_time=cutoff_time,
        instance_ids=instance_ids,
        training_window=training_window,
        approximate=approximate,
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
