"""calculate_feature_matrix — compile a feature DAG to ONE Spark plan.

Replaces the reference's per-unique-cutoff loop
(computational_backends/calculate_feature_matrix.py:51-369, 437-506)
with a single declarative plan:

- aggregation features are grouped by (relationship path, window,
  observation count) — one as-of aggregation per group (asof.py), all
  expression primitives fused into ONE groupBy (the Spark analog of
  the reference's `group_features` fusion, feature_set.py:157-183)
- where-clauses become conditional aggregation (F.when inside the
  agg), not a second pass (fsc.py:672-674 analog)
- direct features recurse: parent features are computed at the
  parent grain with propagated cutoffs, then joined back down the FK
  (fsc.py:594-650 analog); purely-static parent attributes skip the
  recursion and join directly (broadcast-able dimension join)
- transform features compile to Column expressions on the target
  frame; uses_full_dataframe (window) transforms are computed over
  the full table in time order BEFORE instance filtering
  (feature_set.py:102-155 semantics) — sound because all our window
  frames look only backward in time (no leakage)

Internally all features get sanitized column names (_f0.._fn); the
final select renames to reference-parity feature names.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from featuretools_spark.asof import CUTOFF_COL, AggSpec, asof_aggregate
from featuretools_spark.entityset import LTI_COLUMN_NAME, EntitySet
from featuretools_spark.features import (
    AggregationFeature,
    DirectFeature,
    FeatureBase,
    FeatureOutputSlice,
    GroupByTransformFeature,
    IdentityFeature,
    TransformFeature,
)
from featuretools_spark.primitives.base import TransformContext
from featuretools_spark.timedelta import Timedelta


# ----------------------------------------------------------------------
# shared-scan cache: one cfm call (including its recursive stacked
# sub-matrices) can consume the same fact table many times — deep-path
# groups, stacked inner matrices, direct-feature parents, where bases.
# Each consumer would otherwise be its own parquet scan + hop join in
# the physical plan (Catalyst dedupes exchanges, not scans). The cache
# hands every consumer the SAME column-pruned logical frame and, on the
# second request, persists it (MEMORY_AND_DISK): Spark's CacheManager
# substitutes the matching plan fragment with InMemoryRelation for
# every branch planned afterwards — including the first consumer's,
# since the final matrix is planned lazily at action time. Frames stay
# cached until the NEXT top-level cfm call (results are normally
# materialized in between); clear_scan_cache() releases them eagerly.
# ----------------------------------------------------------------------
_SCAN_CACHE: dict = {}
_SCAN_PERSISTED: list = []
_SCAN_COLS: dict = {}
_CFM_DEPTH = 0


def clear_scan_cache():
    """Unpersist frames cached by the previous calculate_feature_matrix
    call and reset the shared-scan cache."""
    for df in _SCAN_PERSISTED:
        try:
            df.unpersist()
        except Exception:
            pass
    _SCAN_PERSISTED.clear()
    _SCAN_CACHE.clear()
    _SCAN_COLS.clear()


def _cached_frame(key, builder, persistable=True) -> DataFrame:
    ent = _SCAN_CACHE.get(key)
    if ent is None:
        _SCAN_CACHE[key] = ent = [builder(), 0, persistable]
    ent[1] += 1
    if ent[2] and ent[1] == 2:
        from pyspark import StorageLevel

        ent[0] = ent[0].persist(StorageLevel.MEMORY_AND_DISK)
        _SCAN_PERSISTED.append(ent[0])
    return ent[0]


def _scan_base(es, name: str) -> DataFrame:
    """Column-pruned base frame for a table (pruning keeps the
    persisted cache as narrow as the parquet ReadSchema would be)."""
    df = es[name]
    cols = _SCAN_COLS.get(name)
    if cols:
        keep = [c for c in df.columns if c in cols]
        if len(keep) < len(df.columns):
            df = df.select(*keep)
    return df


def _pit_child(es, name: str, time_col, pit) -> DataFrame:
    """Deepest-child fact frame, PIT-pre-filtered at a scalar cutoff so
    the persisted cache holds only pre-cutoff history (the as-of layer
    re-applies the full predicate incl. training window). Per-row
    cutoffs cannot pre-filter — those frames are shared but never
    persisted (unbounded width at scale)."""
    if pit is None or time_col is None:
        return _cached_frame(
            (id(es), name, "base"),
            lambda: _scan_base(es, name),
            persistable=(pit is not None),
        )
    sc, inc, _tw = pit
    cut = F.lit(sc).cast("timestamp")
    pred = (F.col(time_col) <= cut) if inc else (F.col(time_col) < cut)
    return _cached_frame(
        (id(es), name, "pit", str(sc), inc),
        lambda: _scan_base(es, name).filter(pred),
    )


def _tgt(es, target: str) -> DataFrame:
    """Shared pruned target-table frame (key/time/ident projections all
    read one cached scan instead of one parquet scan per site)."""
    return _cached_frame(
        (id(es), target, "dim"), lambda: _scan_base(es, target))


def _needed_columns(es, feats) -> dict:
    """table -> set of columns any consumer of this cfm call (incl.
    recursive stacked sub-matrices — their features are in the dep
    closure) can touch: identity deps, relationship keys, time/LTI/
    secondary-time columns. Used to prune the cached scan frames so
    persisting them keeps parquet column pruning."""
    need: dict = {}

    def add(t, c):
        if c:
            need.setdefault(t, set()).add(c)

    seen, stack = set(), list(feats)
    while stack:
        f = stack.pop()
        if id(f) in seen:
            continue
        seen.add(id(f))
        if isinstance(f, IdentityFeature):
            add(f.entity, f.column)
        rels = list(getattr(f, "relationship_path", None) or [])
        r1 = getattr(f, "relationship", None)  # DirectFeature
        if r1 is not None:
            rels.append(r1)
        for r in rels:
            add(r.parent_name, r.parent_col)
            add(r.child_name, r.child_col)
        stack.extend(f.get_dependencies())
    for t in list(need):
        add(t, es.index(t))
        add(t, es.time_index(t))
        meta = es.meta.get(t)
        if meta is not None:
            for sec in (meta.secondary_time_index or {}):
                add(t, sec)
            if meta.last_time_index and LTI_COLUMN_NAME in es[t].columns:
                add(t, LTI_COLUMN_NAME)
    return need


# ----------------------------------------------------------------------
# strategy="auto" pre-flight (round 6, VERDICT r5 #3): the 10x stress
# probe located the join path's 100x knee at the FINAL (entity, cutoff)
# hash aggregation — its state is |cutoff pairs| x feature width and,
# unlike the map-side partials, cannot be combined away. Escalation
# ladder when the per-task slice of that state would cross the
# executor's execution-memory budget:
#   1. raise the shuffle width (state is hash-partitioned by the group
#      key, so width dilutes per-task state linearly; AQE coalesces
#      the extra partitions back for every SMALL stage, so
#      over-provisioning costs little)
#   2. if the width needed exceeds FT_SPARK_AUTO_MAX_PARTS, flip to
#      the sortmerge kernel: its memory is O(events per partition)
#      flat arrays, independent of cutoff density.
# Reference analog: the memory guardrail in featuretools'
# computational_backends/utils.py:193-206 (n_jobs x chunk memory vs
# system memory warning) — here it ACTS instead of warning.
# ----------------------------------------------------------------------

#: decision record of the most recent strategy="auto" pre-flight —
#: {"strategy", "reason", "state_bytes", "budget_bytes_per_task",
#:  "parts_before", "parts_after", "n_pairs", "n_agg_feats"}
LAST_PREFLIGHT: dict = {}


def _escalation_decision(state_bytes: int, budget_bytes_per_task: int,
                         current_parts: int, max_parts: int,
                         spill_tolerance: float | None = None) -> dict:
    """Pure decision core (unit-testable without a SparkSession).

    Returns {"strategy": "join"|"sortmerge", "parts": int|None,
    "reason": str}: parts is the escalated shuffle width when the
    current one would overflow the per-task budget, None when no
    change is needed.

    spill_tolerance (default 4, env FT_SPARK_AUTO_SPILL_TOLERANCE):
    escalation fires only when projected per-task state exceeds
    spill_tolerance x the fair-share budget. Calibrated round 7
    (BENCH/preflight_calibration_r7.json): Spark's unified manager
    lets a task transiently take pool/activeTasks — measured 512 MiB
    single-task hash-agg peaks, 3.3x the fair share, on a job whose
    static-width RSS fit the heap — and TungstenAggregationIterator's
    sort-fallback absorbs bounded overage, so escalating at 1x fair
    share paid a measured 22% width premium on workloads that fit
    (BENCH/stress_escalation_r6.json). Once escalation IS warranted,
    the new width targets 1x budget (land comfortably, hysteresis)."""
    import os
    if spill_tolerance is None:
        spill_tolerance = float(os.environ.get(
            "FT_SPARK_AUTO_SPILL_TOLERANCE", "4"))
    budget = max(budget_bytes_per_task, 1)
    per_task = state_bytes / max(current_parts, 1)
    if per_task <= budget * max(spill_tolerance, 1.0):
        return {
            "strategy": "join", "parts": None,
            "reason": (
                f"join hash-agg state ~{state_bytes >> 20} MiB over "
                f"{current_parts} tasks = {int(per_task) >> 10} KiB/task "
                f"within {spill_tolerance:g}x budget "
                f"{budget >> 20} MiB/task"),
        }
    needed = -(-state_bytes // budget)          # ceil
    if needed <= max_parts:
        return {
            "strategy": "join", "parts": int(needed),
            "reason": (
                f"join hash-agg state ~{state_bytes >> 20} MiB would put "
                f"{int(per_task) >> 20} MiB on each of {current_parts} "
                f"tasks (budget {budget >> 20} MiB/task); raising shuffle "
                f"width to {needed}"),
        }
    return {
        "strategy": "sortmerge", "parts": None,
        "reason": (
            f"join hash-agg state ~{state_bytes >> 20} MiB needs "
            f"{needed} partitions to fit {budget >> 20} MiB/task "
            f"(> FT_SPARK_AUTO_MAX_PARTS={max_parts}); sortmerge kernel "
            "bounds memory at O(events/partition) instead"),
    }


def _task_memory_budget(spark) -> int:
    """Per-task fair share of the unified memory region in bytes:
    heap x spark.memory.fraction / task slots. Heap comes from
    spark.executor.memory when set (cluster), else the driver JVM's
    Runtime.maxMemory() (local mode, where tasks share it).

    Round 7 recalibration: the r6 formula halved this twice more
    ("execution half" x "safety"), producing a 38 MiB budget on an
    8g/32-slot box whose tasks measurably peak at 512 MiB and whose
    static-width RSS fit — the estimator over-fired a 22% width
    premium (BENCH/stress_escalation_r6.json). Spill headroom now
    lives in _escalation_decision's spill_tolerance instead of being
    baked invisibly into the budget."""
    import os
    ov = os.environ.get("FT_SPARK_AUTO_TASK_BUDGET_BYTES")
    if ov:
        return int(ov)
    heap = None
    mem = spark.conf.get("spark.executor.memory", None)
    if mem and spark.sparkContext.master.startswith(
            ("local-cluster", "spark://", "yarn", "k8s")):
        units = {"k": 10, "m": 20, "g": 30, "t": 40}
        m = str(mem).strip().lower()
        if m[-1] in units:
            heap = int(float(m[:-1])) << units[m[-1]]
        else:
            # Spark's JavaUtils.byteStringAsMb treats a suffix-less
            # memory string as MiB, not bytes
            heap = int(m) << 20
        cores = int(spark.conf.get("spark.executor.cores", "1"))
    else:
        heap = int(str(
            spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
            .maxMemory()))
        cores = spark.sparkContext.defaultParallelism
    frac = float(spark.conf.get("spark.memory.fraction", "0.6"))
    return int(heap * frac / max(cores, 1))


def _resolve_auto_strategy(spark, base_keys: DataFrame,
                           n_agg_feats: int,
                           count_frame: DataFrame | None = None) -> str:
    """Run the pre-flight estimator and APPLY its decision: returns
    the resolved strategy, raising spark.sql.shuffle.partitions (and
    the AQE initial width, which is what AQE actually starts from)
    session-wide when the ladder's first rung fires. The conf change
    is sticky by design — the DataFrame executes lazily, after this
    function returns — and is logged with the reason."""
    import logging
    import os

    log = logging.getLogger("featuretools_spark.auto")
    if os.environ.get("FT_SPARK_AUTO_PREFLIGHT", "1") == "0":
        LAST_PREFLIGHT.clear()
        LAST_PREFLIGHT.update({"strategy": "join",
                               "reason": "preflight disabled by env"})
        return "join"
    # the cutoff table is an INPUT (usually a parquet scan): counting
    # it is metadata-cheap relative to the backfill it gates, and only
    # strategy="auto" pays it. r8 (BENCH/ab_preflight_r8.json): the
    # count is taken on the RAW cutoff frame when provided — a
    # map-side count with no exchange — instead of the distinct key
    # set, whose dedup shuffle cost 5.8s at 25.6M pairs. Duplicate
    # cutoff rows then overestimate n_pairs, which errs toward MORE
    # shuffle width (AQE coalesces unneeded partitions back), never
    # toward under-provisioning.
    n_pairs = (count_frame if count_frame is not None
               else base_keys).count()
    key_b = int(os.environ.get("FT_SPARK_AUTO_KEY_BYTES", "64"))
    feat_b = int(os.environ.get("FT_SPARK_AUTO_STATE_BYTES_PER_FEAT", "48"))
    state = n_pairs * (key_b + feat_b * max(n_agg_feats, 1))
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    max_parts = int(os.environ.get("FT_SPARK_AUTO_MAX_PARTS", "32768"))
    budget = _task_memory_budget(spark)
    d = _escalation_decision(state, budget, parts, max_parts)
    LAST_PREFLIGHT.clear()
    LAST_PREFLIGHT.update({
        "strategy": d["strategy"], "reason": d["reason"],
        "state_bytes": state, "budget_bytes_per_task": budget,
        "parts_before": parts, "parts_after": d["parts"] or parts,
        "n_pairs": n_pairs, "n_agg_feats": n_agg_feats,
    })
    if d["parts"]:
        spark.conf.set("spark.sql.shuffle.partitions", str(d["parts"]))
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(d["parts"]))
        log.warning("strategy=auto escalation: %s", d["reason"])
    elif d["strategy"] == "sortmerge":
        log.warning("strategy=auto escalation: %s", d["reason"])
    else:
        log.info("strategy=auto: %s", d["reason"])
    return d["strategy"]


def calculate_feature_matrix(*args, **kwargs) -> DataFrame:
    """Public entry: manages the shared-scan cache across the call and
    its recursive stacked sub-calls, then delegates to the engine."""
    global _CFM_DEPTH
    if _CFM_DEPTH == 0:
        clear_scan_cache()
        try:
            features = args[0] if args else kwargs["features"]
            es = (args[1] if len(args) > 1 else None) or \
                kwargs.get("entityset") or _find_es(features)
            _SCAN_COLS.update(_needed_columns(es, features))
        except Exception:
            _SCAN_COLS.clear()  # pruning is best-effort; cache full width
    _CFM_DEPTH += 1
    try:
        return _calculate_feature_matrix(*args, **kwargs)
    finally:
        _CFM_DEPTH -= 1


def _calculate_feature_matrix(
    features: list[FeatureBase],
    entityset: EntitySet | None = None,
    cutoff_time=None,
    instance_ids=None,
    training_window=None,
    include_cutoff_time: bool = True,
    approximate=None,
    strategy: str = "join",
    cutoff_time_in_index: bool = True,
    salt: int | None = None,
) -> DataFrame:
    """Compute the feature matrix.

    cutoff_time: None | scalar datetime/str | Spark DataFrame with
    (target-index column or 'instance_id', 'time', *pass_columns).
    approximate: optional Timedelta/str — bin cutoff times down to
    this window for AGGREGATION features (deliberate accuracy/speed
    trade, reference cfm.py:234-276): expensive aggregates are
    computed once per (instance, binned time) instead of per exact
    cutoff. Identity/transform/direct features stay exact.
    Returns a DataFrame keyed by (instance, time) + one column per
    feature, named with reference-parity feature names.

    strategy: "join" (default) | "sortmerge" | "auto". "auto" picks
    "join" for throughput — the round-5 profile (BENCH/BASELINE.md,
    stage decomposition + density sweeps at 100 and 1000
    events/entity, 4..256 cutoffs/entity) measured that the join
    path's partial-aggregate shuffle beats the kernel's full-row
    shuffle+sort at EVERY density, so there is no throughput regime
    where an auto-router should flip — but additionally runs the
    round-6 PRE-FLIGHT MEMORY ESTIMATOR at the knee the 10x stress
    probe named: the join's final (entity, cutoff) hash-agg state is
    |cutoff pairs| x feature width, and once the per-task slice of
    that state crosses the executor's execution-memory budget the
    plan spills (then OOMs). The estimator sizes the state from the
    cutoff-table row count, first RAISES the shuffle width so each
    task's slice fits (state is hash-partitioned by the group key,
    so width dilutes it), and only if the needed width is absurd
    (> FT_SPARK_AUTO_MAX_PARTS) flips to "sortmerge", whose memory
    is O(events per partition) flat arrays, independent of cutoff
    density. Decision + reason are logged and recorded in
    cfm.LAST_PREFLIGHT. Pass "sortmerge" explicitly for its other
    structural niche: explicit hot-key salting (salt=).
    """
    if strategy not in ("join", "sortmerge", "auto"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use 'join', 'sortmerge', "
            "or 'auto'")
    es = entityset or _find_es(features)
    target = features[0].entity
    for f in features:
        if f.entity != target:
            raise ValueError("all features must target the same dataframe")
    index_col = es.index(target)
    training_window = Timedelta.parse(training_window) if training_window else None

    cutoffs, pass_cols, scalar_cutoff = _build_cutoffs(
        es, target, index_col, cutoff_time
    )
    if instance_ids is not None:
        cutoffs = cutoffs.filter(F.col(index_col).isin(list(instance_ids)))
    if (pass_cols and scalar_cutoff is None
            and _is_derived_plan(cutoffs)):
        # The cutoff table feeds TWO independent plan consumers when
        # it carries pass columns: the distinct (instance, time) key
        # set driving the aggregations, and the final pass-column
        # re-attach join. Each subtree re-evaluates the user's cutoff
        # plan — a full extra scan+aggregate when cutoff_time is
        # DERIVED rather than stored (exchange reuse cannot fire:
        # column pruning gives the two subtrees different shapes). A
        # LAZY localCheckpoint materializes the (small, target-grain)
        # cutoff rows once at first use and lets every consumer read
        # the stored partitions — no extra eager job, one evaluation
        # of the arbitrary user plan (guide §2.4 "remove passes").
        # Cheap stored scans are left alone: re-scanning a parquet
        # file twice beats holding a copy in block storage.
        cutoffs = cutoffs.localCheckpoint(eager=False)

    # ---- dedupe features by name, keep order; slices pull in bases ----
    ordered, seen = [], set()
    slices = [f for f in features if isinstance(f, FeatureOutputSlice)]
    expanded = []
    for f in features:
        if isinstance(f, FeatureOutputSlice):
            expanded.append(f.base_feature)
        else:
            expanded.append(f)
    for f in expanded:
        n = f.get_name()
        if n not in seen:
            seen.add(n)
            ordered.append(f)

    # transforms stacked on aggregation/direct outputs (reference Step 4
    # transforms of agg features, deep_feature_synthesis.py:629-676)
    # compile on the MATRIX after their inputs land, not on the target
    # frame; their agg/direct inputs are hoisted as hidden internal
    # features so the normal machinery computes them.
    matrix_trans = [
        f for f in ordered
        if not isinstance(f, (AggregationFeature, DirectFeature))
        and _has_agg_or_direct_dep(f)
    ]
    mt_names = {f.get_name() for f in matrix_trans}
    hidden = []
    have = {f.get_name() for f in ordered}
    for f in matrix_trans:
        for d in _agg_direct_roots(f):
            if d.get_name() not in have:
                have.add(d.get_name())
                hidden.append(d)
    ordered_all = ordered + hidden

    internal = {f.get_name(): f"_f{i}" for i, f in enumerate(ordered_all)}
    if scalar_cutoff is not None:
        # scalar path: the target index is unique by contract — no
        # exchange needed to dedupe
        base_keys = cutoffs.select(index_col, CUTOFF_COL)
    else:
        base_keys = cutoffs.select(index_col, CUTOFF_COL).distinct()
    matrix = base_keys
    matrix_is_bare = True

    approx_td = Timedelta.parse(approximate) if approximate else None

    agg_feats = [f for f in ordered_all if isinstance(f, AggregationFeature)]
    direct_feats = [f for f in ordered_all if isinstance(f, DirectFeature)]
    other_feats = [
        f for f in ordered_all
        if not isinstance(f, (AggregationFeature, DirectFeature))
        and f.get_name() not in mt_names
    ]
    if strategy == "auto":
        strategy = _resolve_auto_strategy(
            base_keys.sparkSession, base_keys, len(agg_feats),
            count_frame=cutoffs if scalar_cutoff is None else None)
    if strategy == "join" and scalar_cutoff is None and agg_feats:
        # ONE exchange serves both the key dedup and the as-of join
        # (guide §2.4 "two operations keyed the same way share one
        # exchange"): hash-partitioning by the entity alone already
        # satisfies the distinct's (entity, cutoff) clustering AND the
        # join's entity clustering, so the explicit repartition
        # replaces the distinct's (entity, cutoff) exchange + the
        # join's entity re-exchange with a single shuffle of the
        # cutoff rows. Not done for sortmerge: its marker union
        # repartitions everything anyway, so a pre-exchange here would
        # be pure extra work.
        base_keys = cutoffs.select(index_col, CUTOFF_COL) \
            .repartition(F.col(index_col)).distinct()
        if matrix_is_bare:
            matrix = base_keys
    scalar_ctx = (scalar_cutoff, include_cutoff_time, training_window,
                  strategy)

    # ---- aggregation features, grouped per (path, window, n_obs) ----
    groups: dict = {}
    for f in agg_feats:
        path_key = tuple(
            (r.parent_name, r.parent_col, r.child_name, r.child_col)
            for r in f.relationship_path
        )
        up = f.use_previous
        win = up if (up and not up.is_observation) else None
        nobs = int(up.value) if (up and up.is_observation) else None
        groups.setdefault((path_key, win, nobs), []).append(f)

    if approx_td is not None and scalar_cutoff is None:
        step = int(round(approx_td.to_seconds()))
        binned_expr = F.timestamp_seconds(
            F.floor(F.unix_micros(F.col(CUTOFF_COL)) / F.lit(step * 1_000_000))
            * F.lit(step)
        )
        agg_keys = base_keys.select(
            index_col, binned_expr.alias(CUTOFF_COL)
        ).distinct()
    else:
        agg_keys = base_keys

    for (path_key, win, nobs), feats in groups.items():
        path = feats[0].relationship_path
        child_df, key_col, time_col, hops = _child_frame(
            es, path,
            pit=(scalar_cutoff, include_cutoff_time, training_window)
            if scalar_cutoff is not None else None,
        )
        specs = []
        # per-row cutoffs + stacked aggregation/direct inputs: the
        # stacked value VARIES PER CUTOFF, so it cannot live on
        # child_df — compute the inner matrix at propagated
        # (child_instance, cutoff) pairs and hand it to the as-of
        # join as an auxiliary frame joined AFTER the cutoff join.
        aux = None
        aux_cols: dict = {}
        if scalar_cutoff is None:
            stacked = []
            seen_stk = set()
            for f in feats:
                cands = list(f.base_features)
                if f.where is not None:
                    # where clauses over agg outputs (depth>=3
                    # conditional aggs, e.g. COUNT(orders WHERE
                    # SUM(lineitem.qty) > 5)) ride the aux matrix the
                    # same way stacked bases do
                    cands.append(f.where)
                for b in cands:
                    # hoist bare agg/direct inputs AND transforms that
                    # contain one (depth>=3: MEAN(orders.ABS(SUM(...))))
                    # — the recursive per-row sub-matrix computes
                    # transforms of agg outputs on its own matrix
                    if (b.get_name() not in seen_stk
                            and (isinstance(b, (AggregationFeature,
                                                DirectFeature))
                                 or _has_agg_or_direct_dep(b))):
                        seen_stk.add(b.get_name())
                        stacked.append(b)
            if stacked:
                child_name = feats[0].child_entity
                child_idx = es.index(child_name)
                cmap = (
                    child_df.select(F.col(child_idx).alias("__cid"),
                                    F.col(key_col).alias("__ak"))
                    .join(
                        agg_keys.select(F.col(index_col).alias("__ak"),
                                        F.col(CUTOFF_COL)),
                        on="__ak",
                    )
                    .select(F.col("__cid").alias(child_idx), CUTOFF_COL)
                    .distinct()
                )
                sub = calculate_feature_matrix(
                    stacked, es,
                    cutoff_time=cmap.select(
                        F.col(child_idx),
                        F.col(CUTOFF_COL).alias("time"),
                    ),
                    include_cutoff_time=include_cutoff_time,
                    training_window=training_window,
                    strategy=strategy,
                )
                sel = [F.col(f"`{child_idx}`").alias("__aux_k"),
                       F.col("time").alias("__aux_t")]
                for i, sf in enumerate(stacked):
                    an = f"__aux_f{i}"
                    sel.append(F.col(f"`{sf.get_name()}`").alias(an))
                    aux_cols[sf.get_name()] = an
                aux = (sub.select(*sel), child_idx)

        # materialize every NON-stacked base/where feature of the
        # group in ONE pass so shared inputs (and recursive stacked
        # sub-matrices on the scalar path) are computed once per group
        base_list: list = []
        for f in feats:
            for b in f.base_features:
                if b.get_name() not in aux_cols:
                    base_list.append(b)
            if f.where is not None and f.where.get_name() not in aux_cols:
                base_list.append(f.where)
        child_df, mat_cols = _materialize_features(
            es, feats[0].child_entity, child_df, base_list, time_col,
            scalar_ctx=scalar_ctx,
        )
        col_iter = iter(mat_cols)
        for f in feats:
            in_cols = [
                aux_cols[b.get_name()]
                if b.get_name() in aux_cols else next(col_iter)
                for b in f.base_features
            ]
            where_col = None
            if f.where is not None:
                wn = f.where.get_name()
                where_col = (aux_cols[wn] if wn in aux_cols
                             else next(col_iter))
            kinds = getattr(f.primitive, "input_kinds", ("numeric",))
            sec_time_col = _secondary_mask_col(es, f)
            if kinds == ():
                in_cols = []
            elif (f.primitive.name == "count" and f.where is None
                    and sec_time_col is None):
                # unmasked COUNT = row count; dropping the index input
                # lets Catalyst prune the column from the scan
                in_cols = []
            specs.append(
                AggSpec(internal[f.get_name()], f.primitive, in_cols,
                        where_col, sec_time_col)
            )
        # reference applies BOTH filters (ES pre-filtered by
        # training_window, then use_previous): with fixed-duration
        # windows that composes to the more restrictive of the two
        if win and training_window:
            eff_window = (
                win if win.to_seconds() <= training_window.to_seconds()
                else training_window
            )
        else:
            eff_window = win or training_window
        part = asof_aggregate(
            child_df, key_col, time_col, agg_keys, index_col, specs,
            include_cutoff_time=include_cutoff_time,
            training_window=eff_window,
            n_observations=nobs,
            strategy=strategy,
            scalar_cutoff=scalar_cutoff if strategy == "join" else None,
            salt=salt,
            aux=aux,
            hops=hops,
        )
        if approx_td is not None and scalar_cutoff is None:
            # remap approx results onto exact cutoffs via the binned key
            part = part.withColumnRenamed(CUTOFF_COL, "_ft_bin")
            matrix = matrix.withColumn("_ft_bin", binned_expr).join(
                part, on=[index_col, "_ft_bin"], how="left"
            ).drop("_ft_bin")
            matrix_is_bare = False
        elif matrix_is_bare:
            # part carries exactly the base key set — skip the join
            matrix = part
            matrix_is_bare = False
        else:
            matrix = matrix.join(part, on=[index_col, CUTOFF_COL], how="left")
        # re-fill defaults lost through the outer join
        fills = {
            s.out_name: s.primitive.default_value
            for s in specs
            if s.primitive.default_value is not None
        }
        if fills:
            matrix = matrix.fillna(fills)

    # ---- direct features ----
    # a base that is ITSELF a direct feature (multi-hop chain, e.g.
    # region.x -> nation -> customer) or contains one (transform of a
    # direct at the parent grain) routes through the dynamic recursion:
    # each hop's point-in-time mask must be applied at ITS OWN parent's
    # time index (reference _handle_time filters EVERY dataframe), and
    # the recursive matrix computes the inner hop as a top-level direct
    # with exactly that masking. Pure static bases (identities and
    # transforms of identities) keep the broadcast fast path.
    def _base_is_static(f):
        return (_is_static(f.base_feature)
                and not isinstance(f.base_feature, DirectFeature)
                and not _has_agg_or_direct_dep(f.base_feature))

    static_direct = [f for f in direct_feats if _base_is_static(f)]
    dynamic_direct = [f for f in direct_feats if not _base_is_static(f)]

    if static_direct:
        by_rel: dict = {}
        for f in static_direct:
            by_rel.setdefault(f.relationship, []).append(f)
        target_keys = _tgt(es, target).select(
            index_col, *{f.relationship.child_col for f in static_direct}
        )
        matrix = matrix.join(target_keys, on=index_col, how="left")
        for rel, feats in by_rel.items():
            # shared pruned parent frame (PIT/LTI arrive as column
            # masks, not filters — missing parents must yield defaults)
            parent_df = _cached_frame(
                (id(es), rel.parent_name, "dim"),
                lambda t=rel.parent_name: _scan_base(es, t),
            )
            pti = es.time_index(rel.parent_name)
            parent_df, cols = _materialize_features(
                es, rel.parent_name, parent_df,
                [f.base_feature for f in feats], pti,
            )
            sec_by_feat = {
                internal[f.get_name()]: _sec_governing_col(
                    es, rel.parent_name, f.base_feature
                )
                for f in feats
            }
            need_sec = sorted({c for c in sec_by_feat.values() if c})
            has_lti = (
                es.meta[rel.parent_name].last_time_index
                and LTI_COLUMN_NAME in parent_df.columns
            )
            sel = parent_df.select(
                F.col(rel.parent_col).alias(rel.child_col),
                *[
                    F.col(c).alias(internal[f.get_name()])
                    for c, f in zip(cols, feats)
                ],
                *([F.col(pti).alias("_ft_par_ti")] if pti else []),
                *([F.col(LTI_COLUMN_NAME).alias("_ft_par_lti")]
                  if has_lti else []),
                *[F.col(c).alias(f"_ft_psec_{c}") for c in need_sec],
            )
            matrix = matrix.join(F.broadcast(sel), on=rel.child_col, how="left")
            # point-in-time mask (reference _handle_time filters EVERY
            # dataframe to t <= cutoff): a parent row "from the future"
            # contributes NULL, not a value; secondary-time-index
            # columns stay NULL until their governing time has passed
            for f in feats:
                cname = internal[f.get_name()]
                cond = None
                if pti:
                    cond = _pit_mask(
                        F.col("_ft_par_ti"), F.col(CUTOFF_COL),
                        include_cutoff_time, training_window,
                        lti=F.col("_ft_par_lti") if has_lti else None,
                    )
                sec = sec_by_feat[cname]
                if sec:
                    smask = F.col(f"_ft_psec_{sec}") < F.col(CUTOFF_COL)
                    cond = smask if cond is None else (cond & smask)
                if cond is not None:
                    matrix = matrix.withColumn(
                        cname, F.when(cond, F.col(cname))
                    )
            matrix = matrix.drop(
                "_ft_par_ti", "_ft_par_lti",
                *[f"_ft_psec_{c}" for c in need_sec],
            )
        matrix = matrix.drop(
            *{f.relationship.child_col for f in static_direct}
        )

    # batched per relationship: all dynamic bases over one relationship
    # share ONE recursive parent matrix and one join-back instead of a
    # recursion + two joins per feature
    dyn_by_rel: dict = {}
    for f in dynamic_direct:
        dyn_by_rel.setdefault(f.relationship, []).append(f)
    for rel, feats in dyn_by_rel.items():
        fk_map = _tgt(es, target).select(index_col, rel.child_col)
        parent_cutoffs = (
            base_keys.join(fk_map, on=index_col, how="left")
            .select(
                F.col(rel.child_col).alias(rel.parent_col),
                F.col(CUTOFF_COL).alias("time"),
            )
            .distinct()
        )
        bases = list({f.base_feature.get_name(): f.base_feature
                      for f in feats}.values())
        pm = calculate_feature_matrix(
            bases, es, cutoff_time=parent_cutoffs,
            training_window=training_window,
            include_cutoff_time=include_cutoff_time,
            strategy=strategy,
        )
        pm = pm.select(
            F.col(rel.parent_col).alias(rel.child_col),
            F.col("time").alias(CUTOFF_COL),
            # base names can contain dots (multi-hop directs) — quote
            *[F.col(f"`{f.base_feature.get_name()}`")
              .alias(internal[f.get_name()]) for f in feats],
        )
        matrix = matrix.join(fk_map, on=index_col, how="left")
        matrix = matrix.join(pm, on=[rel.child_col, CUTOFF_COL], how="left")
        matrix = matrix.drop(rel.child_col)

    # ---- identity + transform features on the target ----
    if other_feats:
        tdf = _tgt(es, target)
        ti = es.time_index(target)
        # full-dataframe (window) transforms: compute over the whole
        # table in time order first
        tdf, tcols = _materialize_features(es, target, tdf, other_feats, ti,
                                           cutoff_frame=base_keys,
                                           index_col=index_col)
        sel = tdf.select(
            index_col,
            *( [CUTOFF_COL] if CUTOFF_COL in tdf.columns else [] ),
            *[F.col(c).alias(internal[f.get_name()])
              for c, f in zip(tcols, other_feats)],
        )
        join_keys = [index_col] + (
            [CUTOFF_COL] if CUTOFF_COL in sel.columns else []
        )
        matrix = matrix.join(sel, on=join_keys, how="left")

    # ---- transforms of aggregation/direct outputs, on the matrix ----
    if matrix_trans:
        ident_cols: set = set()
        for f in matrix_trans:
            _ident_deps(f, target, ident_cols)
        if ident_cols:
            matrix = matrix.join(
                _tgt(es, target).select(
                    index_col,
                    *[F.col(c).alias(f"_ft_mt_{c}")
                      for c in sorted(ident_cols)],
                ),
                on=index_col, how="left",
            )
        # window/groupby transforms ON the matrix (reference
        # feature_set_calculator.py:526-592): the agg inputs are
        # already per-(instance, cutoff), so an expr window transform
        # is just Window.partitionBy(groupby).orderBy(cutoff, index)
        # over the matrix — no extra pass over the fact table
        morder = [CUTOFF_COL, index_col]
        mctx = TransformContext(cutoff=F.col(CUTOFF_COL), order_cols=morder)
        done = set(internal) - mt_names
        mt_cols: dict = {}  # feature name -> materialized matrix column

        def mcomp(f) -> Column:
            n = f.get_name()
            if n in mt_cols:
                return F.col(mt_cols[n])
            if n in internal and n in done:
                return F.col(internal[n])
            if isinstance(f, IdentityFeature) and f.entity == target:
                return F.col(f"_ft_mt_{f.column}")
            if isinstance(f, TransformFeature):
                prim = f.primitive
                if getattr(prim, "strategy", "expr") == "pandas":
                    raise AssertionError(
                        f"pandas-kernel node {n!r} must be materialized "
                        "by _mt_ensure before expr compilation"
                    )
                if isinstance(f, GroupByTransformFeature):
                    local = TransformContext(
                        cutoff=mctx.cutoff, order_cols=morder,
                        partition_cols=[mcomp(f.groupby)],
                    )
                    return prim.expr(
                        [mcomp(b) for b in f.base_features], local)
                return prim.expr([mcomp(b) for b in f.base_features], mctx)
            raise ValueError(f"cannot compile {f!r} on the matrix")

        def _mt_ensure(f):
            """Materialize pandas-kernel transform nodes bottom-up so
            mcomp only ever compiles expr nodes. Reference computes
            these through the same full-frame path as any transform
            (feature_set_calculator.py:526-592); here the agg inputs
            are already per-(instance, cutoff) on the matrix, so a
            grouped kernel is applyInPandas per groupby value and a
            global kernel goes through the distributed EWM / halo /
            capped-global machinery in _apply_pandas_transform."""
            nonlocal matrix
            global _MAT_COUNTER
            n = f.get_name()
            if n in mt_cols or (n in internal and n in done):
                return
            if isinstance(f, (AggregationFeature, DirectFeature)):
                return  # hoisted as hidden features, already on matrix
            for b in f.get_dependencies():
                _mt_ensure(b)
            prim = getattr(f, "primitive", None)
            if prim is None or getattr(prim, "strategy", "expr") != "pandas":
                return
            base_cols = []
            for b in f.base_features:
                _MAT_COUNTER += 1
                bname = f"_ft_m{_MAT_COUNTER}"
                matrix = matrix.withColumn(
                    bname, mcomp(b).cast("double"))
                base_cols.append(bname)
            part_cols = []
            if isinstance(f, GroupByTransformFeature):
                _MAT_COUNTER += 1
                gname = f"_ft_m{_MAT_COUNTER}"
                matrix = matrix.withColumn(gname, mcomp(f.groupby))
                part_cols = [gname]
            out_col = internal.get(n)
            if out_col is None:
                _MAT_COUNTER += 1
                out_col = f"_ft_m{_MAT_COUNTER}"
            matrix = _apply_pandas_transform(
                matrix, prim, base_cols, out_col, morder, part_cols)
            matrix = matrix.drop(*base_cols, *part_cols)
            mt_cols[n] = out_col

        for f in matrix_trans:
            _mt_ensure(f)
            n = f.get_name()
            if n in mt_cols:
                if mt_cols[n] != internal[n]:
                    matrix = matrix.withColumn(
                        internal[n], F.col(mt_cols[n]))
            else:
                matrix = matrix.withColumn(internal[n], mcomp(f))
            done.add(n)
        matrix = matrix.drop(*[f"_ft_mt_{c}" for c in sorted(ident_cols)])

    # ---- target-grain point-in-time mask ----
    # reference _handle_time (entityset.py:1407-1457) filters the
    # TARGET frame too, and missing instances come back as a
    # generate_default_df row (feature_set_calculator.py:135-146):
    # a cutoff earlier than the row's own time index yields the
    # primitive default for aggregations and NULL for everything
    # else; secondary-time-index columns of the target are NULLed
    # while sec_time >= cutoff.
    tti = es.time_index(target)
    tgt_sec = {
        internal[f.get_name()]: _sec_governing_col(es, target, f)
        for f in ordered_all
        if not isinstance(f, AggregationFeature)
    }
    need_tsec = sorted({c for c in tgt_sec.values() if c})
    if ordered_all and (tti or need_tsec):
        tgt_has_lti = (
            es.meta[target].last_time_index
            and LTI_COLUMN_NAME in es[target].columns
        )
        tsel = _tgt(es, target).select(
            index_col,
            *([F.col(tti).alias("_ft_tgt_ti")] if tti else []),
            *([F.col(LTI_COLUMN_NAME).alias("_ft_tgt_lti")]
              if tgt_has_lti else []),
            *[F.col(c).alias(f"_ft_tsec_{c}") for c in need_tsec],
        )
        matrix = matrix.join(tsel, on=index_col, how="left")
        tcond = (
            _pit_mask(F.col("_ft_tgt_ti"), F.col(CUTOFF_COL),
                      include_cutoff_time, training_window,
                      lti=F.col("_ft_tgt_lti") if tgt_has_lti else None)
            if tti else None
        )
        for f in ordered_all:
            cname = internal[f.get_name()]
            cond = tcond
            sec = tgt_sec.get(cname)
            if sec:
                smask = F.col(f"_ft_tsec_{sec}") < F.col(CUTOFF_COL)
                cond = smask if cond is None else (cond & smask)
            if cond is None:
                continue
            dv = (
                f.primitive.default_value
                if isinstance(f, AggregationFeature) else None
            )
            col = F.when(cond, F.col(cname))
            if dv is not None:
                col = col.otherwise(F.lit(dv))
            matrix = matrix.withColumn(cname, col)
        matrix = matrix.drop(
            "_ft_tgt_ti", "_ft_tgt_lti",
            *[f"_ft_tsec_{c}" for c in need_tsec],
        )

    # ---- final projection: rename + attach pass columns ----
    out_cols = [F.col(index_col), F.col(CUTOFF_COL).alias("time")]
    if pass_cols:
        # repartition the (narrow) cutoff side by the entity key alone:
        # both join children then report HashPartitioning(entity),
        # which co-partitions a join on (entity, cutoff) with NO
        # exchange of the WIDE matrix side — the matrix leaves the
        # aggregation/kernel already entity-partitioned (guide §2.4;
        # spark.sql.requireAllClusterKeysForCoPartition=false default)
        matrix = matrix.join(
            cutoffs.select(
                index_col, CUTOFF_COL, *pass_cols
            ).repartition(F.col(index_col)),
            on=[index_col, CUTOFF_COL],
            how="left",
        )
        out_cols += [F.col(c) for c in pass_cols]
    emitted = {f.get_name() for f in features if not isinstance(f, FeatureOutputSlice)}
    for f in ordered:
        if f.get_name() in emitted:
            out_cols.append(F.col(internal[f.get_name()]).alias(f.get_name()))
    for f in slices:
        base_col = F.col(internal[f.base_feature.get_name()])
        out_cols.append(F.element_at(base_col, f.n + 1).alias(f.get_name()))
    return matrix.select(*out_cols)


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------
def _find_es(features):
    for f in features:
        es = getattr(f, "es", None)
        if es is not None:
            return es
        for d in f.get_dependencies(deep=True):
            es = getattr(d, "es", None)
            if es is not None:
                return es
    raise ValueError("no EntitySet found on features")


def _is_derived_plan(df) -> bool:
    """True when the DataFrame's analyzed plan contains non-trivial
    operators (aggregates, joins, generators, windows, set ops) —
    i.e. re-evaluating it costs real work, unlike a scan/project/
    filter over stored files. Best-effort: unknown shapes count as
    derived (materializing a small frame twice is cheaper than
    re-running an expensive plan twice)."""
    try:
        s = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True
    return any(k in s for k in (
        "Aggregate", "Join", "Generate", "Window", "Union",
        "Deduplicate", "Distinct"))


def _build_cutoffs(es, target, index_col, cutoff_time):
    """Normalize cutoff_time into a DataFrame (index_col, CUTOFF_COL,
    *pass_cols)."""
    if isinstance(cutoff_time, DataFrame):
        cols = cutoff_time.columns
        inst = index_col if index_col in cols else (
            "instance_id" if "instance_id" in cols else cols[0]
        )
        tcol = "time" if "time" in cols else cols[1]
        pass_cols = [c for c in cols if c not in (inst, tcol)]
        df = cutoff_time.select(
            F.col(inst).alias(index_col),
            F.col(tcol).cast("timestamp").alias(CUTOFF_COL),
            *pass_cols,
        )
        return df, pass_cols, None
    if cutoff_time is None:
        cutoff_time = _max_time(es)
    if isinstance(cutoff_time, str):
        cutoff_time = _dt.datetime.fromisoformat(cutoff_time)
    df = _tgt(es, target).select(
        F.col(index_col), F.lit(cutoff_time).cast("timestamp").alias(CUTOFF_COL)
    )
    return df, [], cutoff_time


def _max_time(es):
    best = None
    for name, meta in es.meta.items():
        if meta.time_index:
            m = es[name].agg(F.max(meta.time_index)).collect()[0][0]
            if m is not None and (best is None or m > best):
                best = m
    if best is None:
        raise ValueError("no time index anywhere; pass cutoff_time explicitly")
    return best


def _apply_scalar_pit(es, table, df, pit):
    """_handle_time row filter for an intermediate path table at a
    scalar cutoff (reference filters EVERY dataframe on the descent,
    feature_set_calculator trie walk)."""
    ti = es.time_index(table)
    if ti is None:
        return df
    sc, inc, tw = pit
    cut = F.lit(sc).cast("timestamp")
    lti = (
        F.col(LTI_COLUMN_NAME)
        if es.meta[table].last_time_index and LTI_COLUMN_NAME in df.columns
        else None
    )
    return df.filter(_pit_mask(F.col(ti), cut, inc, tw, lti=lti))


def _child_frame(es, path, pit=None):
    """DataFrame of the deepest child on the path with the TOP ancestor
    key attached (denormalized path keys — reference fsc.py:373-431).
    Returns (df, ancestor_key_col, time_col).

    The mapping chain only ever joins on PARENT indexes (validated
    unique by add_relationship), never on child indexes — child tables
    need no unique key for multi-hop aggregation. Intermediate
    mappings are dimension-sized; Catalyst broadcasts them when small.

    pit: optional (scalar_cutoff, include_cutoff_time, training_window)
    — intermediate tables are row-filtered to the cutoff like the
    reference's trie descent (a lineitem belonging to a post-cutoff
    order is invisible at the customer grain). With PER-ROW cutoffs
    the hop time indexes are CARRIED as `_ft_hop_ti_{i}` /
    `_ft_hop_lti_{i}` columns instead (returned as `hops`), and the
    as-of join applies the same predicate per cutoff row.

    Returns (df, ancestor_key_col, time_col, hops) where hops is a
    list of (ti_col, lti_col | None) carried column names.
    """
    child_name = path[-1].child_name
    time_col = es.time_index(child_name)
    df = _pit_child(es, child_name, time_col, pit)
    if len(path) == 1:
        return df, path[0].child_col, time_col, []
    key_col = "_ft_ancestor_key"
    # mapping: (index of the next rel's parent table) -> top ancestor
    # key (+ carried hop time columns for per-row PIT)
    mapping = None
    carried: list = []   # hop column names accumulated on `mapping`
    hops: list = []      # (ti_col, lti_col | None) pairs
    for i, (rel, nxt) in enumerate(zip(path, path[1:])):
        # the intermediate hop table, shared + PIT-filtered via the
        # scan cache (the same orders hop serves deep-path groups,
        # stacked sub-matrices, and direct parents in one call)
        if pit is not None:
            tbl = _cached_frame(
                (id(es), rel.child_name, "hop", str(pit[0]), pit[1],
                 str(pit[2])),
                lambda t=rel.child_name: _apply_scalar_pit(
                    es, t, _scan_base(es, t), pit),
            )
        else:
            tbl = _cached_frame(
                (id(es), rel.child_name, "base"),
                lambda t=rel.child_name: _scan_base(es, t),
                persistable=False,
            )
        extra_exprs, extra_names = [], []
        if pit is None:
            ti = es.time_index(rel.child_name)
            if ti is not None:
                tname = f"_ft_hop_ti_{i}"
                extra_exprs.append(F.col(ti).alias(tname))
                extra_names.append(tname)
                lname = None
                if (es.meta[rel.child_name].last_time_index
                        and LTI_COLUMN_NAME in tbl.columns):
                    lname = f"_ft_hop_lti_{i}"
                    extra_exprs.append(F.col(LTI_COLUMN_NAME).alias(lname))
                    extra_names.append(lname)
                hops.append((tname, lname))
        if mapping is None:
            mapping = tbl.select(
                F.col(nxt.parent_col).alias("_ft_link"),
                F.col(rel.child_col).alias(key_col),
                *extra_exprs,
            )
        else:
            mapping = (
                tbl.select(
                    F.col(nxt.parent_col).alias("_ft_link_new"),
                    F.col(rel.child_col).alias("_ft_link"),
                    *extra_exprs,
                )
                .join(mapping, on="_ft_link", how="left")
                .select(
                    F.col("_ft_link_new").alias("_ft_link"),
                    F.col(key_col),
                    *[F.col(c) for c in carried + extra_names],
                )
            )
        carried += extra_names
    last = path[-1]
    df = df.join(
        mapping,
        df[last.child_col] == mapping["_ft_link"],
        "left",
    ).drop("_ft_link")
    return df, key_col, time_col, hops


def _pit_mask(time_col, cutoff, include_cutoff_time, training_window,
              lti=None):
    """Column-expression form of the reference's _handle_time row filter
    (entityset.py:1407-1447): keep t <= cutoff (or <), and inside the
    training window — where a row's last_time_index falling in the
    window also keeps it (child activity makes the row 'current')."""
    pred = time_col <= cutoff if include_cutoff_time else time_col < cutoff
    if training_window is not None:
        start = training_window.subtract_from(cutoff)
        wmask = time_col > start if include_cutoff_time else time_col >= start
        if lti is not None:
            lmask = lti > start if include_cutoff_time else lti >= start
            wmask = wmask | lmask
        pred = pred & wmask
    return pred


def _sec_governing_col(es, table, feature):
    """Return the secondary-time-index column governing any identity
    column of `table` feeding `feature` (values are only valid once
    that time has passed — reference entityset.py:1450-1455)."""
    sec = es.meta[table].secondary_time_index or {}
    if not sec:
        return None
    id_cols = set()

    def walk(f):
        if isinstance(f, IdentityFeature) and f.entity == table:
            id_cols.add(f.column)
        for d in f.get_dependencies():
            walk(d)

    walk(feature)
    for tcol, cols in sec.items():
        if id_cols & set(cols):
            return tcol
    return None


def _secondary_mask_col(es, agg_feature):
    """Secondary-TI mask column for an aggregation's child inputs."""
    for b in agg_feature.base_features:
        tcol = _sec_governing_col(es, agg_feature.child_entity, b)
        if tcol:
            return tcol
    return None


def _has_agg_or_direct_dep(f) -> bool:
    for d in f.get_dependencies():
        if isinstance(d, (AggregationFeature, DirectFeature)):
            return True
        if _has_agg_or_direct_dep(d):
            return True
    return False


def _agg_direct_roots(f, acc=None) -> list:
    """Top-most AggregationFeature/DirectFeature nodes under f (the
    recursive engine computes everything below them)."""
    if acc is None:
        acc = []
    for d in f.get_dependencies():
        if isinstance(d, (AggregationFeature, DirectFeature)):
            acc.append(d)
        else:
            _agg_direct_roots(d, acc)
    return acc


def _ident_deps(f, table, acc: set):
    """Raw columns of `table` read by f outside agg/direct subtrees."""
    if isinstance(f, IdentityFeature):
        if f.entity == table:
            acc.add(f.column)
        return
    if isinstance(f, (AggregationFeature, DirectFeature)):
        return
    for d in f.get_dependencies():
        _ident_deps(d, table, acc)


def _is_static(feature) -> bool:
    """True if the feature never looks at cutoffs or child tables —
    safe to compute once per parent row and join directly."""
    if isinstance(feature, AggregationFeature):
        return False
    prim = getattr(feature, "primitive", None)
    if prim is not None and getattr(prim, "uses_calc_time", False):
        return False
    return all(_is_static(d) for d in feature.get_dependencies())


def _materialize_features(es, table, df, feats, time_col,
                          cutoff_frame=None, index_col=None,
                          scalar_ctx=None):
    """Add one column per feature to df; returns (df, colnames).

    Pure row-wise transforms compile into a single select; window
    transforms (uses_full_dataframe) compile into Window expressions
    over (partition?, time) — computed over all rows before any
    instance filtering. uses_calc_time transforms require the cutoff
    column: if a cutoff_frame is given, df is joined with it first
    (adding CUTOFF_COL and possibly duplicating rows per cutoff).

    Stacked inputs — AggregationFeature/DirectFeature nodes at this
    table's grain (depth>=2 DFS, e.g. MEAN(orders.SUM(lineitem.x)))
    — are computed by a recursive calculate_feature_matrix at the
    scalar cutoff and joined back on the table index. Per-row cutoffs
    would require propagating every ancestor cutoff down the path
    (the reference re-filters the whole ES per unique cutoff instead,
    calculate_feature_matrix.py:437-506); use approximate= binning or
    a scalar cutoff for stacked features.
    """
    needs_cutoff = any(_uses_calc_time(f) for f in feats)
    precomputed: dict = {}

    special: list = []

    def _collect_special(f):
        if isinstance(f, (AggregationFeature, DirectFeature)):
            special.append(f)
            return
        for d in f.get_dependencies():
            _collect_special(d)

    for f in feats:
        _collect_special(f)
    if special:
        sc = scalar_ctx[0] if scalar_ctx else None
        if sc is None:
            # internal invariant, not a user-reachable limit: every
            # calculate_feature_matrix call site routes agg/direct-
            # bearing features elsewhere before materializing here —
            # the group loop hoists them onto the aux matrix at
            # per-row cutoffs, the direct-feature split sends nested
            # direct/agg bases through the dynamic recursion, and
            # target-grain transforms of agg outputs compile on the
            # matrix (test_custom_and_direct.py::test_direct_chain_*)
            raise AssertionError(
                "unreachable: agg/direct-bearing feature reached "
                "_materialize_features without a scalar cutoff "
                f"context: {[f.get_name() for f in special]!r}"
            )
        _, inc, tw, strat = scalar_ctx
        uniq = list({f.get_name(): f for f in special}.values())
        sub = calculate_feature_matrix(
            uniq, es, cutoff_time=sc, include_cutoff_time=inc,
            training_window=tw, strategy=strat,
        )
        tbl_index = es.index(table)
        global _MAT_COUNTER
        sel = [F.col(f"`{tbl_index}`")]
        for f in uniq:
            _MAT_COUNTER += 1
            cn = f"_ft_m{_MAT_COUNTER}"
            # feature names contain dots, which bare F.col would parse
            # as struct traversal — quote with backticks
            sel.append(F.col(f"`{f.get_name()}`").alias(cn))
            precomputed[f.get_name()] = cn
        df = df.join(sub.select(*sel), on=tbl_index, how="left")
    if needs_cutoff:
        if cutoff_frame is None:
            raise ValueError("uses_calc_time feature outside cutoff context")
        # window transforms must be computed BEFORE the cutoff join
        # duplicates rows per cutoff (a cum_sum evaluated after would
        # be inflated by the number of cutoffs per instance) — register
        # their materialized columns so compile_feat reuses them
        # instead of recompiling the Window expression post-join
        win_feats = [f for f in feats if _uses_full_df(f)
                     and not _uses_calc_time(f)]
        if win_feats:
            df, wcols = _materialize_features(es, table, df, win_feats,
                                              time_col)
            precomputed.update(
                {f.get_name(): c for f, c in zip(win_feats, wcols)}
            )
        if CUTOFF_COL not in df.columns:
            df = df.join(cutoff_frame, on=index_col, how="inner")

    ctx = TransformContext(
        time=F.col(time_col) if time_col else None,
        cutoff=F.col(CUTOFF_COL) if CUTOFF_COL in df.columns else None,
        order_cols=[c for c in (time_col, es.index(table)) if c],
    )

    # pandas-kernel transforms (EWM family etc.) run via applyInPandas
    # over the groupby partition (or one global group — a deliberate
    # scale trade-off matching the reference's full-column semantics)
    pandas_feats = [
        f for f in feats
        if getattr(getattr(f, "primitive", None), "strategy", "") == "pandas"
    ]
    # identity-based membership: FeatureBase.__eq__ is overloaded to
    # BUILD an equality feature, so `f not in pandas_feats` would
    # misclassify every feature whenever pandas_feats is non-empty
    _pandas_ids = {id(f) for f in pandas_feats}
    expr_feats = [f for f in feats if id(f) not in _pandas_ids]

    out_cols = []
    new_cols = dict(precomputed)

    def compile_feat(f) -> Column:
        name = f.get_name()
        if name in new_cols:
            return F.col(new_cols[name])
        if isinstance(f, IdentityFeature):
            return F.col(f.column)
        if isinstance(f, GroupByTransformFeature):
            local = TransformContext(
                time=ctx.time, cutoff=ctx.cutoff, order_cols=ctx.order_cols,
                partition_cols=[f.groupby.column],
            )
            inputs = [compile_feat(b) for b in f.base_features]
            return f.primitive.expr(inputs, local)
        if isinstance(f, TransformFeature):
            inputs = [compile_feat(b) for b in f.base_features]
            return f.primitive.expr(inputs, ctx)
        raise ValueError(f"cannot materialize {f!r} on table {table}")

    results = {}
    for f in expr_feats:
        if f.get_name() in new_cols:  # precomputed pre-cutoff-join
            results[f.get_name()] = new_cols[f.get_name()]
            continue
        c = compile_feat(f)
        _MAT_COUNTER += 1
        cname = f"_ft_m{_MAT_COUNTER}"
        df = df.withColumn(cname, c)
        new_cols[f.get_name()] = cname
        results[f.get_name()] = cname

    for f in pandas_feats:
        if f.get_name() in new_cols:  # precomputed pre-cutoff-join
            results[f.get_name()] = new_cols[f.get_name()]
            continue
        base_cols = []
        for b in f.base_features:
            c = compile_feat(b)
            _MAT_COUNTER += 1
            bname = f"_ft_m{_MAT_COUNTER}"
            df = df.withColumn(bname, c.cast("double"))
            base_cols.append(bname)
        _MAT_COUNTER += 1
        cname = f"_ft_m{_MAT_COUNTER}"
        part_cols = (
            [f.groupby.column]
            if isinstance(f, GroupByTransformFeature)
            else []
        )
        df = _apply_pandas_transform(
            df, f.primitive, base_cols, cname, ctx.order_cols, part_cols
        )
        new_cols[f.get_name()] = cname
        results[f.get_name()] = cname

    return df, [results[f.get_name()] for f in feats]


def _kernel_nparts(df) -> int:
    """Shuffle width for the grouped pandas kernel, scaled with INPUT
    SIZE instead of pinned to spark.sql.shuffle.partitions (VERDICT
    r5 #3 watch item / r6 #4): the static width packs linearly more
    groups per partition as data grows — memory stays bounded (the
    group loop streams Arrow batches), but parallelism and straggler
    smoothing don't. Width = sum of the optimized plan's LEAF scan
    size estimates (no job runs) / FT_SPARK_KERNEL_PART_BYTES
    (default 64 MiB), floored at the session shuffle width — never
    fewer partitions than any other agg would get — and capped at
    FT_SPARK_KERNEL_MAX_PARTS (default 32768).

    Leaf sum, NOT the plan root's sizeInBytes: Catalyst propagates
    size estimates MULTIPLICATIVELY through joins, so the root stat
    of the CFM's multi-join plan overshoots by orders of magnitude —
    and an explicit repartition(n, cols) is a user-specified width
    that AQE does NOT coalesce back, so an overshoot here becomes
    tens of thousands of real Python-worker tasks on a toy input
    (observed: a 150-row test spun 32768 tasks). File-scan leaves
    carry actual file bytes; local relations carry actual row bytes.
    Leaves with NO statistics (LogicalRDD — any createDataFrame /
    Arrow / checkpoint boundary) report the defaultSizeInBytes
    sentinel (~Long.MaxValue); those are EXCLUDED from the sum — an
    unknown-sized input contributes the floor, never the cap. No
    real scan is an exabyte, so believable = < 2^60 bytes."""
    import os

    floor = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    # a strategy="auto" escalation raises the session width for ITS
    # join and is sticky (lazy execution); don't let that inflate the
    # pandas-kernel floor for every later job in the session — cap
    # the floor back at the pre-escalation width (ADVICE r6)
    lp = LAST_PREFLIGHT
    if (lp.get("parts_after") and lp.get("parts_before")
            and floor == lp["parts_after"]
            and lp["parts_after"] > lp["parts_before"]):
        floor = lp["parts_before"]
    target = int(os.environ.get("FT_SPARK_KERNEL_PART_BYTES",
                                str(64 << 20)))
    cap = int(os.environ.get("FT_SPARK_KERNEL_MAX_PARTS", "32768"))
    try:
        leaves = (df._jdf.queryExecution().optimizedPlan()
                  .collectLeaves())
        size = 0
        it = leaves.iterator()
        while it.hasNext():
            s = int(str(it.next().stats().sizeInBytes()))
            if s < 1 << 60:
                size += s
    except Exception:
        return floor
    return max(floor, min(-(-size // target), cap))


def _apply_pandas_transform(df, prim, in_cols, out_col, order_cols, part_cols):
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )

    if part_cols:
        # hash-partition by the groupby key and run ONE mapInPandas
        # per partition, looping groups in Python: applyInPandas pays
        # an Arrow exchange + Python invocation PER GROUP, which
        # dominates when groups are small and numerous (the common
        # per-entity shape). Memory is bounded by the shuffle
        # partition, the same contract as the sortmerge kernel.
        import pandas as _pd

        nparts = _kernel_nparts(df)
        # explicit nulls-LAST ordering to match pandas sort_values
        # (the global path's NaN/NaT placement); Spark's default is
        # nulls-first and would feed kernels a different row order
        # for groups containing null order values
        ordered = (
            df.repartition(nparts, *[F.col(c) for c in part_cols])
            .sortWithinPartitions(
                *part_cols,
                *[F.col(c).asc_nulls_last() for c in order_cols],
            )
        )

        def fngrp(batches):
            # STREAMING group loop (r5, VERDICT #4): consume Arrow
            # batches one at a time and cut at group boundaries —
            # peak memory is one batch + the currently-open GROUP,
            # not the whole shuffle partition. Rows arrive sorted by
            # (key, order), so groups are contiguous and appear in
            # key order; the last group of each batch may continue
            # into the next batch, so it is held back until a new
            # key (or end of partition) closes it. Each group slice
            # is already in kernel order — no per-group re-sort.
            buf = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if buf is not None and len(buf):
                    pdf = _pd.concat([buf, pdf], ignore_index=True)
                groups = list(
                    pdf.groupby(part_cols, sort=False, dropna=False)
                )
                for _, g in groups[:-1]:
                    yield prim.pandas(g, in_cols, out_col, order_cols)
                buf = groups[-1][1] if groups else None
            if buf is not None and len(buf):
                yield prim.pandas(buf, in_cols, out_col, order_cols)

        return ordered.mapInPandas(fngrp, schema)
    # global (no partition key) EWM primitives have a genuinely
    # distributed evaluation — a two-pass segmented prefix scan over
    # range partitions (ewm.py) — so they never hit the single-group
    # collapse below
    from featuretools_spark.ewm import ewm_global
    from featuretools_spark.primitives.transform import _EWMBase

    if isinstance(prim, _EWMBase):
        kind = {"exponential_weighted_average": "mean",
                "exponential_weighted_std": "std",
                "exponential_weighted_variance": "var"}[prim.name]
        return ewm_global(
            df, in_cols[0], out_col, order_cols, kind=kind,
            alpha=prim.alpha, com=prim.com, span=prim.span,
            halflife=prim.halflife, ignore_na=prim.ignore_na,
        )
    # bounded-window kernels (savgol, rolling_outlier_count): each row
    # reads a fixed neighbourhood, so chunk + halo-exchange instead of
    # collapsing into one pandas frame
    halo = getattr(prim, "halo", lambda: None)()
    if halo is not None:
        from featuretools_spark.chunked import bounded_window_global

        return bounded_window_global(
            df, prim, in_cols, out_col, order_cols, halo[0], halo[1]
        )
    # single global group (full-column semantics, reference parity);
    # a bare int literal in groupBy is parsed as an ordinal — use a
    # materialized constant column instead. This shape collapses the
    # table into ONE executor's pandas frame, so it is hard-capped:
    # above the threshold, partition by the entity key instead
    # (GroupByTransformFeature) — that is the scale path.
    import os

    cap = int(os.environ.get("FT_SPARK_GLOBAL_PANDAS_MAX_ROWS", 10_000_000))
    tagged = df.withColumn("__ft_g", F.lit(1))
    schema2 = T.StructType(
        tagged.schema.fields
        + [f for f in schema.fields if f.name == out_col]
    )

    def fn2(pdf):
        if len(pdf) > cap:
            raise ValueError(
                f"global pandas transform {prim.name!r} over {len(pdf)} rows "
                f"exceeds FT_SPARK_GLOBAL_PANDAS_MAX_ROWS={cap}; partition "
                f"by an entity key (GroupByTransformFeature) instead"
            )
        pdf = pdf.sort_values(order_cols, kind="stable")
        return prim.pandas(pdf, in_cols, out_col, order_cols)

    return tagged.groupBy("__ft_g").applyInPandas(fn2, schema2).drop("__ft_g")


_MAT_COUNTER = 0


def _uses_calc_time(f) -> bool:
    prim = getattr(f, "primitive", None)
    if prim is not None and getattr(prim, "uses_calc_time", False):
        return True
    return any(_uses_calc_time(d) for d in f.get_dependencies())


def _uses_full_df(f) -> bool:
    prim = getattr(f, "primitive", None)
    if prim is not None and getattr(prim, "uses_full_dataframe", False):
        return True
    return any(_uses_full_df(d) for d in f.get_dependencies())
