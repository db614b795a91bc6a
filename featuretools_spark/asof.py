"""The as-of kernel: per-(instance, cutoff) point-in-time aggregation.

This is the throughput-critical redesign of the reference's
`calculate_feature_matrix` cutoff loop (calculate_feature_matrix.py:
437-506 re-filters the whole EntitySet once per unique cutoff time —
O(#cutoffs) passes). We do ONE pass, with two physical strategies:

strategy="join" (default; pure JVM, whole-stage codegen):
    cutoffs ⋈ events on the entity key with the time predicate as a
    join condition, then ONE groupBy(instance, cutoff).agg(...) for
    every expression-strategy primitive. Catalyst/AQE pick
    broadcast-hash when the cutoff side is small and handle skew
    (spark.sql.adaptive.skewJoin). Cost model: per-entity work is
    |events(entity)| × |cutoffs(entity)| — optimal when cutoffs per
    entity are few (the common backfill shape: 1-10 label times per
    entity). Time predicates follow the reference's _handle_time
    (entityset.py:1407-1457): include_cutoff_time=True → t <= cutoff,
    window t > cutoff-w; False → t < cutoff, window t >= cutoff-w.

strategy="sortmerge" (marker-union kernel):
    union events + per-cutoff WINDOW MARKERS (one row at the cutoff
    time, one at the window start / key start), hash-repartition on
    the entity key, sortWithinPartitions(key, time, tiebreak). Because
    markers sort into the event stream, every window bound is read off
    cumulative event aggregates at the marker's sorted position. Two
    evaluators share that one exchange + sort: UNBOUNDED windows with
    no last-N clamp run as pure-JVM running window functions at the
    marker rows (r8 — no Python boundary at all; the measured dominant
    cost of the Arrow sweep was JVM→Python serialization of the whole
    stream, not compute); windowed/last-N/trend calls run the ONE
    mapInArrow numpy pass per partition (prefix sums / reduceat, zero
    per-key Python). Wins when cutoffs per entity are many (dense
    backfills). Primitives the kernel cannot vectorize (median,
    num_unique, twostage holistics), non-numeric inputs, and
    secondary-time-index masks are routed to strategy="join"
    automatically and merged back on (instance, cutoff).
    Skew note: a single entity heavier than one range partition stays
    in one partition by default. Pass salt=S for EXPLICIT hot-key
    salting (the north-rule requirement): events hash into S
    sub-streams, markers replicate to each, the kernel emits per-salt
    distributive PARTIALS, and one JVM groupBy merges — a 50%-hot
    entity runs ~2x faster salted (BENCH/BASELINE.md skew section).
    Alternatively route skewed tables to strategy="join", where AQE
    skew-join splits the hot key.

Both return one row per cutoff row, with primitive default values
filled for instances that have no qualifying events.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from featuretools_spark.primitives.base import AggContext, AggregationPrimitive
from featuretools_spark.timedelta import Timedelta

CUTOFF_COL = "_ft_cutoff"


@dataclass
class AggSpec:
    out_name: str
    primitive: AggregationPrimitive
    input_cols: list  # value column names on the child frame
    where_col: str | None = None  # boolean column on the child frame
    # secondary-time-index mask: value columns are NULL where
    # sec_time >= cutoff (reference entityset.py:1450-1455)
    sec_time_col: str | None = None


def _time_predicate(ev_time: Column, cutoff: Column, include_cutoff_time: bool,
                    training_window: Timedelta | None) -> Column:
    if include_cutoff_time:
        pred = ev_time <= cutoff
    else:
        pred = ev_time < cutoff
    if training_window is not None:
        start = training_window.subtract_from(cutoff)
        pred = pred & (ev_time > start if include_cutoff_time else ev_time >= start)
    return pred


def _wrap_where(col: Column, where: Column | None) -> Column:
    return F.when(where, col) if where is not None else col


def asof_aggregate(
    child: DataFrame,
    key_col: str,
    time_col: str | None,
    cutoffs: DataFrame,
    instance_col: str,
    specs: list[AggSpec],
    cutoff_col: str = CUTOFF_COL,
    include_cutoff_time: bool = True,
    training_window: Timedelta | None = None,
    n_observations: int | None = None,
    strategy: str = "join",
    scalar_cutoff=None,
    salt: int | None = None,
    aux=None,
    hops=None,
) -> DataFrame:
    """Compute per-(instance, cutoff) aggregations of child rows with
    t ~ cutoff semantics. Returns [instance_col, cutoff_col, *outs].

    salt (sortmerge only): EXPLICIT hot-entity salting — events hash
    into `salt` sub-streams, window markers replicate to every
    sub-stream, the kernel emits per-salt PARTIALS and one JVM
    groupBy merges them, so a single hot entity spreads across up to
    `salt` range partitions instead of straggling in one.

    `cutoffs` must be distinct on (instance_col, cutoff_col) — the
    caller (cfm) guarantees it, avoiding redundant exchanges here.
    When every cutoff is one literal timestamp, pass scalar_cutoff:
    the plan becomes filter → ONE groupBy(key) with map-side partial
    aggregation → left join onto the instance keys (the reference's
    scalar "tuple path", cfm.py:399-432) — strictly cheaper than the
    join-then-aggregate shape needed for per-row cutoffs.
    """
    if strategy == "sortmerge" and not hops:
        kern, rest = _split_kernel_specs(child, time_col, specs)
        parts = []
        if kern:
            parts.append(_asof_sortmerge(
                child, key_col, time_col, cutoffs, instance_col, kern,
                cutoff_col, include_cutoff_time, training_window,
                n_observations, salt=salt,
            ))
        if rest:
            parts.append(_asof_join(
                child, key_col, time_col, cutoffs, instance_col, rest,
                cutoff_col, include_cutoff_time, training_window,
                n_observations, aux=aux,
            ))
        out = parts[0]
        for p in parts[1:]:
            out = out.join(p, on=[instance_col, cutoff_col], how="full")
        return out
    if scalar_cutoff is not None:
        return _asof_scalar(
            child, key_col, time_col, cutoffs, instance_col, specs,
            cutoff_col, include_cutoff_time, training_window,
            n_observations, scalar_cutoff,
        )
    # hop PIT predicates (multi-hop paths at per-row cutoffs) need the
    # cutoff in the join condition — always the join strategy
    return _asof_join(
        child, key_col, time_col, cutoffs, instance_col, specs,
        cutoff_col, include_cutoff_time, training_window, n_observations,
        aux=aux, hops=hops,
    )


def _asof_scalar(child, key_col, time_col, cutoffs, instance_col, specs,
                 cutoff_col, include_cutoff_time, training_window,
                 n_observations, scalar_cutoff):
    """Scalar-cutoff fast path: filter events once, aggregate per key
    (partial agg map-side), join results onto the instance keys."""
    cut_lit = F.lit(scalar_cutoff).cast("timestamp")
    ev = child
    if time_col is not None:
        ev = ev.filter(
            _time_predicate(F.col(time_col), cut_lit, include_cutoff_time,
                            training_window)
        )
    if n_observations is not None:
        w = W.partitionBy(key_col).orderBy(F.col(time_col).desc_nulls_last())
        ev = ev.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= n_observations
        )
    expr_specs = [s for s in specs if s.primitive.strategy == "expr"]
    two_specs = [s for s in specs if s.primitive.strategy == "twostage"]
    flag_specs, counts_specs, complex_specs = [], [], []
    for s in two_specs:
        fam = s.primitive.batch_family
        masked = s.where_col or s.sec_time_col
        if fam == "counts":
            counts_specs.append(s)
        elif fam == "flag" and not (s.primitive.flag_ordered and masked):
            flag_specs.append(s)
        else:
            complex_specs.append(s)

    def scalar_mask(s):
        m = F.col(s.where_col) if s.where_col else None
        if s.sec_time_col:
            sm = F.col(s.sec_time_col) < cut_lit
            m = sm if m is None else (m & sm)
        return m

    out = cutoffs.select(instance_col, cutoff_col)
    if expr_specs or flag_specs:
        aggs = []
        if flag_specs:
            wk = W.partitionBy(key_col)
            wo = wk.orderBy(
                F.col(time_col).asc_nulls_last() if time_col
                else F.monotonically_increasing_id()
            )
            fctx = AggContext(
                time=F.col(time_col) if time_col else None, cutoff=cut_lit)
            for i, s in enumerate(flag_specs):
                v = _wrap_where(F.col(s.input_cols[0]), scalar_mask(s))
                cols, agg = s.primitive.flag_parts(
                    v, s.out_name, fctx, wk, wo, f"s{i}")
                for cname, cexpr in cols.items():
                    ev = ev.withColumn(cname, cexpr)
                aggs.append(agg.alias(s.out_name))
        for s in expr_specs:
            where = F.col(s.where_col) if s.where_col else None
            if s.sec_time_col:
                mask = F.col(s.sec_time_col) < cut_lit
                where = mask if where is None else (where & mask)
            if s.primitive.uses_time_index and not s.input_cols:
                inputs = []
                local_ctx = AggContext(
                    time=_wrap_where(F.col(time_col), where), cutoff=cut_lit
                )
            else:
                inputs = [_wrap_where(F.col(c), where) for c in s.input_cols]
                local_ctx = AggContext(
                    time=(_wrap_where(F.col(time_col), where)
                          if time_col else None),
                    cutoff=cut_lit,
                )
            aggs.append(s.primitive.expr(inputs, local_ctx).alias(s.out_name))
        agged = ev.groupBy(F.col(key_col).alias(instance_col)).agg(*aggs)
        out = out.join(agged, on=instance_col, how="left")
    if counts_specs:
        # shared ranked value-counts subplan per (input, mask) group
        groups: dict = {}
        for s in counts_specs:
            groups.setdefault(
                (s.input_cols[0], s.where_col, s.sec_time_col), []
            ).append(s)
        for gkey in sorted(groups, key=str):
            gspecs = groups[gkey]
            vals = _wrap_where(F.col(gkey[0]), scalar_mask(gspecs[0]))
            counts = (
                ev.select(F.col(key_col).alias(instance_col),
                          vals.alias("_vcv"))
                .filter(F.col("_vcv").isNotNull())
                .groupBy(instance_col, "_vcv")
                .agg(F.count(F.lit(1)).alias("_cnt"))
            )
            wrk = W.partitionBy(instance_col).orderBy(
                F.desc("_cnt"), F.asc("_vcv"))
            part = (
                counts.withColumn("_rn", F.row_number().over(wrk))
                .groupBy(instance_col)
                .agg(*[s.primitive.counts_agg("_vcv", s.out_name)
                       for s in gspecs])
            )
            out = out.join(part, on=instance_col, how="left")
    for s in complex_specs:
        sub = ev
        if s.where_col:
            sub = sub.filter(F.col(s.where_col))
        if s.sec_time_col:
            # NULL values whose governing secondary time has not passed
            sec_mask = F.col(s.sec_time_col) < cut_lit
            for c in s.input_cols:
                sub = sub.withColumn(c, F.when(sec_mask, F.col(c)))
        ctx2 = AggContext(time=F.col(time_col) if time_col else None,
                          cutoff=cut_lit)
        part = s.primitive.twostage(
            sub.withColumn("__gk", F.col(key_col)), ["__gk"],
            s.input_cols, s.out_name, ctx2,
        ).withColumnRenamed("__gk", instance_col)
        out = out.join(part, on=instance_col, how="left")
    return _fill_defaults(out, specs)


# ----------------------------------------------------------------------
# strategy 1: conditional-aggregation join (pure JVM)
# ----------------------------------------------------------------------
def _asof_join(child, key_col, time_col, cutoffs, instance_col, specs,
               cutoff_col, include_cutoff_time, training_window,
               n_observations, aux=None, hops=None):
    def evc(c):
        """Column ref: child columns live under the __ev alias; the
        auxiliary per-cutoff frame's columns are top-level."""
        return F.col(c) if c.startswith("__aux_") else F.col(f"__ev.{c}")

    ev = child.alias("__ev")
    cut = cutoffs.select(instance_col, cutoff_col).alias("__cut")
    cond = F.col(f"__ev.{key_col}") == F.col(f"__cut.{instance_col}")
    if time_col is not None:
        cond = cond & _time_predicate(
            F.col(f"__ev.{time_col}"),
            F.col(f"__cut.{cutoff_col}"),
            include_cutoff_time,
            training_window,
        )
    # intermediate hop tables are PIT-filtered like the reference's
    # trie descent: a child row whose ANCESTOR on the path postdates
    # the cutoff is invisible (its hop time columns ride on the
    # denormalized mapping); an LTI inside the training window keeps
    # the ancestor current, mirroring _handle_time's lti mask
    for ti_col, lti_col in (hops or []):
        hp = _time_predicate(
            F.col(f"__ev.{ti_col}"), F.col(f"__cut.{cutoff_col}"),
            include_cutoff_time, None,
        )
        if training_window is not None:
            start = training_window.subtract_from(F.col(f"__cut.{cutoff_col}"))
            wmask = (F.col(f"__ev.{ti_col}") > start if include_cutoff_time
                     else F.col(f"__ev.{ti_col}") >= start)
            if lti_col is not None:
                lmask = (F.col(f"__ev.{lti_col}") > start
                         if include_cutoff_time
                         else F.col(f"__ev.{lti_col}") >= start)
                wmask = wmask | lmask
            hp = hp & wmask
        cond = cond & hp

    expr_specs = [s for s in specs if s.primitive.strategy == "expr"]
    two_specs = [s for s in specs if s.primitive.strategy == "twostage"]
    # holistic batching: "flag" primitives merge into the main groupBy
    # (zero extra joins); "counts" primitives share one per-(key,value)
    # counts subplan per distinct (input, mask); the rest run per-spec
    # but off the SHARED cutoff-join frame — never k separate
    # cutoffs x events joins (one fact scan/shuffle per holistic)
    flag_specs, counts_specs, complex_specs = [], [], []
    for s in two_specs:
        fam = s.primitive.batch_family
        masked = s.where_col or s.sec_time_col
        if fam == "counts":
            counts_specs.append(s)
        elif fam == "flag" and not (s.primitive.flag_ordered and masked):
            # an ordered flag's lag/lead adjacency changes when a mask
            # removes rows, so masked ordered flags take the row-filter
            # path below
            flag_specs.append(s)
        else:
            complex_specs.append(s)

    keys = [instance_col, cutoff_col]
    out = cut.select(
        F.col(f"__cut.{instance_col}").alias(instance_col),
        F.col(f"__cut.{cutoff_col}").alias(cutoff_col),
    ) if not (expr_specs or flag_specs) else None
    # Join strategy deliberately left to the planner (guide §3.1 was
    # evaluated here in round 8): forcing a shuffled-hash build on the
    # cutoff side wins ~10% at sparse cutoff densities (4/entity) but
    # loses 3x at dense ones (64/entity: the "small" build side is
    # events x 64, measured 10.4s -> 32.5s at 20M rows), and the
    # engine cannot know the density without counting. Sort-merge
    # degrades gracefully in both regimes.
    joined = cut.join(ev, cond, "left")

    def spec_mask(s):
        m = evc(s.where_col) if s.where_col else None
        if s.sec_time_col:
            # secondary-time-index mask (reference
            # entityset.py:1450-1455): values are NULL until their
            # governing time has passed
            sm = F.col(f"__ev.{s.sec_time_col}") < F.col(f"__cut.{cutoff_col}")
            m = sm if m is None else (m & sm)
        return m

    if n_observations is not None:
        # use_previous in observations: last-n child rows per cutoff
        w = W.partitionBy(
            F.col(f"__cut.{instance_col}"), F.col(f"__cut.{cutoff_col}")
        ).orderBy(F.col(f"__ev.{time_col}").desc_nulls_last())
        joined = joined.withColumn("__rn", F.row_number().over(w)).filter(
            (F.col("__rn") <= n_observations) | F.col(f"__ev.{key_col}").isNull()
        )

    if aux is not None:
        # stacked (depth>=2) inputs at per-row cutoffs: the inner
        # matrix is keyed (child instance, cutoff) — attach it AFTER
        # the cutoff join, where both keys are in scope
        aux_df, aux_key = aux
        joined = joined.join(
            aux_df,
            (F.col(f"__ev.{aux_key}") == F.col("__aux_k"))
            & (F.col(f"__cut.{cutoff_col}") == F.col("__aux_t")),
            "left",
        )

    if expr_specs or flag_specs:
        ctx = AggContext(
            time=F.col(f"__ev.{time_col}") if time_col else None,
            cutoff=F.col(f"__cut.{cutoff_col}"),
        )
        aggs = []
        if flag_specs:
            wk = W.partitionBy(
                F.col(f"__cut.{instance_col}"), F.col(f"__cut.{cutoff_col}")
            )
            wo = wk.orderBy(
                F.col(f"__ev.{time_col}").asc_nulls_last()
                if time_col else F.monotonically_increasing_id()
            )
            # null value on the LEFT join's null-extended row (or under
            # a mask) drops out of every flag aggregate; the count
            # guard reproduces "no event rows -> NULL -> fill default"
            guard = F.count(F.col(f"__ev.{key_col}")) > 0
            for i, s in enumerate(flag_specs):
                v = _wrap_where(evc(s.input_cols[0]), spec_mask(s))
                cols, agg = s.primitive.flag_parts(
                    v, s.out_name, ctx, wk, wo, f"j{i}")
                for cname, cexpr in cols.items():
                    joined = joined.withColumn(cname, cexpr)
                aggs.append(F.when(guard, agg).alias(s.out_name))
        for s in expr_specs:
            where = evc(s.where_col) if s.where_col else None
            if s.sec_time_col:
                mask = F.col(f"__ev.{s.sec_time_col}") < F.col(
                    f"__cut.{cutoff_col}"
                )
                where = mask if where is None else (where & mask)
            if s.primitive.uses_time_index and not s.input_cols:
                inputs = []
                local_ctx = AggContext(
                    time=_wrap_where(F.col(f"__ev.{time_col}"), where),
                    cutoff=ctx.cutoff,
                )
            elif not s.input_cols:
                # pruned-input primitives (unmasked COUNT): the LEFT
                # join null-extends cutoffs with zero qualifying rows,
                # so count a mandatory EVENT-side column — F.count(
                # F.lit(1)) would count the null-extended row as 1
                inputs = [_wrap_where(F.col(f"__ev.{key_col}"), where)]
                local_ctx = ctx
            else:
                inputs = [
                    _wrap_where(evc(c), where) for c in s.input_cols
                ]
                local_ctx = ctx if not s.where_col else AggContext(
                    time=_wrap_where(F.col(f"__ev.{time_col}"), where)
                    if time_col else None,
                    cutoff=ctx.cutoff,
                )
            # empty-window guard: primitives that coalesce nulls
            # internally (percent_true's fillna(False)) would otherwise
            # count the LEFT join's null-extended row as an observation
            # — "no child rows" must yield NULL, then the default fill
            guard0 = F.count(F.col(f"__ev.{key_col}")) > 0
            aggs.append(
                F.when(guard0, s.primitive.expr(inputs, local_ctx))
                .alias(s.out_name))
        # the LEFT join preserves every cutoff row, so the groupBy
        # output IS the full key set — no join-back needed
        out = joined.groupBy(
            F.col(f"__cut.{instance_col}").alias(instance_col),
            F.col(f"__cut.{cutoff_col}").alias(cutoff_col),
        ).agg(*aggs)

    if counts_specs:
        # ONE per-(key, value) counts subplan per distinct
        # (input, where, sec-mask): mode / n_most_common / entropy /
        # n_most_common_frequency all reduce over the same ranked
        # counts frame — one event-side join and one groupBy serve
        # every counts primitive in the group
        groups: dict = {}
        for s in counts_specs:
            groups.setdefault(
                (s.input_cols[0], s.where_col, s.sec_time_col), []
            ).append(s)
        for gkey in sorted(groups, key=str):
            gspecs = groups[gkey]
            vals = _wrap_where(evc(gkey[0]), spec_mask(gspecs[0]))
            counts = (
                joined.select(
                    F.col(f"__cut.{instance_col}").alias(instance_col),
                    F.col(f"__cut.{cutoff_col}").alias(cutoff_col),
                    vals.alias("_vcv"),
                )
                .filter(F.col("_vcv").isNotNull())
                .groupBy(instance_col, cutoff_col, "_vcv")
                .agg(F.count(F.lit(1)).alias("_cnt"))
            )
            wrk = W.partitionBy(instance_col, cutoff_col).orderBy(
                F.desc("_cnt"), F.asc("_vcv"))
            part = (
                counts.withColumn("_rn", F.row_number().over(wrk))
                .groupBy(instance_col, cutoff_col)
                .agg(*[s.primitive.counts_agg("_vcv", s.out_name)
                       for s in gspecs])
            )
            out = out.join(part, on=keys, how="left")

    for s in complex_specs:
        # multi-stage holistics (consecutive runs, since-last) off the
        # SHARED joined frame — n_observations clamp inherited from it
        # (last-N per reference is applied BEFORE the where filter)
        inner = joined.filter(F.col(f"__ev.{key_col}").isNotNull())
        if s.where_col:
            inner = inner.filter(evc(s.where_col))
        sec_mask = (
            F.col(f"__ev.{s.sec_time_col}") < F.col(f"__cut.{cutoff_col}")
            if s.sec_time_col else None
        )
        inner = inner.select(
            F.col(f"__cut.{instance_col}").alias(instance_col),
            F.col(f"__cut.{cutoff_col}").alias(cutoff_col),
            *[_wrap_where(evc(c), sec_mask).alias(c)
              for c in s.input_cols],
            *( [F.col(f"__ev.{time_col}").alias(time_col)]
               if time_col and time_col not in s.input_cols else [] ),
        )
        ctx2 = AggContext(
            time=F.col(time_col) if time_col else None,
            cutoff=F.col(cutoff_col),
        )
        part = s.primitive.twostage(inner, keys, s.input_cols, s.out_name, ctx2)
        out = out.join(part, on=keys, how="left")

    return _fill_defaults(out, specs)


def _fill_defaults(out: DataFrame, specs: list[AggSpec]) -> DataFrame:
    fills = {}
    for s in specs:
        dv = s.primitive.default_value
        if dv is not None:
            fills[s.out_name] = dv
    return out.fillna(fills) if fills else out


# ----------------------------------------------------------------------
# strategy 2: sort-merge sweep in a vectorized Arrow kernel
# ----------------------------------------------------------------------
_KERNEL_PRIMS = {
    "count", "sum", "mean", "min", "max", "std", "variance",
    "first", "last", "time_since_last", "time_since_first",
    "avg_time_between", "first_last_time_delta", "trend",
    "num_true", "percent_true", "any", "all",
}
# kernel outputs are double except the boolean reducers and the
# count family (cast back to long at the merge boundary for schema
# parity with the join strategy)
_KERNEL_BOOL = {"any", "all"}
_KERNEL_INT = {"count", "num_true"}
_INTEGRAL_T = {"tinyint", "smallint", "int", "bigint"}


def _kernel_parity_type(spec, child_types: dict) -> str | None:
    """Output type the JOIN strategy would produce for this spec when
    it differs from the kernel's native double — strategy="auto" may
    route the same call to either path by data size, so the result
    schema must not depend on the router's choice. None = the kernel
    type already matches. Integer casts are lossless (counts/sums of
    integrals are exact in double far past any window size); decimal
    inputs keep the kernel's double rather than faking decimal
    precision the kernel never had."""
    p = spec.primitive.name
    if p in _KERNEL_INT:
        return "long"
    it = child_types.get(spec.input_cols[0]) if spec.input_cols else None
    if p == "sum" and it in _INTEGRAL_T:
        return "long"        # Spark widens integral sums to bigint
    if p in ("min", "max", "first", "last") and it \
            and it != "double" and not it.startswith("decimal"):
        return it            # join path preserves the input type
    return None
_NUMERIC_TYPES = (
    "byte", "short", "integer", "long", "float", "double", "decimal",
    "boolean",
)


def _split_kernel_specs(child, time_col, specs):
    """Partition specs into (kernel-vectorizable, join-routed).

    The Arrow kernel only takes primitives whose window aggregate
    reduces to prefix sums / reduceat over doubles. Everything else —
    holistic primitives (median, num_unique, mode, entropy, ...),
    non-numeric inputs, secondary-time-index masks — routes to the
    JVM join strategy and is merged back on (instance, cutoff), so
    strategy='sortmerge' never raises and never falls back to
    per-row Python.
    """
    if time_col is None:
        return [], list(specs)
    numeric_ok = {
        f.name: f.dataType.typeName() in _NUMERIC_TYPES
        for f in child.schema.fields
    }
    kern, rest = [], []
    for s in specs:
        ok = (
            s.primitive.name in _KERNEL_PRIMS
            and s.primitive.strategy == "expr"
            and s.sec_time_col is None
            # aux-resident columns (stacked inputs / agg-dep where
            # clauses at per-row cutoffs) only exist after the cutoff
            # join — the kernel reads the child frame, so route to join
            and not any(c.startswith("__aux_")
                        for c in (*s.input_cols,
                                  *( [s.where_col] if s.where_col else [] )))
            # percent_true's denominator is EVERY window row (nulls
            # count as False); under a where mask it must count only
            # mask-selected rows — join path handles that
            and not (s.primitive.name == "percent_true" and s.where_col)
            # count's value column is irrelevant to the kernel:
            # _asof_sortmerge strips it (AggSpec rebuild below) and
            # counts where-mask hits / window rows directly, so a
            # non-numeric child index on a masked COUNT is fine here
            and (s.primitive.name == "count"
                 or all(numeric_ok.get(c, False) for c in s.input_cols))
        )
        (kern if ok else rest).append(s)
    return kern, rest


# per-primitive partial columns the salted kernel emits; merged by
# _salt_merge_exprs in one JVM groupBy(instance, cutoff)
_SALT_PARTIALS = {
    "count": ["n"],
    "sum": ["n", "s"],
    "mean": ["n", "s"],
    "std": ["n", "s", "ss"],
    "variance": ["n", "s", "ss"],
    "min": ["n", "mn"],
    "max": ["n", "mx"],
    "first": ["n", "ft", "fv"],
    "last": ["n", "lt", "lv"],
    "time_since_last": ["n", "lt"],
    "time_since_first": ["n", "ft"],
    "first_last_time_delta": ["n", "ft", "lt"],
    "avg_time_between": ["n", "ft", "lt"],
    "trend": ["n", "s", "ft", "sx", "sx2", "sxy"],
    "num_true": ["n", "s"],
    "percent_true": ["n", "s", "na"],   # na = window rows incl. nulls
    "any": ["n", "mx"],
    "all": ["n", "mn"],
}


def _salt_merge_exprs(spec_rows):
    """Final-value aggregate expressions over the salted kernel's
    partial columns (grouped by instance + __t_out micros)."""
    ct_us = F.max(F.col("__t_out"))
    exprs = []
    for out_name, pname, _in, _w in spec_rows:
        def c(p, o=out_name):
            return F.col(f"{o}__{p}")

        N = F.sum(c("n"))
        if pname == "count":
            e = N
        elif pname == "sum":
            e = F.when(N > 0, F.sum(c("s")))
        elif pname == "mean":
            e = F.when(N > 0, F.sum(c("s")) / N)
        elif pname in ("std", "variance"):
            m = F.sum(c("s")) / N
            var = F.greatest(F.sum(c("ss")) / N - m * m, F.lit(0.0))
            e = F.when(N > 0, F.sqrt(var) if pname == "std" else var)
        elif pname == "min":
            e = F.min(c("mn"))
        elif pname == "max":
            e = F.max(c("mx"))
        elif pname == "num_true":
            e = F.when(N > 0, F.sum(c("s")))
        elif pname == "percent_true":
            # reference fillna(False): nulls count in the denominator
            NA = F.sum(c("na"))
            e = F.when(NA > 0, F.sum(c("s")) / NA)
        elif pname == "any":
            e = F.max(c("mx")) > 0
        elif pname == "all":
            e = F.min(c("mn")) > 0
        elif pname == "first":
            e = F.min_by(c("fv"), c("ft"))
        elif pname == "last":
            e = F.max_by(c("lv"), c("lt"))
        elif pname == "time_since_last":
            e = F.when(N > 0, (ct_us - F.max(c("lt"))) / 1e6)
        elif pname == "time_since_first":
            e = F.when(N > 0, (ct_us - F.min(c("ft"))) / 1e6)
        elif pname == "first_last_time_delta":
            e = F.when(N > 0, (F.max(c("lt")) - F.min(c("ft"))) / 1e6)
        elif pname == "avg_time_between":
            e = F.when(
                N > 1, (F.max(c("lt")) - F.min(c("ft"))) / 1e6 / (N - 1)
            )
        elif pname == "trend":
            sx, sx2 = F.sum(c("sx")), F.sum(c("sx2"))
            sy, sxy = F.sum(c("s")), F.sum(c("sxy"))
            varx = sx2 / N - (sx / N) * (sx / N)
            cov = sxy / N - (sx / N) * (sy / N)
            zero = varx <= 1e-12 * F.greatest(sx2 / N, F.lit(1e-300))
            first_i = F.floor(F.min(c("ft")) / 1e6).cast("long")
            div = (
                F.when(F.pmod(first_i, F.lit(86400)) == 0, F.lit(86400.0))
                .when(F.pmod(first_i, F.lit(3600)) == 0, F.lit(3600.0))
                .when(F.pmod(first_i, F.lit(60)) == 0, F.lit(60.0))
                .otherwise(F.lit(1.0))
            )
            e = (
                F.when(N <= 2, F.lit(None).cast("double"))
                .when(zero, F.lit(0.0))
                .otherwise(cov / varx * div)
            )
        else:  # pragma: no cover — gated by _SALT_PARTIALS lookup
            raise ValueError(pname)
        out_type = "boolean" if pname in _KERNEL_BOOL else "double"
        exprs.append(e.cast(out_type).alias(out_name))
    return exprs


# Primitives whose unbounded-window value is a RUNNING aggregate over
# the sorted (key, time, tiebreak) stream — expressible as pure-JVM
# window functions (guide §4.1: built-ins over any Python boundary).
# trend is excluded: its origin-shifted x/x²/x·y sums would need a
# different numeric sequence than the Arrow kernel's; specs containing
# it keep the Arrow path.
_RUNNING_PRIMS = _KERNEL_PRIMS - {"trend"}


def _running_window_result(unioned, spec_rows, instance_col, key_cast,
                           range_cols, salted):
    """Pure-JVM replacement for the Arrow sweep in the UNBOUNDED,
    no-n_observations case: every kernel output is a running window
    aggregate over the same one exchange + one sort the kernel already
    needs (partitionBy key[, salt], orderBy (t, tiebreak), ROWS
    UNBOUNDED PRECEDING..CURRENT ROW), read off at the marker rows.

    Rationale (guide §4.1/§4.2 measured the other way around): at 20M
    events + 12.8M markers the mapInArrow kernel's cost is NOT the
    numpy math (~0.2s/task) but the JVM→Python Arrow serialization of
    the whole 33M-row stream (~7s of an 11.7s stage — measured with a
    drain-only UDF, BENCH r8). Running JVM window aggregates keep the
    same algorithm — cumulative counts/sums at each marker position —
    without any row ever crossing the Python boundary.

    Emits the exact schema the Arrow kernel emits (unsalted: finals;
    salted: the _SALT_PARTIALS columns), so every downstream step
    (salt merge, casts, defaults) is shared.
    """
    is_ev = F.col("__tag") == F.lit(0)
    w = (
        W.partitionBy(*range_cols)
        .orderBy("__t", "__srt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    def over(e):
        return e.over(w)

    ct = F.col("__t")
    out_exprs = []
    for out_name, pname, in_cols, wcol in spec_rows:
        col = in_cols[0] if in_cols else None
        cond = is_ev
        if wcol is not None:
            cond = cond & F.coalesce(F.col(f"__w_{wcol}"), F.lit(False))
        if col is not None:
            v = F.when(cond, F.col(f"__v_{col}"))      # null unless valid
            vt = F.when(cond & F.col(f"__v_{col}").isNotNull(),
                        F.col("__t"))
            n = over(F.count(v))
        else:
            v = None
            vt = F.when(cond, F.col("__t"))
            n = over(F.count(F.when(cond, F.lit(1))))

        def need(p):
            if p == "n":
                return n.cast("double")
            if p == "s":
                return over(F.sum(v))
            if p == "ss":
                return over(F.sum(v * v))
            if p == "mn":
                return over(F.min(v))
            if p == "mx":
                return over(F.max(v))
            if p == "ft":
                return over(F.min(vt)).cast("double")
            if p == "lt":
                return over(F.max(vt)).cast("double")
            if p == "fv":
                return over(F.first(v, ignorenulls=True))
            if p == "lv":
                return over(F.last(v, ignorenulls=True))
            if p == "na":
                return over(F.count(F.when(is_ev, F.lit(1)))).cast("double")
            raise ValueError(p)  # pragma: no cover

        if salted:
            for p in _SALT_PARTIALS[pname]:
                out_exprs.append(need(p).alias(f"{out_name}__{p}"))
            continue

        # unsalted finals — mirror the Arrow kernel's formulas (and
        # NaN-means-null conventions) op for op
        if pname == "count":
            e = n.cast("double")
        elif pname in ("sum", "num_true"):
            e = over(F.sum(v))
        elif pname == "mean":
            e = over(F.sum(v)) / n
        elif pname in ("std", "variance"):
            s_, ss_ = over(F.sum(v)), over(F.sum(v * v))
            m = s_ / n
            var = F.greatest(ss_ / n - m * m, F.lit(0.0))
            e = F.when(n > 0, F.sqrt(var) if pname == "std" else var)
        elif pname == "min":
            e = over(F.min(v))
        elif pname == "max":
            e = over(F.max(v))
        elif pname in ("first", "last"):
            e = (over(F.first(v, ignorenulls=True)) if pname == "first"
                 else over(F.last(v, ignorenulls=True)))
        elif pname == "percent_true":
            na = over(F.count(F.when(is_ev, F.lit(1))))
            e = F.when(na > 0, F.coalesce(over(F.sum(v)), F.lit(0.0)) / na)
        elif pname == "any":
            e = over(F.max(v)) > 0
        elif pname == "all":
            e = over(F.min(v)) > 0
        elif pname == "time_since_last":
            e = F.when(n > 0, (ct - over(F.max(vt))) / F.lit(1e6))
        elif pname == "time_since_first":
            e = F.when(n > 0, (ct - over(F.min(vt))) / F.lit(1e6))
        elif pname == "first_last_time_delta":
            e = F.when(
                n > 0, (over(F.max(vt)) - over(F.min(vt))) / F.lit(1e6))
        elif pname == "avg_time_between":
            e = F.when(
                n > 1,
                (over(F.max(vt)) - over(F.min(vt))) / F.lit(1e6) / (n - 1),
            )
        else:  # pragma: no cover — gated by _RUNNING_PRIMS
            raise ValueError(pname)
        typ = "boolean" if pname in _KERNEL_BOOL else "double"
        out_exprs.append(e.cast(typ).alias(out_name))

    out_names = (
        [f"{o}__{p}" for o, pname, _i, _w in spec_rows
         for p in _SALT_PARTIALS[pname]]
        if salted else [o for o, _p, _i, _w in spec_rows]
    )
    return (
        unioned
        .select(F.col("__k"), F.col("__t"), F.col("__tag"), *out_exprs)
        .filter(F.col("__tag") == F.lit(1))
        .select(
            F.col("__k").cast(key_cast).alias(instance_col),
            F.col("__t").alias("__t_out"),
            *[F.col(f"`{c}`") for c in out_names],
        )
    )


# When set to a dict (tools/profile_sortmerge.py), _asof_sortmerge
# records its staged DataFrames so the profiler can time the
# shuffle+sort input and the kernel output independently of the
# merge-back. Never set in production paths.
_DEBUG_CAPTURE = None


def _asof_sortmerge(child, key_col, time_col, cutoffs, instance_col, specs,
                    cutoff_col, include_cutoff_time, training_window,
                    n_observations=None, salt=None):
    """Range-partition + secondary-sort + one vectorized Arrow sweep.

    Physical shape (the north-rule kernel): the cutoff table is turned
    into WINDOW MARKERS — a hi-marker at the cutoff time and a
    lo-marker at (cutoff - training_window), or at -inf when the
    window is unbounded — and unioned into the event stream. One
    repartitionByRange on the entity key co-locates each entity while
    keeping ranges balanced, sortWithinPartitions(key, time, tiebreak)
    interleaves markers with events at exactly the window-boundary
    position (the tiebreak column encodes include_cutoff_time), then
    ONE mapInPandas pass per partition reads every window bound off a
    cumulative event count at the marker's position:

        hi[i] = (# events sorted before cutoff-marker i)
        lo[i] = (# events sorted before lo-marker i)

    No per-key loop, no searchsorted — the kernel is O(partition)
    numpy end-to-end; aggregates evaluate via global prefix arrays /
    reduceat over [lo, hi) index pairs. use_previous in observations
    is the clamp lo = max(lo, hi - n_obs). Memory is bounded by the
    range partition size (tune spark.sql.shuffle.partitions), not by
    the biggest entity alone.
    """
    if time_col is None:
        raise ValueError("sortmerge strategy requires a time index")
    salted = salt is not None and salt > 1
    if salted and n_observations is not None:
        raise ValueError(
            "salt is incompatible with use_previous in observations "
            "(last-N is a global per-entity order, not per-salt); "
            "use salt=None or strategy='join'"
        )

    specs = [
        AggSpec(s.out_name, s.primitive,
                [] if s.primitive.name == "count" else s.input_cols,
                s.where_col)
        for s in specs
    ]
    value_cols = sorted({c for s in specs for c in s.input_cols})
    where_cols = sorted({s.where_col for s in specs if s.where_col})

    # tiebreak: events sort at 0. include_cutoff_time=True wants events
    # at t == cutoff INSIDE the window -> markers sort after ties (+1);
    # False wants them outside -> markers sort before ties (-1). The
    # same sign is correct for lo-markers (window is t > cutoff-w when
    # inclusive, t >= cutoff-w when exclusive: _time_predicate above).
    srt = 1 if include_cutoff_time else -1
    window_us = (
        int(round(training_window.to_seconds() * 1_000_000))
        if training_window
        else None
    )
    NEG_INF = -(1 << 62)

    nulls = [
        *[F.lit(None).cast("double").alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast("boolean").alias(f"__w_{c}") for c in where_cols],
    ]
    # salting: events hash into `salt` sub-streams; every marker
    # replicates to every sub-stream, so each (key, salt) block is a
    # self-contained mini as-of problem whose bounds the kernel reads
    # the same way — it just emits partials instead of finals.
    ev_salt = (
        [F.pmod(
            F.xxhash64(F.col(key_col),
                       F.col(time_col).cast("timestamp")),
            F.lit(salt),
        ).cast("int").alias("__salt")]
        if salted else []
    )
    marker_salt = (
        [F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")]
        if salted else []
    )
    ev = child.filter(F.col(time_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(time_col).cast("timestamp")).alias("__t"),
        F.lit(0).cast("byte").alias("__srt"),
        F.lit(0).cast("byte").alias("__tag"),
        *ev_salt,
        *[F.col(c).cast("double").alias(f"__v_{c}") for c in value_cols],
        *[F.col(c).cast("boolean").alias(f"__w_{c}") for c in where_cols],
    )
    cut_t = F.unix_micros(F.col(cutoff_col).cast("timestamp"))
    hi_rows = cutoffs.select(
        F.col(instance_col).alias("__k"),
        cut_t.alias("__t"),
        F.lit(srt).cast("byte").alias("__srt"),
        F.lit(1).cast("byte").alias("__tag"),
        *marker_salt,
        *nulls,
    )
    # Unbounded window (no training_window): every lo-marker would sit
    # at -inf, i.e. at its (key[, salt]) block start — a position the
    # kernel can read off the sorted stream directly (running max of
    # events-before-block at key-change boundaries). Skipping the
    # lo-marker frame halves the marker rows AND removes one full
    # evaluation of the cutoff-table plan from the union (guide §2.4 /
    # §1.2 "don't compute things you throw away"); when the cutoff
    # table is itself a derived plan (not a stored scan), that is an
    # entire extra scan+aggregate of the child table.
    if window_us is not None:
        lo_t = cut_t - F.lit(window_us)
        lo_rows = cutoffs.select(
            F.col(instance_col).alias("__k"),
            lo_t.cast("long").alias("__t"),
            F.lit(srt).cast("byte").alias("__srt"),
            F.lit(2).cast("byte").alias("__tag"),
            *marker_salt,
            *nulls,
        )
    else:
        lo_rows = None
    range_cols = ["__k", "__salt"] if salted else ["__k"]
    sort_cols = (["__k", "__salt", "__t", "__srt"] if salted
                 else ["__k", "__t", "__srt"])
    # hash-partition on the entity key (and salt). The kernel only
    # needs (a) all rows of a key in ONE partition and (b) the
    # within-partition sort — it never reads cross-partition order —
    # so hash partitioning is equivalent to the previous
    # repartitionByRange, minus the range partitioner's SAMPLING JOB,
    # which evaluated the whole union (scan + markers) once extra
    # before the real exchange (guide §2.4: remove shuffles/passes
    # outright). Balance is the same: hashes spread keys uniformly,
    # and neither partitioner can split a single hot key (salting is
    # the tool for that, unchanged).
    unioned = ev.unionByName(hi_rows)
    if lo_rows is not None:
        unioned = unioned.unionByName(lo_rows)
    unioned = (
        unioned
        .repartition(*[F.col(c) for c in range_cols])
        .sortWithinPartitions(*sort_cols)
    )

    spec_rows = [
        (s.out_name, s.primitive.name, s.input_cols, s.where_col) for s in specs
    ]
    key_type = dict(zip(cutoffs.schema.names, cutoffs.schema))[instance_col]
    out_fields = f"`{instance_col}` {key_type.dataType.simpleString()}, __t_out long"
    if salted:
        for s in specs:
            for p in _SALT_PARTIALS[s.primitive.name]:
                out_fields += f", `{s.out_name}__{p}` double"
    else:
        for s in specs:
            t = "boolean" if s.primitive.name in _KERNEL_BOOL else "double"
            out_fields += f", `{s.out_name}` {t}"
    nobs = n_observations

    def merge_partition(batches):
        # Arrow-native ingest (guide §4.2): concatenate the record
        # batches into one table (one memcpy per column) and read
        # numeric columns as numpy views — no pandas DataFrame, no
        # per-row string boxing for the key column (the old pd.concat
        # + column conversions dominated the Python-side cost).
        import pyarrow as pa
        import pyarrow.compute as pc

        blist = list(batches)
        if not blist:
            return
        tbl = pa.Table.from_batches(blist).combine_chunks()
        n_rows = tbl.num_rows
        if n_rows == 0:
            return

        def col_np(name, fill_false=False):
            c = tbl.column(name).chunk(0)
            if fill_false:
                c = pc.fill_null(c, False)
            return c.to_numpy(zero_copy_only=False)

        tag = col_np("__tag")
        is_ev = tag == 0
        pos_cut = np.flatnonzero(tag == 1)
        nC = len(pos_cut)
        if nC == 0:
            return
        # every window bound is a cumulative event count at a marker's
        # sorted position: cum_ev[j] = # event rows at positions <= j,
        # and a marker at j is not an event, so cum_ev[j] = # events
        # sorted strictly before it = its bound in event-index space.
        cum_ev = np.cumsum(is_ev, dtype=np.int64)
        hi = cum_ev[pos_cut]
        if window_us is not None:
            # the i-th lo-marker corresponds to the i-th cutoff: both
            # sequences sort by (key, time + const) so their global
            # order is identical per key and across keys.
            lo = cum_ev[np.flatnonzero(tag == 2)]
        else:
            # unbounded window: no lo-markers were shipped; the lower
            # bound of every window is its (key[, salt]) block start =
            # events strictly before the block's first row. Block-start
            # values are nondecreasing with position, so a running max
            # over (cum_ev - is_ev) at block boundaries propagates the
            # right value to every marker position. Boundary flags come
            # from vectorized Arrow comparisons of the column against
            # itself shifted by one (null-vs-null counts as a boundary,
            # matching the previous pandas .ne(shift) semantics).
            def bounds(name):
                c = tbl.column(name).chunk(0)
                flags = np.ones(n_rows, dtype=bool)
                if n_rows > 1:
                    ne = pc.fill_null(pc.not_equal(
                        c.slice(1), c.slice(0, n_rows - 1)), True)
                    flags[1:] = ne.to_numpy(zero_copy_only=False)
                return flags
            kb = bounds("__k")
            if "__salt" in tbl.column_names:
                kb = kb | bounds("__salt")
            lo = np.maximum.accumulate(
                np.where(kb, cum_ev - is_ev, 0))[pos_cut]
        if nobs is not None:
            lo = np.maximum(lo, hi - nobs)

        t_all = col_np("__t")
        et = t_all[is_ev]
        ck = tbl.column("__k").chunk(0).take(pa.array(pos_cut))
        ct = t_all[pos_cut]
        # time origin for trend's x prefix sums (precision; see prefixes)
        o_us = int(et[0]) if len(et) else 0

        out = {instance_col: ck, "__t_out": ct}
        val_cache = {}
        pfx_cache = {}

        def vals(col, wcol):
            k = (col, wcol)
            if k not in val_cache:
                # nullable double -> float64 with NaN at nulls
                v = col_np(f"__v_{col}")[is_ev] if col else None
                if wcol is not None:
                    m = col_np(f"__w_{wcol}", fill_false=True)[is_ev]
                    if v is not None:
                        v = np.where(m, v, np.nan)
                    val_cache[k] = (v, m)
                else:
                    val_cache[k] = (v, None)
            return val_cache[k]

        def prefixes(col, wcol):
            k = (col, wcol)
            if k in pfx_cache:
                return pfx_cache[k]
            v, wmask = vals(col, wcol)
            if col is not None:
                valid = ~np.isnan(v)
            elif wmask is not None:
                valid = wmask
            else:
                valid = np.ones(len(et), dtype=bool)
            vz = np.where(valid, np.nan_to_num(v) if col is not None else 0.0,
                          0.0)
            p = {
                "valid": valid,
                "vidx": np.flatnonzero(valid),
                "cnt": np.concatenate(([0], np.cumsum(valid))),
                "sum": np.concatenate(([0.0], np.cumsum(vz))),
                "sumsq": np.concatenate(([0.0], np.cumsum(vz * vz))),
            }
            # seconds relative to the partition's first event: raw
            # epoch seconds (~1.7e9) make t2sum cumulate to ~3e18 and
            # the segment-difference varx loses day-scale precision —
            # the slope is shift-invariant, so build prefix sums on
            # shifted x and re-center each window at its cutoff below
            tx = np.where(valid, (et - o_us) / 1e6, 0.0)
            p["tsum"] = np.concatenate(([0.0], np.cumsum(tx)))
            p["t2sum"] = np.concatenate(([0.0], np.cumsum(tx * tx)))
            if col is not None:
                p["tysum"] = np.concatenate(([0.0], np.cumsum(tx * vz)))
            pfx_cache[k] = (p, v, wmask)
            return pfx_cache[k]

        def pair_reduce(ufunc, arr, lo_, hi_, fill=np.nan):
            """ufunc.reduceat over arbitrary [lo, hi) pairs. reduceat
            rejects index == len(arr), so hi==len pairs are clamped to
            len-1 and the dropped last element is folded back in."""
            res = np.full(len(lo_), fill)
            ok = hi_ > lo_
            if not ok.any() or len(arr) == 0:
                return res
            l2, h2 = lo_[ok], hi_[ok]
            at_end = h2 == len(arr)
            h_clamped = np.where(at_end, len(arr) - 1, h2)
            # where clamping collapses the segment (lo == len-1), the
            # reduceat result is arr[lo] which the fold-in overwrites
            idx = np.empty(len(l2) * 2, dtype=np.int64)
            idx[0::2] = l2
            idx[1::2] = np.maximum(h_clamped, l2)
            red = ufunc.reduceat(arr, idx)[0::2]
            collapsed = at_end & (l2 == len(arr) - 1)
            red = np.where(
                at_end, np.where(collapsed, arr[-1], ufunc(red, arr[-1])), red
            )
            res[ok] = red
            return res

        for out_name, pname, in_cols, wcol in spec_rows:
            col = in_cols[0] if in_cols else None
            if salted:
                p, v, wmask = prefixes(col, wcol)
                n = (p["cnt"][hi] - p["cnt"][lo]).astype(np.float64)
                cand = {"n": n}
                want = _SALT_PARTIALS[pname]
                if "s" in want:
                    cand["s"] = p["sum"][hi] - p["sum"][lo]
                if "ss" in want:
                    cand["ss"] = p["sumsq"][hi] - p["sumsq"][lo]
                if "na" in want:   # percent_true: window rows incl. nulls
                    cand["na"] = (hi - lo).astype(np.float64)
                if "mn" in want or "mx" in want:
                    vv = np.where(p["valid"], v, np.nan)
                    red = pair_reduce(
                        np.fmin if "mn" in want else np.fmax, vv, lo, hi
                    )
                    cand["mn" if "mn" in want else "mx"] = red
                if {"ft", "lt", "fv", "lv"} & set(want):
                    vidx = p["vidx"]
                    pos_f = np.searchsorted(vidx, lo, side="left")
                    pos_l = np.searchsorted(vidx, hi, side="left") - 1
                    okf = (pos_f < len(vidx)) & (n > 0)
                    okl = (pos_l >= 0) & (n > 0)
                    saf = np.minimum(pos_f, max(len(vidx) - 1, 0))
                    sal = np.maximum(pos_l, 0)
                    ft = np.full(nC, np.nan)
                    lt = np.full(nC, np.nan)
                    fv = np.full(nC, np.nan)
                    lv = np.full(nC, np.nan)
                    if len(vidx):
                        ft[okf] = et[vidx[saf]][okf].astype(np.float64)
                        lt[okl] = et[vidx[sal]][okl].astype(np.float64)
                        if "fv" in want:
                            fv[okf] = v[vidx[saf]][okf]
                        if "lv" in want:
                            lv[okl] = v[vidx[sal]][okl]
                    for nm, arr in (("ft", ft), ("lt", lt),
                                    ("fv", fv), ("lv", lv)):
                        if nm in want:
                            cand[nm] = arr
                if "sx" in want:
                    # prefix sums use the partition origin; partials
                    # from different salt sub-streams (different
                    # partitions, different origins) must agree on ONE
                    # x-origin before the JVM merge sums them — the
                    # cutoff time is constant per (key, __t_out) group,
                    # so re-center each window there (exact shifts:
                    # sx'=sx-n*d, sx2'=sx2-2d*sx+n*d^2, sxy'=sxy-d*sy)
                    d = (ct - o_us) / 1e6
                    sxs = p["tsum"][hi] - p["tsum"][lo]
                    sys_ = p["sum"][hi] - p["sum"][lo]
                    cand["sx2"] = (
                        (p["t2sum"][hi] - p["t2sum"][lo])
                        - 2.0 * d * sxs + n * d * d
                    )
                    cand["sxy"] = (p["tysum"][hi] - p["tysum"][lo]) - d * sys_
                    cand["sx"] = sxs - n * d
                for pn in want:
                    out[f"{out_name}__{pn}"] = cand[pn]
                continue
            p, v, wmask = prefixes(col, wcol)
            n = p["cnt"][hi] - p["cnt"][lo]
            has = n > 0
            res = np.full(nC, np.nan)
            if pname == "count":
                res = n.astype(np.float64)
            elif pname in ("sum", "num_true"):
                res[has] = (p["sum"][hi] - p["sum"][lo])[has]
            elif pname == "percent_true":
                # reference fillna(False): nulls count in the
                # denominator (every window row), numerator = valid 1s
                n_all = (hi - lo).astype(np.float64)
                ok_pt = n_all > 0
                with np.errstate(invalid="ignore"):
                    res[ok_pt] = ((p["sum"][hi] - p["sum"][lo]) / n_all)[ok_pt]
            elif pname in ("any", "all"):
                vv = np.where(p["valid"], v, np.nan)
                red = pair_reduce(np.fmax if pname == "any" else np.fmin,
                                  vv, lo, hi)
                res_b = np.empty(nC, dtype=object)
                res_b[:] = None
                okb = has & ~np.isnan(red)
                res_b[okb] = (red[okb] > 0)
                out[out_name] = res_b
                continue
            elif pname == "mean":
                with np.errstate(invalid="ignore"):
                    res[has] = ((p["sum"][hi] - p["sum"][lo]) / n)[has]
            elif pname in ("std", "variance"):
                with np.errstate(invalid="ignore"):
                    m = ((p["sum"][hi] - p["sum"][lo]) / n)
                    msq = ((p["sumsq"][hi] - p["sumsq"][lo]) / n)
                    var = np.maximum(msq - m * m, 0.0)
                    tmp = np.sqrt(var) if pname == "std" else var
                res[has] = tmp[has]
            elif pname in ("min", "max"):
                vv = np.where(p["valid"], v, np.nan)
                red = pair_reduce(np.fmin if pname == "min" else np.fmax,
                                  vv, lo, hi)
                res[has] = red[has]
            elif pname in ("first", "last"):
                vidx = p["vidx"]
                if pname == "first":
                    pos = np.searchsorted(vidx, lo, side="left")
                    ok = (pos < len(vidx)) & has
                    res[ok] = v[vidx[np.minimum(pos, max(len(vidx) - 1, 0))]][ok]
                else:
                    pos = np.searchsorted(vidx, hi, side="left") - 1
                    ok = (pos >= 0) & has
                    res[ok] = v[vidx[np.maximum(pos, 0)]][ok]
            elif pname in ("time_since_last", "time_since_first",
                           "avg_time_between", "first_last_time_delta"):
                vidx = p["vidx"]
                pos_last = np.searchsorted(vidx, hi, side="left") - 1
                pos_first = np.searchsorted(vidx, lo, side="left")
                ok = has & (pos_last >= 0) & (pos_first < len(vidx))
                t_last = et[vidx[np.maximum(pos_last, 0)]] if len(vidx) else ct
                t_first = (et[vidx[np.minimum(pos_first, max(len(vidx) - 1, 0))]]
                           if len(vidx) else ct)
                if pname == "time_since_last":
                    res[ok] = ((ct - t_last) / 1e6)[ok]
                elif pname == "time_since_first":
                    res[ok] = ((ct - t_first) / 1e6)[ok]
                elif pname == "first_last_time_delta":
                    res[ok] = ((t_last - t_first) / 1e6)[ok]
                else:
                    ok2 = ok & (n > 1)
                    res[ok2] = ((t_last - t_first) / 1e6)[ok2] / (n[ok2] - 1)
            elif pname == "trend":
                # reference calculate_trend parity: n<=2 -> NaN,
                # all-equal x -> 0, slope scaled by the unit dividend
                # of the first valid timestamp (whole days/hours/min)
                # segment sums are relative to the partition origin;
                # re-center each window at its cutoff (shift-invariant
                # slope, keeps varx at window-span scale so the
                # cancellation guard below is meaningful)
                d = (ct - o_us) / 1e6
                sx = p["tsum"][hi] - p["tsum"][lo]
                sy = p["sum"][hi] - p["sum"][lo]
                sx2 = (p["t2sum"][hi] - p["t2sum"][lo]
                       - 2.0 * d * sx + n * d * d)
                sxy = (p["tysum"][hi] - p["tysum"][lo]) - d * sy
                sx = sx - n * d
                vidx = p["vidx"]
                pos_first = np.searchsorted(vidx, lo, side="left")
                safe = np.minimum(pos_first, max(len(vidx) - 1, 0))
                t_first = (et[vidx[safe]] if len(vidx)
                           else np.zeros(nC, dtype=np.int64))
                fsec = np.floor(t_first / 1e6)
                div = np.where(
                    fsec % 86400 == 0, 86400.0,
                    np.where(fsec % 3600 == 0, 3600.0,
                             np.where(fsec % 60 == 0, 60.0, 1.0)),
                )
                with np.errstate(invalid="ignore", divide="ignore"):
                    varx = sx2 / n - (sx / n) ** 2
                    cov = sxy / n - (sx / n) * (sy / n)
                    # prefix-sum cancellation guard: relative epsilon
                    zero_var = varx <= 1e-12 * np.maximum(sx2 / n, 1e-300)
                    ok3 = n >= 3
                    res[ok3 & zero_var] = 0.0
                    ok = ok3 & ~zero_var
                    res[ok] = (cov / varx * div)[ok]
            out[out_name] = res
        # Arrow-native egress: numpy -> Arrow directly against the
        # declared schema (from_pandas=True keeps the mapInPandas
        # convention that NaN means null)
        arrs = []
        for i, (_nm, a) in enumerate(out.items()):
            ftype = arrow_out_schema.field(i).type
            if isinstance(a, (pa.Array, pa.ChunkedArray)):
                arrs.append(a.cast(ftype) if a.type != ftype else a)
            else:
                arrs.append(pa.array(a, type=ftype, from_pandas=True))
        yield pa.RecordBatch.from_arrays(arrs, schema=arrow_out_schema)

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    arrow_out_schema = to_arrow_schema(StructType.fromDDL(out_fields))
    if _DEBUG_CAPTURE is not None:
        _DEBUG_CAPTURE["unioned"] = unioned
    # Unbounded windows with no last-N clamp: every kernel output is a
    # running aggregate at the marker's sorted position — evaluate it
    # as pure-JVM window functions over the exchange+sort the kernel
    # already pays, instead of shipping the whole stream through the
    # Python boundary (the measured dominant cost; see
    # _running_window_result). FT_SPARK_SM_JVM=0 forces the Arrow
    # kernel (A/B and parity tests).
    import os as _os
    use_jvm = (
        window_us is None
        and nobs is None
        and all(r[1] in _RUNNING_PRIMS for r in spec_rows)
        and _os.environ.get("FT_SPARK_SM_JVM", "1") != "0"
    )
    if use_jvm:
        result = _running_window_result(
            unioned, spec_rows, instance_col,
            key_type.dataType.simpleString(), range_cols, salted,
        )
    else:
        result = unioned.mapInArrow(merge_partition, schema=out_fields)
    if _DEBUG_CAPTURE is not None:
        _DEBUG_CAPTURE["kernel_out"] = result
    if salted:
        # ONE JVM merge of the per-salt partials (map-side combinable)
        result = result.groupBy(instance_col, "__t_out").agg(
            *_salt_merge_exprs(spec_rows)
        )
    result = result.withColumn(
        cutoff_col, F.timestamp_micros(F.col("__t_out"))
    ).drop("__t_out")
    # schema parity with the join strategy: the kernel computes every
    # numeric reducer in doubles (flat arrays); cast each output back
    # to the type the join path would produce (_kernel_parity_type) —
    # strategy="auto" may pick either path by data size, so the dtype
    # must not depend on the router's choice
    child_t = dict(child.dtypes)
    casts = {s.out_name: _kernel_parity_type(s, child_t) for s in specs}
    result = result.select(*[
        F.col(f"`{c}`").cast(casts[c]).alias(c)
        if casts.get(c) else F.col(f"`{c}`")
        for c in result.columns
    ])
    return _fill_defaults(result, specs)
