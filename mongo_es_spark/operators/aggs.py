"""Recursive bucket→agg composition over the search store — the ES
aggregation model where ANY bucket aggregation nests any other bucket
or metric aggregation (terms → date_histogram → stats …), replacing
the per-shape helpers' duplicated matched-set → group → agg scaffolding
with one planner over the same primitives.

Execution shape: the ENTIRE tree compiles into ONE pass — the
token-pruned match (``PushedFilters: In(token, …)``) semi-joins
docstats once, every bucket level becomes a key expression, the leaf
metrics become aggregate expressions, and the whole thing is a single
``groupBy(all level keys)``.  Per-level ``terms`` ``size`` truncation
(ES keeps the top-N buckets per parent by doc count) applies AFTER
the aggregate as window ranks over the bucket-cardinality-sized frame
— corpus-side work never exceeds the one matched scan regardless of
nesting depth, which is what makes arbitrary client-composed
aggregation trees safe at 100 TB.

Spec is ES-shaped::

    {"langs": {"terms": {"field": "lang", "size": 3},
       "aggs": {"months": {"date_histogram": {"field": "day",
                                              "interval": "month"},
         "aggs": {"sum_chars": {"sum": {"field": "n_chars"}},
                  "avg_chars": {"avg": {"field": "n_chars"}}}}}}}

One bucket node per level inside a tree; metric leaves may have any
number of siblings.  SIBLING BUCKET FORESTS (multiple root bucket
subtrees, the Kibana-dashboard request shape) go through
:func:`agg_forest_frame` / :func:`agg_forest_over_store`: each
subtree compiles as its own pass over the SAME materialized matched
frame (one corpus scan total — the matched set localCheckpoints once
and every subtree reads the cached blocks) and the results union in
a normalized long schema ``(agg, key, n_docs, metric, value)``.
Output of a single tree: one row per deepest bucket combination —
level-key columns (named by the spec), ``n_docs`` (leaf count), then
metric columns — ordered by the level keys ascending.  Docs with a null/out-of-range
key at any level drop from that level down (the ES default); a
``terms`` bucket takes ES's opt-in ``missing`` parameter (null keys
land in the given sentinel bucket instead) and every bucket kind
takes ``min_doc_count`` (buckets under the floor drop — applied
before ``size``, the ES order).  ``terms`` also takes ES's ``order``
(``{"_count"|"_key"|<metric name>: "asc"|"desc"}``) — it decides
which buckets ``size`` KEEPS (metric orders only at the deepest
level, where the metric columns live); the output frame itself stays
key-ordered, the flat-frame contract.  A deepest-level ``histogram``
with EXPLICIT ``min_doc_count: 0`` zero-fills its gaps per parent
prefix — optionally out to ``extended_bounds`` — with ``n_docs`` and
additive metrics at 0 and the rest NULL (the ES empty-bucket
rendering); pipelines then walk the gapless sequence, the reason ES
users pair min_doc_count=0 with a derivative.

PIPELINE leaves (ES parent-pipeline aggregations) may sit beside the
metric leaves: ``cumulative_sum`` / ``derivative`` / ``moving_fn``
compute window functions over the DEEPEST bucket level ordered by its
key within the parent prefix, ``bucket_selector`` prunes buckets by a
bound on an already-computed column, and ``bucket_sort`` keeps the
per-parent top ``size`` buckets by a sort key.  All of them run over
the bucket-cardinality-sized frame — zero additional corpus work, the
property that makes client-composed pipeline trees safe at 100 TB.
Pipelines apply IN SPEC ORDER (a ``derivative`` declared after a
``bucket_selector`` sees the pruned bucket sequence; declared before,
the full one — ES resolves the same ambiguity by dependency order,
which spec order subsumes for the linear chains a flat frame can
carry).  ``moving_fn`` follows ES's default ``shift=0`` window — the
``window`` buckets strictly BEFORE the current one — and an empty
window yields NULL.  ``bucket_sort`` truncates per parent (ties break
by bucket key ascending, pinned for determinism) but the output frame
stays ordered by the level keys — the flat-frame contract — rather
than re-ordered by the sort key.

SIBLING pipeline aggregations (``avg_bucket`` / ``min_bucket`` /
``max_bucket`` / ``sum_bucket`` / ``stats_bucket``) sit BESIDE the
deepest bucket node (the ES shape: ``{"months": {date_histogram…,
aggs: {sales: …}}, "avg_monthly": {"avg_bucket": {"buckets_path":
"months>sales"}}}``): each reduces a ``buckets_path`` column over the
sibling bucket's buckets within the parent prefix and lands as a
column CONSTANT within that prefix (the flat-frame rendering of ES's
one-value-per-parent response; ``stats_bucket`` lands five columns
``{name}_count/_min/_max/_avg/_sum``).  They compute AFTER size
truncation and parent pipelines — over exactly the returned buckets,
the ES evaluation order — and, like every pipeline, over the
bucket-cardinality frame: zero extra corpus work.  Declaring one
beside a NON-deepest bucket node raises: a flat frame only carries
metric values at the deepest level, so a mid-tree sibling path has
no column to reduce.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _matched_docstats

_BUCKET_KINDS = (
    "terms", "histogram", "date_histogram", "range", "geotile"
)
_METRIC_OPS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "value_count": F.count,
    # ES serves cardinality as an HLL approximation; the planner
    # serves the EXACT distinct count (same one-pass shape — Spark's
    # partial-aggregate distinct — and the honest oracle target).
    "cardinality": F.countDistinct,
}
_PIPELINE_KINDS = (
    "cumulative_sum",
    "derivative",
    "moving_fn",
    "bucket_selector",
    "bucket_sort",
)
_SIBLING_KINDS = (
    "avg_bucket",
    "min_bucket",
    "max_bucket",
    "sum_bucket",
    "stats_bucket",
)
_SIBLING_FNS = {
    "avg_bucket": F.avg,
    "min_bucket": F.min,
    "max_bucket": F.max,
    "sum_bucket": F.sum,
}
_MOVING_FNS = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
_SELECTOR_OPS = {
    "gte": lambda c, v: c >= v,
    "gt": lambda c, v: c > v,
    "lte": lambda c, v: c <= v,
    "lt": lambda c, v: c < v,
}
_DATE_INTERVALS = {"day", "week", "month", "quarter", "year"}


def _bucket_key(kind: str, body: Mapping):
    if kind == "geotile":
        # ES geotile_grid as a NESTABLE bucket source: "z/x/y" keys
        # from the stored point columns (geo.geotile_key_cols) — e.g.
        # terms(lang) → geotile(zoom 3) → stats composes the heat-map
        # breakdown no flat helper offered
        from .geo import geotile_key_cols

        return geotile_key_cols(
            int(body.get("zoom", 3)),
            body.get("lat_field", "lat"),
            body.get("lon_field", "lon"),
        )
    field = body["field"]
    if kind == "terms":
        # ES `missing`: docs without the field land in an explicit
        # sentinel bucket instead of dropping (opt-in, like ES)
        if "missing" in body:
            return F.coalesce(F.col(field), F.lit(body["missing"]))
        return F.col(field)
    if kind == "histogram":
        iv = float(body["interval"])
        return (F.floor(F.col(field).cast("double") / iv) * iv).cast(
            "double"
        )
    if kind == "date_histogram":
        interval = body["interval"]
        if interval not in _DATE_INTERVALS:
            raise ValueError(
                f"calendar interval must be one of "
                f"{sorted(_DATE_INTERVALS)}"
            )
        if interval == "day":
            return F.col(field).cast("date")
        return F.trunc(F.col(field), interval)
    if kind == "range":
        # half-open [lo, hi) buckets keyed "lo-hi" ('*' = unbounded),
        # the range_agg_over_store convention; non-overlapping as
        # given, out-of-range docs key to NULL and drop
        v = F.col(field).cast("double")
        expr = F.lit(None).cast("string")
        for lo, hi in reversed(list(body["ranges"])):
            key = (
                f"{'*' if lo is None else lo}-"
                f"{'*' if hi is None else hi}"
            )
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (v >= float(lo))
            if hi is not None:
                cond = cond & (v < float(hi))
            expr = F.when(cond, F.lit(key)).otherwise(expr)
        return expr
    raise ValueError(f"unknown bucket kind {kind!r}")


def _compile(
    spec: Mapping,
    levels: list,
    metrics: dict,
    pipelines: list,
    siblings: list | None = None,
) -> None:
    """Walk the ES-shaped tree: bucket nodes extend ``levels`` and
    recurse into their ``aggs``; a map of metric / pipeline leaves
    fills ``metrics`` and ``pipelines`` (in spec order) and
    terminates.  Sibling-pipeline nodes beside a bucket node land in
    ``siblings`` as ``(name, kind, body, depth)`` where ``depth`` is
    the bucket level they sit beside (validated deepest-only at
    apply time)."""
    if siblings is None:
        siblings = []
    if not isinstance(spec, Mapping) or not spec:
        raise ValueError("agg spec must be a non-empty mapping")
    kinds = {
        name: [k for k in node if k in _BUCKET_KINDS or k in _METRIC_OPS]
        for name, node in spec.items()
    }
    bucket_nodes = {
        n: ks[0]
        for n, ks in kinds.items()
        if ks and ks[0] in _BUCKET_KINDS
    }
    if bucket_nodes:
        if len(bucket_nodes) != 1:
            raise ValueError(
                "one bucket node per level inside a tree — sibling "
                "bucket forests go through agg_forest_frame / "
                f"agg_forest_over_store; got {sorted(bucket_nodes)}"
            )
        (name,) = bucket_nodes
        for sib_name, sib_node in spec.items():
            if sib_name == name:
                continue
            ks = [k for k in sib_node if k in _SIBLING_KINDS]
            if len(ks) != 1 or len(sib_node) != 1:
                raise ValueError(
                    f"node {sib_name!r} beside bucket {name!r} must "
                    f"hold exactly one sibling pipeline of "
                    f"{sorted(_SIBLING_KINDS)}"
                )
            siblings.append(
                (sib_name, ks[0], sib_node[ks[0]], len(levels))
            )
        node = spec[name]
        (kind,) = [k for k in node if k in _BUCKET_KINDS]
        body = node[kind]
        size = body.get("size") if kind == "terms" else None
        mdc = int(body.get("min_doc_count", 0))
        order = body.get("order") if kind == "terms" else None
        # histogram min_doc_count=0: ZERO-FILL the gaps (the Kibana
        # no-holes contract) — optionally out to extended_bounds
        fill = None
        if kind == "histogram" and "min_doc_count" in body and mdc == 0:
            fill = (
                float(body["interval"]),
                body.get("extended_bounds"),
            )
        levels.append(
            (name, _bucket_key(kind, body), size, mdc, order, fill)
        )
        child = node.get("aggs")
        if child is not None:
            _compile(child, levels, metrics, pipelines, siblings)
        return
    # metric / pipeline leaves (any number of siblings)
    for name, node in spec.items():
        pipes = [k for k in node if k in _PIPELINE_KINDS]
        if pipes:
            if len(pipes) != 1 or len(node) != 1:
                raise ValueError(
                    f"pipeline leaf {name!r} must hold exactly one of "
                    f"{sorted(_PIPELINE_KINDS)}"
                )
            pipelines.append((name, pipes[0], node[pipes[0]]))
            continue
        if "weighted_avg" in node:
            body = node["weighted_avg"]
            metrics[name] = (
                "weighted_avg",
                (body["value"]["field"], body["weight"]["field"]),
            )
            continue
        ops = [k for k in node if k in _METRIC_OPS]
        if len(ops) != 1:
            raise ValueError(
                f"leaf {name!r} must hold exactly one metric op of "
                f"{sorted(_METRIC_OPS)} (or weighted_avg)"
            )
        metrics[name] = (ops[0], node[ops[0]]["field"])


def matrix_stats_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    fields: Sequence[str],
) -> DataFrame:
    """ES ``matrix_stats`` aggregation: the pairwise
    covariance/correlation matrix (plus per-field mean) of numeric
    doc-values fields over the hit set — ONE partial-aggregated pass
    computes every pair's ``covar_samp``/``corr`` and every field's
    mean, then the model-sized result unpivots to one row per ordered
    pair (i <= j).  Output: ``(field_x, field_y, n, mean_x, mean_y,
    covariance, correlation)``, pair order as given."""
    fields = list(fields)
    if len(fields) < 2:
        raise ValueError("matrix_stats needs at least two fields")
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame(
            [],
            "field_x string, field_y string, n long, mean_x double, "
            "mean_y double, covariance double, correlation double",
        )
    base = stats
    for f in fields:
        base = base.filter(F.col(f).isNotNull())
    pairs = [
        (fields[i], fields[j])
        for i in range(len(fields))
        for j in range(i, len(fields))
    ]
    exprs = [F.count("*").alias("n")]
    for f in fields:
        exprs.append(F.avg(F.col(f)).alias(f"mean__{f}"))
    for x, y in pairs:
        exprs.append(
            F.covar_samp(F.col(x), F.col(y)).alias(f"cov__{x}__{y}")
        )
        exprs.append(F.corr(F.col(x), F.col(y)).alias(f"cor__{x}__{y}"))
    one = base.agg(*exprs)
    # unpivot the one-row matrix to (pair) rows — model-sized stack,
    # still lazy, no driver collect
    rows = None
    for x, y in pairs:
        r = one.select(
            F.lit(x).alias("field_x"),
            F.lit(y).alias("field_y"),
            F.col("n"),
            F.col(f"mean__{x}").alias("mean_x"),
            F.col(f"mean__{y}").alias("mean_y"),
            F.round(F.col(f"cov__{x}__{y}"), 6).alias("covariance"),
            F.round(F.col(f"cor__{x}__{y}"), 6).alias("correlation"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def cardinality_certified_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    field: str,
    rsd: float = 0.02,
) -> DataFrame:
    """ES ``cardinality`` the way ES actually serves it — an HLL
    sketch (Spark's HyperLogLog++ via ``approx_count_distinct``) —
    CERTIFIED against the exact distinct count in the same one-row
    result: ``(n_exact, hll_ok)`` where ``hll_ok`` bounds the sketch's
    relative error at 3·rsd.  The sketch is the 100 TB path (fixed
    memory per partition, one partial-aggregated pass, no
    distinct-shuffle); the exact count is the certificate the oracle
    can pin cross-engine.  Both ride ONE aggregate over the matched
    docstats frame."""
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame(
            [], "n_exact long, hll_ok boolean"
        )
    agg = stats.agg(
        F.countDistinct(F.col(field)).alias("n_exact"),
        F.approx_count_distinct(F.col(field), float(rsd)).alias(
            "__n_hll"
        ),
    )
    return agg.select(
        F.col("n_exact").cast("long").alias("n_exact"),
        (
            F.abs(F.col("__n_hll") - F.col("n_exact"))
            <= F.greatest(
                F.lit(3.0 * float(rsd)) * F.col("n_exact"),
                F.lit(1.0),
            )
        ).alias("hll_ok"),
    )


def agg_tree_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    spec: Mapping,
) -> DataFrame:
    """Run a nested aggregation tree over the hit set of ``terms`` —
    see the module docstring for spec shape, execution plan and
    output contract."""
    levels: list = []
    metrics: dict = {}
    pipelines: list = []
    siblings: list = []
    _compile(spec, levels, metrics, pipelines, siblings)
    if not levels:
        raise ValueError("agg spec needs at least one bucket level")

    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        cols = ", ".join(f"`{n}` string" for n, *_r in levels)
        mcols = "".join(f", `{n}` double" for n in metrics)
        return spark.createDataFrame(
            [], f"{cols}, n_docs long{mcols}"
        )
    return _apply_tree(stats, levels, metrics, pipelines, siblings)


def agg_forest_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    spec: Mapping,
) -> DataFrame:
    """Run a SIBLING BUCKET FOREST (multiple root aggregation
    subtrees — the Kibana-dashboard request shape ES clients issue
    constantly) over the hit set of ``terms``.  See
    :func:`agg_forest_frame` for the execution shape and output
    contract."""
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame(
            [],
            "agg string, key string, n_docs long, metric string, "
            "value double",
        )
    return agg_forest_frame(stats, spec)


def agg_forest_frame(matched_stats: DataFrame, spec: Mapping) -> DataFrame:
    """Compile a root mapping of SIBLING bucket subtrees — each key an
    independent aggregation tree (any nesting, metrics, pipelines,
    sibling pipelines) — over one already-matched docstats frame.

    Execution shape: the matched frame localCheckpoints ONCE (the one
    corpus-side scan), then every subtree compiles to its own
    single-groupBy pass over the materialized blocks — N subtrees cost
    N bucket-sized aggregations, never N corpus scans, which is what
    keeps client-composed dashboard forests safe at 100 TB.

    Output: the per-subtree frames normalized into ONE long schema
    ``(agg, key, n_docs, metric, value)`` — ``agg`` the subtree name,
    ``key`` the bucket's level keys joined with ``|`` (cast to
    string), one row per bucket per metric column (``metric =
    '_count'``, ``value = n_docs`` for subtrees with no metric
    leaves) — ordered by (agg, key, metric).  A flat frame cannot
    carry sibling forests wide (their key columns differ); the long
    form is the union that can."""
    if not isinstance(spec, Mapping) or not spec:
        raise ValueError("agg forest spec must be a non-empty mapping")
    cached = (
        matched_stats.localCheckpoint(eager=True)
        if len(spec) > 1
        else matched_stats
    )
    out = None
    for name in spec:
        levels: list = []
        metrics: dict = {}
        pipelines: list = []
        siblings: list = []
        _compile({name: spec[name]}, levels, metrics, pipelines, siblings)
        if not levels:
            raise ValueError(
                f"forest subtree {name!r} needs a bucket level"
            )
        tree = _apply_tree(cached, levels, metrics, pipelines, siblings)
        key_names = [n for n, *_r in levels]
        keyc = F.concat_ws(
            "|", *[F.col(k).cast("string") for k in key_names]
        ).alias("key")
        value_cols = [
            c for c in tree.columns if c not in key_names + ["n_docs"]
        ]
        if not value_cols:
            rows = tree.select(
                F.lit(name).alias("agg"),
                keyc,
                F.col("n_docs"),
                F.lit("_count").alias("metric"),
                F.col("n_docs").cast("double").alias("value"),
            )
        else:
            rows = None
            for m in value_cols:
                r = tree.select(
                    F.lit(name).alias("agg"),
                    keyc,
                    F.col("n_docs"),
                    F.lit(m).alias("metric"),
                    F.col(m).cast("double").alias("value"),
                )
                rows = r if rows is None else rows.unionByName(r)
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("agg", "key", "metric")


def agg_tree_frame(matched_stats: DataFrame, spec: Mapping) -> DataFrame:
    """Run a compiled aggregation tree over an ALREADY-MATCHED
    docstats frame — the hook the ``_search`` API executor uses to
    attach ``aggs`` to an arbitrary compiled query instead of a flat
    term list.  Same spec shape and output contract as
    :func:`agg_tree_over_store`."""
    levels: list = []
    metrics: dict = {}
    pipelines: list = []
    siblings: list = []
    _compile(spec, levels, metrics, pipelines, siblings)
    if not levels:
        raise ValueError("agg spec needs at least one bucket level")
    return _apply_tree(matched_stats, levels, metrics, pipelines, siblings)


def _apply_tree(
    stats: DataFrame,
    levels: list,
    metrics: dict,
    pipelines: list,
    siblings: list | None = None,
) -> DataFrame:
    key_names = [n for n, *_r in levels]
    fields: set = set()
    for _op, f in metrics.values():
        fields.update(f if isinstance(f, tuple) else (f,))
    keyed = stats.select(
        *[c.alias(n) for n, c, *_r in levels], *fields
    )
    for n in key_names:
        keyed = keyed.filter(F.col(n).isNotNull())

    def metric_expr(op, f):
        if op == "weighted_avg":
            v, w = f
            # ES weighted_avg: rows with a null value or weight drop
            both = F.col(v).isNotNull() & F.col(w).isNotNull()
            return F.sum(
                F.when(both, F.col(v) * F.col(w))
            ) / F.sum(F.when(both, F.col(w)))
        return _METRIC_OPS[op](F.col(f))

    aggs = [F.count("*").alias("n_docs")] + [
        metric_expr(op, f).alias(name)
        for name, (op, f) in metrics.items()
    ]
    grouped = keyed.groupBy(*key_names).agg(*aggs)

    # per-level min_doc_count filtering and terms-size truncation,
    # root → leaf: a level's bucket count is the sum of leaf counts
    # under it; min_doc_count drops buckets under the floor (ES
    # applies it before size), then rank within the parent prefix by
    # (count desc, key asc) keeps the top `size`.  All window work is
    # bucket-cardinality-sized.
    for i, (name, _c, size, mdc, order, _fill) in enumerate(levels):
        if size is None and mdc <= 1:
            continue
        parent = key_names[:i]
        pw = Window.partitionBy(*parent, name)
        grouped = grouped.withColumn(
            "__lvl_n", F.sum("n_docs").over(pw)
        )
        if mdc > 1:
            grouped = grouped.filter(F.col("__lvl_n") >= mdc)
        if size is not None:
            # ES terms `order`: which buckets `size` KEEPS (and the
            # rank that picks them) — _count (default), _key, or a
            # sub-metric name; metric orders only exist at the
            # deepest level, where the metric columns live
            if order:
                (opath, odir), = dict(order).items()
                desc = str(odir) == "desc"
                if opath == "_count":
                    ocol = F.col("__lvl_n")
                elif opath == "_key":
                    ocol = F.col(name)
                else:
                    if i != len(levels) - 1:
                        raise ValueError(
                            f"terms order {opath!r} on a non-deepest "
                            "level: metric columns only exist at the "
                            "deepest level of a flat frame"
                        )
                    if opath not in grouped.columns:
                        raise ValueError(
                            f"terms order {opath!r} is not a "
                            f"computed metric (have {grouped.columns})"
                        )
                    ocol = F.col(opath)
                lead = ocol.desc() if desc else ocol.asc()
            else:
                lead = F.col("__lvl_n").desc()
            rw = Window.partitionBy(*parent).orderBy(
                lead, F.col(name).asc()
            )
            grouped = grouped.withColumn(
                "__rk", F.dense_rank().over(rw)
            ).filter(F.col("__rk") <= int(size)).drop("__rk")
        grouped = grouped.drop("__lvl_n")

    # histogram zero-fill (deepest level only): per parent prefix,
    # every interval step between the observed (or extended_bounds)
    # min and max exists as a bucket — empty ones at n_docs 0 with
    # additive metrics (sum/value_count/cardinality) 0 and the rest
    # NULL, the ES empty-bucket rendering.  The spine is a
    # bucket-cardinality sequence + left join; pipelines below then
    # walk the GAPLESS sequence, which is exactly why ES users set
    # min_doc_count=0 under a derivative/moving_fn.
    for i, (name, _c, _size, _mdc, _order, fill) in enumerate(levels):
        if fill is None:
            continue
        if i != len(levels) - 1:
            raise ValueError(
                f"histogram zero-fill on {name!r}: min_doc_count=0 "
                "only supported at the deepest bucket level"
            )
        iv, bounds = fill
        parent = key_names[:-1]
        if parent:
            spine = grouped.groupBy(*parent).agg(
                F.min(name).alias("__lo"), F.max(name).alias("__hi")
            )
        else:
            spine = grouped.agg(
                F.min(name).alias("__lo"), F.max(name).alias("__hi")
            )
        if bounds is not None:
            import math as _math

            blo = _math.floor(float(bounds["min"]) / iv) * iv
            bhi = _math.floor(float(bounds["max"]) / iv) * iv
            spine = spine.select(
                *parent,
                F.least(F.col("__lo"), F.lit(blo)).alias("__lo"),
                F.greatest(F.col("__hi"), F.lit(bhi)).alias("__hi"),
            )
        spine = spine.select(
            *parent,
            F.explode(
                F.sequence(
                    F.round(F.col("__lo") / iv).cast("long"),
                    F.round(F.col("__hi") / iv).cast("long"),
                )
            ).alias("__i"),
        ).select(
            *parent, (F.col("__i") * F.lit(iv)).cast("double").alias(name)
        )
        grouped = spine.join(grouped, parent + [name], "left")
        zero_cols = {"n_docs"} | {
            mname
            for mname, (op, _f) in metrics.items()
            if op in ("sum", "value_count", "cardinality")
        }
        grouped = grouped.fillna({c: 0 for c in zero_cols})

    # pipeline leaves, spec order, over the bucket-cardinality frame:
    # windows partition by the parent prefix and walk the DEEPEST
    # level's buckets by key ascending (the ES bucket order)
    if pipelines:
        parent, leaf_key = key_names[:-1], key_names[-1]
        seq = Window.partitionBy(*parent).orderBy(F.col(leaf_key).asc())

        def path_col(body, ctx: str):
            p = body["buckets_path"]
            if p not in grouped.columns:
                raise ValueError(
                    f"{ctx}: buckets_path {p!r} is not a computed "
                    f"column (have {grouped.columns})"
                )
            return F.col(p)

        for name, kind, body in pipelines:
            if kind == "cumulative_sum":
                grouped = grouped.withColumn(
                    name,
                    F.sum(path_col(body, name)).over(
                        seq.rowsBetween(Window.unboundedPreceding, 0)
                    ),
                )
            elif kind == "derivative":
                c = path_col(body, name)
                grouped = grouped.withColumn(
                    name, c - F.lag(c, 1).over(seq)
                )
            elif kind == "moving_fn":
                n = int(body.get("window", 5))
                shift = int(body.get("shift", 0))
                fn = _MOVING_FNS.get(body.get("fn", "avg"))
                if fn is None or n < 1:
                    raise ValueError(
                        f"moving_fn {name!r}: fn must be one of "
                        f"{sorted(_MOVING_FNS)} and window >= 1"
                    )
                grouped = grouped.withColumn(
                    name,
                    fn(path_col(body, name)).over(
                        seq.rowsBetween(shift - n, shift - 1)
                    ),
                )
            elif kind == "bucket_selector":
                bounds = [k for k in body if k in _SELECTOR_OPS]
                if not bounds:
                    raise ValueError(
                        f"bucket_selector {name!r} needs a bound of "
                        f"{sorted(_SELECTOR_OPS)}"
                    )
                c = path_col(body, name)
                for k in bounds:
                    grouped = grouped.filter(
                        _SELECTOR_OPS[k](c, F.lit(body[k]))
                    )
            elif kind == "bucket_sort":
                order = (
                    path_col(body, name).asc()
                    if body.get("order", "desc") == "asc"
                    else path_col(body, name).desc()
                )
                rw = Window.partitionBy(*parent).orderBy(
                    order, F.col(leaf_key).asc()
                )
                grouped = (
                    grouped.withColumn("__bs", F.row_number().over(rw))
                    .filter(F.col("__bs") <= int(body["size"]))
                    .drop("__bs")
                )

    # sibling pipeline aggs, AFTER truncation and parent pipelines
    # (the ES order: they reduce the returned buckets), as windows
    # over the parent prefix — constant within it, the flat-frame
    # rendering of one-value-per-parent
    for name, kind, body, depth in siblings or []:
        if depth != len(key_names) - 1:
            raise ValueError(
                f"sibling pipeline {name!r} sits beside bucket level "
                f"{depth} but only the deepest level "
                f"({len(key_names) - 1}) carries metric columns in a "
                "flat frame — move it beside the deepest bucket node"
            )
        path = str(body["buckets_path"]).split(">")
        col = "n_docs" if path[-1] == "_count" else path[-1]
        if col not in grouped.columns:
            raise ValueError(
                f"sibling pipeline {name!r}: buckets_path "
                f"{body['buckets_path']!r} does not end at a computed "
                f"column (have {grouped.columns})"
            )
        parent = key_names[:-1]
        sw = Window.partitionBy(*parent)
        if kind == "stats_bucket":
            grouped = (
                grouped.withColumn(
                    f"{name}_count", F.count(F.col(col)).over(sw)
                )
                .withColumn(f"{name}_min", F.min(F.col(col)).over(sw))
                .withColumn(f"{name}_max", F.max(F.col(col)).over(sw))
                .withColumn(f"{name}_avg", F.avg(F.col(col)).over(sw))
                .withColumn(f"{name}_sum", F.sum(F.col(col)).over(sw))
            )
        else:
            grouped = grouped.withColumn(
                name, _SIBLING_FNS[kind](F.col(col)).over(sw)
            )

    return grouped.orderBy(*[F.col(n).asc() for n in key_names])


def top_hits_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    group_field: str,
    sort_field: str,
    k: int = 3,
    descending: bool = True,
) -> DataFrame:
    """ES ``top_hits`` under a ``terms`` bucket: the top ``k``
    documents per bucket by a doc-values sort — grouped retrieval
    ("best N per category"), which the flat planner cannot carry
    (its contract is one row per bucket; top_hits is one row per
    bucket-HIT).  A window ``row_number`` per group over the matched
    docstats frame: matched-sized window work, bucket-cardinality x k
    output.  Null group or sort values drop (the ES default).
    Output: ``(group_field, rank, doc, sort_field)``, group asc /
    rank asc; ties break doc asc (pinned for determinism)."""
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame(
            [],
            f"`{group_field}` string, rank int, doc long, "
            f"`{sort_field}` double",
        )
    sc = F.col(sort_field)
    w = Window.partitionBy(group_field).orderBy(
        sc.desc() if descending else sc.asc(), F.col("doc").asc()
    )
    return (
        stats.filter(
            F.col(group_field).isNotNull() & sc.isNotNull()
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(group_field, "rank", "doc", sort_field)
        .orderBy(F.col(group_field).asc(), F.col("rank").asc())
    )
