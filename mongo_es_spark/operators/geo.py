"""Spatial serving for the search store: a cell-partitioned geo
sidecar (the IVF-cell pattern — ``similarity.py:materialize_ivf_index``
— applied to points), ring-pruned ``geo_distance`` / ``geo_bbox``
with exact haversine verification, and the ES ``geotile_grid``
aggregation.

Why: ES serves geo queries from a BKD tree; the repo's r10 geo ops
evaluated haversine over the MATCHED set only, so a pure-geo query
(no term companion) degenerated to a full-corpus scan — the one
named scale-killer of the r10 verdict.  The sidecar stores each live
doc's point partitioned by an integer lat/lon grid cell
(``<bm25 store>/geostats/cell=IY_IX/``); a query enumerates the
model-sized cell ring covering its circle/box driver-side and the
scan prunes at FILE level (``PartitionFilters`` on ``cell``) before
the exact predicate runs — at 100 TB the unpruned cells' parquet is
never opened, the same certificate-free-by-construction shape as the
IVF probe (cells fully cover the circle, so pruning has no false
negatives; the exact haversine/box test inside keeps no false
positives).

Freshness: the sidecar records the store's generation counter and
live-doc count at build time; serving trusts it only while the store
is unmutated with the SAME gen and count (folds change the count,
CDC sets the mutated flag/bumps gen).  Untrusted → transparent
fallback to the linear docstats path (correct, just unpruned), the
tokenstats-rollup discipline.
"""

from __future__ import annotations

import math
import os
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import (
    _bm_docstats_path,
    _matched_docstats,
    _read_search_store,
    _store_params_row,
    analyze_store_terms,
)

# mean-earth-radius km per degree of latitude (2πR/360, R=6371)
_KM_PER_DEG = 6371.0 * math.pi / 180.0


def _geo_path(store_path: str) -> str:
    return store_path.rstrip("/") + "/geostats"


def _geo_params_path(store_path: str) -> str:
    # underscore prefix: invisible to spark.read.parquet(store_path)
    return store_path.rstrip("/") + "/_geo_params"


def geo_cell_col(lat_col, lon_col, cell_deg: float):
    """The partition cell of a point: ``"IY_IX"`` with IY/IX the
    integer grid indexes of a ``cell_deg``-degree graticule.  Pure
    column arithmetic — identical driver-side in :func:`_ring_cells`."""
    iy = F.floor((F.col(lat_col) + 90.0) / float(cell_deg)).cast("int")
    ix = F.floor((F.col(lon_col) + 180.0) / float(cell_deg)).cast("int")
    return F.concat_ws("_", iy, ix)


def materialize_geo_index(
    spark,
    store_path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 15.0,
) -> None:
    """Build/rebuild the geo sidecar from the store's LIVE docstats:
    ``(doc, lat, lon)`` written partitioned by grid cell, plus a
    one-row ``_geo_params`` freshness record (cell size, the source
    store's generation counter and live count at build).  One
    docstats pass; cells are directory partitions so queries prune
    files, not rows."""
    _postings, docstats = _read_search_store(spark, store_path)
    if docstats is None:
        raise ValueError(f"no search store at {store_path}")
    pts = docstats.select(
        "doc",
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    # ONE file per cell: without the repartition every write task
    # emits a file into every cell it touches (tasks × cells files —
    # measured 9k files at 32 tasks / 15° cells), and partition
    # DISCOVERY at query time costs more than the scan it prunes
    pts.withColumn(
        "cell", geo_cell_col("lat", "lon", cell_deg)
    ).repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(_geo_path(store_path))
    p_row = _store_params_row(spark, store_path) or {}
    spark.range(1).select(
        F.lit(float(cell_deg)).alias("cell_deg"),
        F.lit(int(p_row.get("gen") or 0)).cast("long").alias("built_gen"),
        # freshness signature: the docstats FILE LISTING at build —
        # folds append files, compaction rewrites them, so any store
        # movement changes the signature; comparing it at query time
        # is an os.scandir, not a Spark count job (the count probe
        # measured ~0.2 s per query at 2M docs, most of the pruning
        # win)
        F.lit(
            _dir_signature(_bm_docstats_path(store_path)) or ""
        ).alias("built_sig"),
        F.lit(lat_col).alias("lat_col"),
        F.lit(lon_col).alias("lon_col"),
    ).coalesce(1).write.mode("overwrite").parquet(
        _geo_params_path(store_path)
    )
    _GEO_TRUST_CACHE.clear()


def _dir_signature(path: str) -> str | None:
    """Deterministic signature of a store directory's data files
    (name, size, mtime_ns) — any append/rewrite changes it.  None for
    non-local paths (no os.scandir) → callers fall back to the
    unpruned plan, correct just not fast."""
    try:
        entries = sorted(
            (e.name, e.stat().st_size, e.stat().st_mtime_ns)
            for e in os.scandir(path)
            if e.is_file() and not e.name.startswith(("_", "."))
        )
    except OSError:
        return None
    return ";".join(f"{n}:{s}:{m}" for n, s, m in entries)


# (store_path, docstats signature) -> (geo DataFrame, cell_deg):
# repeated queries against an unchanged store skip the params read
# and re-listing entirely
_GEO_TRUST_CACHE: dict = {}


def _geo_trusted(spark, store_path: str):
    """(geostats DataFrame, cell_deg) when the sidecar is provably in
    sync with the store — exists, store unmutated, same generation
    counter, and the docstats file listing unchanged since build —
    else (None, None).  Folds append docstats files and CDC sets the
    mutated flag / bumps the counter, so any store movement flips the
    signature; the check is an os.scandir, never a Spark job."""
    from ..storeio import read_params_rows, read_parquet_if_exists

    sig = _dir_signature(_bm_docstats_path(store_path))
    if sig is None:
        return None, None
    key = (os.path.abspath(store_path), sig)
    hit = _GEO_TRUST_CACHE.get(key)
    if hit is not None:
        return hit
    grows = read_params_rows(spark, _geo_params_path(store_path))
    if not grows:
        return None, None
    g = grows[0].asDict()
    p = _store_params_row(spark, store_path) or {}
    if bool(p.get("mutated")):
        return None, None
    if int(p.get("gen") or 0) != int(g["built_gen"]):
        return None, None
    if g.get("built_sig") != sig:
        return None, None
    geo = read_parquet_if_exists(spark, _geo_path(store_path))
    if geo is None:
        return None, None
    if len(_GEO_TRUST_CACHE) > 64:
        _GEO_TRUST_CACHE.clear()
    _GEO_TRUST_CACHE[key] = (geo, float(g["cell_deg"]))
    return geo, float(g["cell_deg"])


_MAX_RING_CELLS = 1024


def _ring_cells(
    lat: float,
    lon: float,
    radius_km: float,
    cell_deg: float,
) -> list[str] | None:
    """The grid cells whose union COVERS the radius circle (superset
    — exact verification runs inside), as partition keys.  Handles
    pole clamping and antimeridian wrap.  None when the ring would
    exceed ``_MAX_RING_CELLS`` (a near-global query — pruning buys
    nothing; scan unpruned instead)."""
    delta = radius_km / 6371.0  # angular radius, radians
    dlat = math.degrees(delta)
    lat_lo = max(-90.0, lat - dlat)
    lat_hi = min(90.0, lat + dlat)
    iy0 = int(math.floor((lat_lo + 90.0) / cell_deg))
    iy1 = int(math.floor((min(lat_hi, 89.999999) + 90.0) / cell_deg))
    n_ix = int(math.ceil(360.0 / cell_deg))
    # exact spherical-cap bounding box: the max longitude deviation is
    # asin(sin δ / cos φ) at the tangent parallel (NOT the δ/cosφ
    # linearization, which UNDER-covers at large radii — a point 166 km
    # across the pole sat outside the linearized ring).  A cap that
    # contains a pole (|φ|+δ ≥ 90°) or whose sin δ ≥ cos φ spans every
    # longitude.
    phi = math.radians(lat)
    full_lon = (
        lat + dlat >= 90.0
        or lat - dlat <= -90.0
        or math.sin(min(delta, math.pi / 2)) >= math.cos(phi)
    )
    if full_lon:
        ixs = list(range(n_ix))
    else:
        dlon = math.degrees(
            math.asin(math.sin(delta) / math.cos(phi))
        )
        ix0 = int(math.floor((lon - dlon + 180.0) / cell_deg))
        ix1 = int(math.floor((lon + dlon + 180.0) / cell_deg))
        ixs = sorted({i % n_ix for i in range(ix0, ix1 + 1)})
    cells = [
        f"{iy}_{ix}" for iy in range(iy0, iy1 + 1) for ix in ixs
    ]
    return cells if len(cells) <= _MAX_RING_CELLS else None


def _box_cells(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    cell_deg: float,
) -> list[str] | None:
    """Cells covering a lat/lon box (edges inclusive; no
    antimeridian-crossing boxes — callers pass lon_min <= lon_max,
    the ES default box shape)."""
    iy0 = int(math.floor((max(lat_min, -90.0) + 90.0) / cell_deg))
    iy1 = int(
        math.floor((min(lat_max, 89.999999) + 90.0) / cell_deg)
    )
    ix0 = int(math.floor((max(lon_min, -180.0) + 180.0) / cell_deg))
    ix1 = int(
        math.floor((min(lon_max, 179.999999) + 180.0) / cell_deg)
    )
    cells = [
        f"{iy}_{ix}"
        for iy in range(iy0, iy1 + 1)
        for ix in range(ix0, ix1 + 1)
    ]
    return cells if len(cells) <= _MAX_RING_CELLS else None


def haversine_km_col(lat: float, lon: float, lat_col, lon_col):
    """Great-circle distance (mean earth radius 6371 km) from the
    fixed point to the row's point — whole-stage-codegen trig."""
    phi1 = F.radians(F.lit(float(lat)))
    phi2 = F.radians(F.col(lat_col))
    dphi = F.radians(F.col(lat_col) - F.lit(float(lat)))
    dlam = F.radians(F.col(lon_col) - F.lit(float(lon)))
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlam / 2), 2)
    )
    return F.lit(2.0 * 6371.0) * F.asin(F.sqrt(a))


def geo_distance_pruned(
    spark,
    store_path: str,
    lat: float,
    lon: float,
    radius_km: float,
    terms: Sequence[str] = (),
    k: int = 10,
) -> DataFrame:
    """ES ``geo_distance`` + distance sort, served from the cell
    sidecar when trusted: the ring's partitions are the ONLY files
    read (``PartitionFilters: cell IN (…)``), the exact haversine
    filters inside, an optional term match semi-joins the doc ids.
    Pure-geo queries (``terms=()``) — the r10 scale gap — cost
    ∝ ring area, not corpus size.  Untrusted/absent sidecar falls
    back to the linear docstats path with identical results (pinned
    by test).  Output: ``(doc, dist_km)`` rounded 6dp, distance asc
    then doc asc, top ``k``."""
    from .text import geo_distance_over_store

    geo, cell_deg = _geo_trusted(spark, store_path)
    cells = (
        _ring_cells(lat, lon, radius_km, cell_deg)
        if geo is not None
        else None
    )
    if geo is None or cells is None:
        # fallback: matched-set (or full docstats) linear evaluation
        if terms:
            return geo_distance_over_store(
                spark, store_path, terms, lat, lon, radius_km, k=k
            )
        _p, docstats = _read_search_store(spark, store_path)
        if docstats is None:
            return spark.createDataFrame([], "doc long, dist_km double")
        base = docstats
    else:
        base = geo.filter(F.col("cell").isin(cells))
        if terms:
            t = analyze_store_terms(spark, store_path, terms)
            postings, _d = _read_search_store(spark, store_path)
            matched = (
                postings.filter(F.col("token").isin(*t))
                .select("doc")
                .distinct()
            )
            base = base.join(matched, "doc", "left_semi")
    dist = haversine_km_col(lat, lon, "lat", "lon")
    return (
        base.select("doc", F.round(dist, 6).alias("dist_km"))
        .filter(F.col("dist_km") <= float(radius_km))
        .orderBy(F.col("dist_km").asc(), F.col("doc").asc())
        .limit(int(k))
    )


def geo_bbox_pruned(
    spark,
    store_path: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    terms: Sequence[str] = (),
) -> DataFrame:
    """ES ``geo_bounding_box`` served from the cell sidecar (file
    pruning + exact edge-inclusive box test), with the same fallback
    contract as :func:`geo_distance_pruned`.  Output: ``(doc, lat,
    lon)``, doc asc."""
    from .text import geo_bbox_over_store

    geo, cell_deg = _geo_trusted(spark, store_path)
    cells = (
        _box_cells(lat_min, lat_max, lon_min, lon_max, cell_deg)
        if geo is not None
        else None
    )
    if geo is None or cells is None:
        if terms:
            return geo_bbox_over_store(
                spark, store_path, terms,
                lat_min, lat_max, lon_min, lon_max,
            )
        _p, docstats = _read_search_store(spark, store_path)
        if docstats is None:
            return spark.createDataFrame(
                [], "doc long, lat double, lon double"
            )
        base = docstats
    else:
        base = geo.filter(F.col("cell").isin(cells))
        if terms:
            t = analyze_store_terms(spark, store_path, terms)
            postings, _d = _read_search_store(spark, store_path)
            matched = (
                postings.filter(F.col("token").isin(*t))
                .select("doc")
                .distinct()
            )
            base = base.join(matched, "doc", "left_semi")
    return (
        base.filter(
            (F.col("lat") >= float(lat_min))
            & (F.col("lat") <= float(lat_max))
            & (F.col("lon") >= float(lon_min))
            & (F.col("lon") <= float(lon_max))
        )
        .select("doc", "lat", "lon")
        .orderBy(F.col("doc").asc())
    )


def geotile_key_cols(zoom: int, lat_col, lon_col):
    """ES ``geotile_grid`` bucket key ``"z/x/y"`` (web-mercator
    tiles): x = floor((lon+180)/360·2^z), y from the mercator
    projection with the ±85.05113° clamp expressed as an index clamp
    (floor can land at 2^z for lat → −90).  Portable math: tan / ln /
    cos / floor exist identically in DuckDB for the oracle."""
    n = float(1 << int(zoom))
    x = F.floor((F.col(lon_col) + 180.0) / 360.0 * n).cast("long")
    x = F.least(F.greatest(x, F.lit(0)), F.lit(int(n) - 1))
    phi = F.radians(F.col(lat_col))
    merc = F.log(F.tan(phi) + 1.0 / F.cos(phi))
    y = F.floor((1.0 - merc / F.lit(math.pi)) / 2.0 * n).cast("long")
    y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1))
    return F.concat_ws("/", F.lit(int(zoom)), x, y)


def geo_bounds_centroid_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES ``geo_bounds`` + ``geo_centroid`` aggregations over the hit
    set in ONE pass: the bounding box (top-left / bottom-right) and
    the arithmetic centroid of the matched docs' points, plus the
    point count — served entirely from docstats doc values (∝ matched
    docs, one partial-aggregated scan, a one-row result).  Docs with
    a NULL coordinate drop, the ES behavior.  Longitude bounds are
    min/max (no antimeridian wrapping — ES offers that only for
    geo_shape)."""
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame(
            [],
            "min_lat double, max_lat double, min_lon double, "
            "max_lon double, c_lat double, c_lon double, n_points long",
        )
    pts = stats.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    )
    return pts.agg(
        F.min(lat_col).alias("min_lat"),
        F.max(lat_col).alias("max_lat"),
        F.min(lon_col).alias("min_lon"),
        F.max(lon_col).alias("max_lon"),
        F.avg(lat_col).alias("c_lat"),
        F.avg(lon_col).alias("c_lon"),
        F.count("*").alias("n_points"),
    )


def geotile_grid_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    zoom: int = 3,
    size: int = 10_000,
) -> DataFrame:
    """ES ``geotile_grid`` aggregation over the hit set: doc counts
    per web-mercator tile at ``zoom``, key ``"z/x/y"``, count desc
    then key asc, top ``size`` buckets.  Served from the matched
    docstats frame (doc-values; ∝ matched docs) — the heat-map /
    cluster-map aggregation every geo UI issues."""
    if not 0 <= int(zoom) <= 29:
        raise ValueError("geotile zoom must be in [0, 29]")
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame([], "key string, n_docs long")
    return (
        stats.select(
            geotile_key_cols(zoom, "lat", "lon").alias("key")
        )
        .groupBy("key")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("key").asc())
        .limit(int(size))
    )
