"""Geo sidecar: cell-partition pruning (PartitionFilters reach the
scan — the BKD-tree role), exact-verify equality against the linear
plan, freshness fallback when the store moves on, ring edge cases
(antimeridian wrap, poles, near-global radius), and the geotile_grid
key math (clamping at extreme latitudes).
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from mongo_es_spark.operators.geo import (
    _box_cells,
    _ring_cells,
    geo_bbox_pruned,
    geo_distance_pruned,
    geotile_grid_over_store,
    haversine_km_col,
    materialize_geo_index,
)
from mongo_es_spark.operators.text import incremental_bm25_index


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _docs(spark, n=400):
    # deterministic spread over the globe incl. extreme lats/lons
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("point doc "),
            F.when(F.col("id") % 2 == 0, F.lit("even")).otherwise(
                F.lit("odd")
            ),
        ).alias("text"),
        ((F.col("id") % 180) - 90 + F.lit(0.5))
        .cast("double")
        .alias("lat"),
        ((F.col("id") * 7 % 360) - 180 + F.lit(0.5))
        .cast("double")
        .alias("lon"),
    )


@pytest.fixture(scope="module")
def geo_store(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("geo") / "bm")
    incremental_bm25_index(
        spark, _docs(spark), store, field_cols=["lat", "lon"]
    ).count()
    materialize_geo_index(spark, store, cell_deg=15.0)
    return store


def _linear_distance(spark, store, lat, lon, radius, k=10):
    docstats = spark.read.parquet(store + "/docstats")
    dist = haversine_km_col(lat, lon, "lat", "lon")
    return (
        docstats.select("doc", F.round(dist, 6).alias("dist_km"))
        .filter(F.col("dist_km") <= radius)
        .orderBy(F.col("dist_km").asc(), F.col("doc").asc())
        .limit(k)
    )


def test_pruned_plan_and_equality(spark, geo_store):
    q = geo_distance_pruned(spark, geo_store, 10.5, 20.5, 2500.0, k=10)
    plan = _plan_of(q)
    assert "PartitionFilters" in plan
    # the cell IN (...) predicate sits in PartitionFilters, i.e. file
    # pruning, not a post-scan row filter
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1)
    got = [tuple(r) for r in q.collect()]
    want = [
        tuple(r)
        for r in _linear_distance(
            spark, geo_store, 10.5, 20.5, 2500.0
        ).collect()
    ]
    assert got == want and len(got) > 0


@pytest.mark.parametrize(
    "lat,lon,radius",
    [
        (89.0, 0.5, 1500.0),     # pole cap: full lon ring
        (0.5, 179.5, 2000.0),    # antimeridian wrap
        (-45.5, -179.5, 3000.0),
        (0.5, 0.5, 25000.0),     # near-global: ring gives up, still right
    ],
)
def test_ring_edges_match_linear(spark, geo_store, lat, lon, radius):
    got = [
        tuple(r)
        for r in geo_distance_pruned(
            spark, geo_store, lat, lon, radius, k=25
        ).collect()
    ]
    want = [
        tuple(r)
        for r in _linear_distance(
            spark, geo_store, lat, lon, radius, k=25
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_ring_covers_circle_and_wraps():
    # wrap: cells near lon +180 must include ix 0-side neighbors
    cells = _ring_cells(0.5, 179.5, 2000.0, 15.0)
    ixs = {int(c.split("_")[1]) for c in cells}
    assert 23 in ixs and 0 in ixs  # both sides of the antimeridian
    # pole: full longitude ring at extreme latitude
    polar = _ring_cells(89.0, 0.0, 1500.0, 15.0)
    assert {int(c.split("_")[1]) for c in polar} == set(range(24))
    # near-global gives up pruning entirely
    assert _ring_cells(0.0, 0.0, 30000.0, 1.0) is None
    # boxes never wrap; inclusive edges
    assert _box_cells(-20.0, 40.0, -60.0, 60.0, 15.0) is not None


def test_terms_filtered_pruned_matches_linear(spark, geo_store):
    got = [
        tuple(r)
        for r in geo_distance_pruned(
            spark, geo_store, 10.5, 20.5, 4000.0, terms=["even"], k=50
        ).collect()
    ]
    lin = _linear_distance(spark, geo_store, 10.5, 20.5, 4000.0, k=10_000)
    even = {
        r["doc"]
        for r in spark.read.parquet(geo_store + "/postings")
        .filter(F.col("token") == "even")
        .select("doc")
        .distinct()
        .collect()
    }
    want = [tuple(r) for r in lin.collect() if r["doc"] in even][:50]
    assert got == want and len(got) > 0


def test_bbox_pruned_matches_exact(spark, geo_store):
    q = geo_bbox_pruned(spark, geo_store, -20.0, 40.0, -60.0, 60.0)
    assert "PartitionFilters" in _plan_of(q)
    got = [tuple(r) for r in q.collect()]
    docstats = spark.read.parquet(geo_store + "/docstats")
    want = [
        tuple(r)
        for r in docstats.filter(
            (F.col("lat") >= -20.0)
            & (F.col("lat") <= 40.0)
            & (F.col("lon") >= -60.0)
            & (F.col("lon") <= 60.0)
        )
        .select("doc", "lat", "lon")
        .orderBy("doc")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_stale_sidecar_falls_back_then_rebuild_trusts(spark, tmp_path):
    store = str(tmp_path / "bm")
    incremental_bm25_index(
        spark, _docs(spark, 200), store, field_cols=["lat", "lon"]
    ).count()
    materialize_geo_index(spark, store, cell_deg=15.0)

    # fold MORE docs: live count moves, sidecar must be distrusted
    more = _docs(spark, 400).filter(F.col("doc_id") >= 200)
    incremental_bm25_index(
        spark, more, store, field_cols=["lat", "lon"]
    ).count()
    q = geo_distance_pruned(spark, store, 10.5, 20.5, 3000.0, k=50)
    assert "PartitionFilters" not in _plan_of(q)  # linear fallback
    got = [tuple(r) for r in q.collect()]
    want = [
        tuple(r)
        for r in _linear_distance(
            spark, store, 10.5, 20.5, 3000.0, k=50
        ).collect()
    ]
    assert got == want  # fallback correct over ALL 400 docs

    materialize_geo_index(spark, store, cell_deg=15.0)
    q2 = geo_distance_pruned(spark, store, 10.5, 20.5, 3000.0, k=50)
    assert "PartitionFilters" in _plan_of(q2)  # re-trusted
    assert [tuple(r) for r in q2.collect()] == want


def test_geotile_keys_clamp_and_match_duckdb(spark, geo_store):
    import duckdb

    grid = geotile_grid_over_store(spark, geo_store, ["point"], zoom=3)
    rows = grid.collect()
    keys = {r["key"] for r in rows}
    # extreme latitudes clamp into [0, 2^z-1], never 8 or -1
    for key in keys:
        z, x, y = key.split("/")
        assert z == "3" and 0 <= int(x) <= 7 and 0 <= int(y) <= 7
    assert sum(r["n_docs"] for r in rows) == 400

    con = duckdb.connect()
    con.register(
        "pts",
        spark.read.parquet(geo_store + "/docstats")
        .select("doc", "lat", "lon")
        .toPandas(),
    )
    want = con.execute(
        """
        SELECT concat('3/',
               least(greatest(floor((lon + 180) / 360 * 8), 0), 7)
                   ::BIGINT::VARCHAR,
               '/',
               least(greatest(floor((1 - ln(tan(radians(lat))
                   + 1 / cos(radians(lat))) / pi()) / 2 * 8), 0), 7)
                   ::BIGINT::VARCHAR) AS key,
               count(*)::BIGINT AS n_docs
        FROM pts GROUP BY key ORDER BY n_docs DESC, key ASC
        """
    ).fetchall()
    got = [(r["key"], r["n_docs"]) for r in rows]
    assert got == [tuple(w) for w in want]


def test_geo_bounds_centroid(spark, geo_store):
    from mongo_es_spark.operators.geo import (
        geo_bounds_centroid_over_store,
    )

    row = geo_bounds_centroid_over_store(
        spark, geo_store, ["even"]
    ).head()
    pts = [
        (r["lat"], r["lon"])
        for r in spark.read.parquet(geo_store + "/docstats")
        .filter(F.col("doc") % 2 == 0)
        .select("lat", "lon")
        .collect()
    ]
    lats = [p[0] for p in pts]
    lons = [p[1] for p in pts]
    assert row["n_points"] == len(pts)
    assert (row["min_lat"], row["max_lat"]) == (min(lats), max(lats))
    assert (row["min_lon"], row["max_lon"]) == (min(lons), max(lons))
    assert abs(row["c_lat"] - sum(lats) / len(lats)) < 1e-9
    assert abs(row["c_lon"] - sum(lons) / len(lons)) < 1e-9
