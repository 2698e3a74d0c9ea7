"""ivf_exact_topk: exact top-k over the IVF store via centroid-radius
upper-bound pruning.  The contract under test is EQUALITY with
brute-force cosine top-k (score desc, id asc, 6-dp rounding) while
unprobed cells' parquet is never read — so every test pins the result
against an independently computed brute force, and the cluster
geometries are chosen to exercise each wave/bound edge: one-wave
pruning, the forced second wave, rounded-score ties straddling the
wave boundary (the 5e-7 margin), zero/NULL vectors, store appends,
and the pre-cellstats fallback."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def _brute_topk(rows, qv, k, exclude_id=None):
    """Driver-side reference: cosine to qv, 6-dp round, score desc /
    id asc, NULL (zero/missing) vectors excluded."""
    q = np.asarray(qv, dtype=np.float64)
    qn = np.linalg.norm(q)
    out = []
    for vid, v in rows:
        if v is None or (exclude_id is not None and vid == exclude_id):
            continue
        a = np.asarray(v, dtype=np.float64)
        na = np.linalg.norm(a)
        if na == 0.0 or qn == 0.0:
            continue  # NULL cosine under the kernel contract
        out.append((vid, round(float(a @ q / (na * qn)), 6)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def _arc_rows(angles, start_id=0):
    """2-D unit vectors at the given angles (degrees), ids sequential."""
    return [
        (
            start_id + i,
            [math.cos(math.radians(a)), math.sin(math.radians(a))],
        )
        for i, a in enumerate(angles)
    ]


@pytest.fixture(scope="module")
def emb(spark):
    from mongo_es_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def _mk_index(spark, rows, path, n_cells, schema="vec_id long, v array<double>"):
    from mongo_es_spark.operators.similarity import materialize_ivf_index

    df = spark.createDataFrame(rows, schema)
    materialize_ivf_index(df, "vec_id", "v", path, n_cells=n_cells)
    return df


def test_exact_equals_brute_force_on_fixture(spark, emb, tmp_path):
    from mongo_es_spark.operators.similarity import ivf_exact_topk

    path = str(tmp_path / "ivf")
    from mongo_es_spark.operators.similarity import materialize_ivf_index

    materialize_ivf_index(emb, "vec_id", "embedding", path, n_cells=16)
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(
            spark, path, qv, "vec_id", k=10, exclude_id=0
        ).collect()
    ]
    rows = [
        (r["vec_id"], r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    ]
    assert got == _brute_topk(rows, qv, 10, exclude_id=0)


def test_separated_clusters_prune_to_one_wave(spark, tmp_path):
    from mongo_es_spark.operators.similarity import ivf_exact_topk

    # three tight, well-separated arcs: the query sits inside the
    # first, whose upper bound dominates — wave 1 must read exactly
    # one cell and wave 2 must be provably empty
    rows = _arc_rows(
        [i * 0.5 for i in range(20)]            # 0..9.5 degrees
        + [120 + i * 0.5 for i in range(20)]    # 120..129.5
        + [240 + i * 0.5 for i in range(20)]    # 240..249.5
    )
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=3)
    qv = [1.0, 0.0]
    log: list = []
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(
            spark, path, qv, "vec_id", k=10, probe_log=log
        ).collect()
    ]
    assert got == _brute_topk(rows, qv, 10)
    assert len(log) == 1
    assert len(log[0]["wave1"]) == 1
    assert log[0]["wave2"] == []


def test_underfilled_wave_one_forces_second_wave(spark, tmp_path):
    from mongo_es_spark.operators.similarity import ivf_exact_topk

    # the near cell's stats say 10 members, but exclude_id removes one
    # at scan time: wave 1 returns 9 < k rows, s_k stays -inf, and the
    # second wave must sweep the remaining cell — still exact
    rows = _arc_rows(
        [i * 2.0 for i in range(10)] + [180 + i * 2.0 for i in range(10)]
    )
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=2)
    qv = [1.0, 0.0]
    log: list = []
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(
            spark, path, qv, "vec_id", k=10, exclude_id=0, probe_log=log
        ).collect()
    ]
    assert got == _brute_topk(rows, qv, 10, exclude_id=0)
    assert len(got) == 10
    assert len(log[0]["wave1"]) == 1 and log[0]["wave2"] != []

    # and k beyond the whole corpus returns every scorable row once
    got_all = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(spark, path, qv, "vec_id", k=25).collect()
    ]
    assert got_all == _brute_topk(rows, qv, 25)
    assert len(got_all) == 20


def test_rounded_tie_across_wave_boundary(spark, tmp_path):
    from mongo_es_spark.operators.similarity import ivf_exact_topk

    # mirror pair at ±25° around the query: equal rounded cosine, one
    # per cluster.  k=1 makes wave 1 read a single cell; the OTHER
    # cell's bound ties within the 5e-7 margin, so wave 2 must probe
    # it and the global tie must break to the smaller id.
    a_cluster = _arc_rows([25 + i for i in range(8)], start_id=100)
    b_cluster = _arc_rows([-25 - i for i in range(8)], start_id=200)
    mirror_a = [(7, [math.cos(math.radians(25)), math.sin(math.radians(25))])]
    mirror_b = [(3, [math.cos(math.radians(-25)), math.sin(math.radians(-25))])]
    rows = a_cluster + b_cluster + mirror_a + mirror_b
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=2)
    qv = [1.0, 0.0]
    log: list = []
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(
            spark, path, qv, "vec_id", k=1, probe_log=log
        ).collect()
    ]
    assert got == _brute_topk(rows, qv, 1)
    assert got[0][0] == 3  # the tie breaks to the smaller id
    assert log[0]["wave2"] != []  # the margin forced the second probe


def test_zero_and_null_vectors_never_rank(spark, tmp_path):
    from mongo_es_spark.operators.similarity import ivf_exact_topk

    rows = _arc_rows([i * 3.0 for i in range(12)]) + [
        (50, [0.0, 0.0]),
        (51, None),
    ]
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=2)
    qv = [1.0, 0.0]
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(spark, path, qv, "vec_id", k=12).collect()
    ]
    assert got == _brute_topk(rows, qv, 12)
    assert all(vid not in (50, 51) for vid, _ in got)


def test_append_keeps_exactness_and_merges_stats(spark, tmp_path):
    from mongo_es_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_exact_topk,
        materialize_ivf_index,
    )

    # train/materialize on the first arc only, then append a batch that
    # WIDENS a cell (points farther from its centroid than anything in
    # the training set) — read-time max over the per-batch stats rows
    # must absorb the wider radius or the bound would wrongly prune
    base = _arc_rows([i * 1.0 for i in range(16)])
    widen = _arc_rows([30 + i * 1.0 for i in range(8)], start_id=100)
    path = str(tmp_path / "ivf")
    df = _mk_index(spark, base, path, n_cells=2)
    appended = append_to_ivf_index(
        spark.createDataFrame(widen, "vec_id long, v array<double>"),
        "vec_id",
        "v",
        path,
    )
    assert appended == 8
    stats = spark.read.parquet(f"{path}/cellstats")
    assert stats.count() > stats.select("cell").distinct().count()
    qv = [math.cos(math.radians(35)), math.sin(math.radians(35))]
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(spark, path, qv, "vec_id", k=6).collect()
    ]
    assert got == _brute_topk(base + widen, qv, 6)
    # replay: the same batch appends nothing
    assert (
        append_to_ivf_index(
            spark.createDataFrame(widen, "vec_id long, v array<double>"),
            "vec_id",
            "v",
            path,
        )
        == 0
    )


def test_batch_equals_per_query_and_brute_force(spark, tmp_path):
    from mongo_es_spark.operators.similarity import (
        ivf_exact_batch_topk,
        ivf_exact_topk,
    )

    # three separated arcs + a zero and a NULL vector; queries sit in
    # different clusters so the union wave covers several cells while
    # each query's own mask stays narrow
    rows = _arc_rows(
        [i * 0.5 for i in range(20)]
        + [120 + i * 0.5 for i in range(20)]
        + [240 + i * 0.5 for i in range(20)]
    ) + [(90, [0.0, 0.0]), (91, None)]
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=3)
    queries = [
        (0, [1.0, 0.0]),
        (1, [math.cos(math.radians(121)), math.sin(math.radians(121))]),
        (2, [math.cos(math.radians(60)), math.sin(math.radians(60))]),
    ]
    log: list = []
    got = [
        (r["q_id"], r["vec_id"], r["score"])
        for r in ivf_exact_batch_topk(
            spark, path, queries, "vec_id", k=7, probe_log=log
        ).collect()
    ]
    want = []
    for q_id, qv in queries:
        want += [
            (q_id, r["vec_id"], r["score"])
            for r in ivf_exact_topk(
                spark, path, qv, "vec_id", k=7
            ).collect()
        ]
        want_bf = [(q_id, v, s) for v, s in _brute_topk(rows, qv, 7)]
        assert want[-7:] == want_bf
    assert got == want
    # the boundary query (60 deg) forces a wider probe than the
    # in-cluster ones, but the batch still reads each wave once
    assert len(log) == 1


def test_batch_exclude_self_and_duplicate_guard(spark, tmp_path):
    import pytest

    from mongo_es_spark.operators.similarity import ivf_exact_batch_topk

    rows = _arc_rows([i * 3.0 for i in range(18)])
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=2)
    queries = [(0, rows[0][1]), (5, rows[5][1])]
    got = [
        (r["q_id"], r["vec_id"], r["score"])
        for r in ivf_exact_batch_topk(
            spark, path, queries, "vec_id", k=5, exclude_self=True
        ).collect()
    ]
    for q_id, qv in queries:
        chunk = [t for t in got if t[0] == q_id]
        assert chunk == [
            (q_id, v, s)
            for v, s in _brute_topk(rows, qv, 5, exclude_id=q_id)
        ]
        assert all(v != q_id for _, v, _ in chunk)
    with pytest.raises(ValueError, match="duplicate q_id"):
        ivf_exact_batch_topk(
            spark, path, [(0, [1.0, 0.0]), (0, [0.0, 1.0])], "vec_id"
        )


def test_prestats_store_falls_back_exact(spark, tmp_path):
    import shutil

    from mongo_es_spark.operators.similarity import ivf_exact_topk

    rows = _arc_rows([i * 4.0 for i in range(24)])
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=3)
    shutil.rmtree(f"{path}/cellstats")  # simulate a pre-stats index
    qv = [1.0, 0.0]
    log: list = []
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(
            spark, path, qv, "vec_id", k=5, probe_log=log
        ).collect()
    ]
    assert got == _brute_topk(rows, qv, 5)
    # radius 2.0 fallback: every unprobed cell stays coverable
    assert set(log[0]["wave1"]) | set(log[0]["wave2"]) == {0, 1, 2}


def test_unmarked_store_refuses_stats_pruning(spark, tmp_path):
    """An index whose vectors may predate cellstats (no _ivf_params
    coverage marker) must NOT prune on whatever cellstats rows exist:
    here the stats deliberately UNDER-cover (they describe only one
    tight cell, while the true top-1 lives in a cell the stats call
    empty), so trusting them would drop the best hit.  Both exact
    paths must fall back to unpruned-but-exact."""
    import shutil

    from mongo_es_spark.operators.similarity import (
        _write_cellstats,
        ivf_exact_batch_topk,
        ivf_exact_topk,
    )

    rows = _arc_rows([i * 0.5 for i in range(10)]) + _arc_rows(
        [180.0], start_id=50
    )
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=2)
    # simulate a pre-marker index with PARTIAL stats: drop the marker,
    # then rewrite cellstats to claim the far cell has radius ~0 and
    # no members beyond one tight point
    shutil.rmtree(f"{path}/_ivf_params")
    shutil.rmtree(f"{path}/cellstats")
    staged = spark.createDataFrame(
        [(0, 0.0001), (1, 0.0001)], "cell int, __res double"
    )
    _write_cellstats(staged, f"{path}/cellstats", mode="overwrite")
    qv = [-1.0, 0.0]  # nearest true hit is id 50 in the far cell
    got = [
        (r["vec_id"], r["score"])
        for r in ivf_exact_topk(spark, path, qv, "vec_id", k=3).collect()
    ]
    assert got == _brute_topk(rows, qv, 3)
    got_b = [
        (r["q_id"], r["vec_id"], r["score"])
        for r in ivf_exact_batch_topk(
            spark, path, [(7, qv)], "vec_id", k=3
        ).collect()
    ]
    assert got_b == [(7, v, s) for v, s in _brute_topk(rows, qv, 3)]


def test_append_crash_between_stats_and_vectors_converges(spark, tmp_path):
    """Crash ordering for append_to_ivf_index: cellstats append FIRST,
    vectors second.  Simulate the crash point (stats written, vectors
    not) by appending the batch's stats rows manually, then run the
    full append as the retry: the anti-join re-appends both, stats
    over-cover (radius max / doubled count — conservative), and exact
    search over the converged store equals brute force."""
    from mongo_es_spark.operators.similarity import (
        append_to_ivf_index,
        _assign_residual_kernel,
        _write_cellstats,
        ivf_exact_topk,
    )
    from pyspark.sql.functions import pandas_udf

    base = _arc_rows([i * 3.0 for i in range(20)])
    extra = _arc_rows([200 + i * 3.0 for i in range(10)], start_id=100)
    path = str(tmp_path / "ivf")
    _mk_index(spark, base, path, n_cells=2)

    # crash point: the retry's exact stats rows already on disk
    cent = spark.read.parquet(f"{path}/centroids").collect()
    C = np.zeros((len(cent), len(cent[0]["centroid"])))
    for r in cent:
        C[r["cell"]] = r["centroid"]
    assign = pandas_udf(
        _assign_residual_kernel(C), "struct<cell:int,residual:double>"
    )
    staged = (
        spark.createDataFrame(extra, "vec_id long, v array<double>")
        .withColumn("__ar", assign(F.col("v")))
        .select(
            "vec_id",
            "v",
            F.col("__ar.cell").alias("cell"),
            F.col("__ar.residual").alias("__res"),
        )
    )
    _write_cellstats(staged, f"{path}/cellstats", mode="append")

    # retry: must append the vectors (ids absent) and re-append stats
    n = append_to_ivf_index(
        spark.createDataFrame(extra, "vec_id long, v array<double>"),
        "vec_id",
        "v",
        path,
    )
    assert n == len(extra)
    rows = base + extra
    for qv in ([1.0, 0.0], [-0.8, -0.6]):
        got = [
            (r["vec_id"], r["score"])
            for r in ivf_exact_topk(
                spark, path, qv, "vec_id", k=8
            ).collect()
        ]
        assert got == _brute_topk(rows, qv, 8)
    # replay of the SAME batch after success: pure no-op
    assert (
        append_to_ivf_index(
            spark.createDataFrame(extra, "vec_id long, v array<double>"),
            "vec_id",
            "v",
            path,
        )
        == 0
    )


def test_round6_half_up_matches_spark_round():
    """The Arrow kernels' rounding rule must match F.round (HALF_UP,
    away from zero) on exact 5e-7 boundaries where np.round banker's-
    rounds the other way."""
    from mongo_es_spark.operators.similarity import _round6_half_up

    xs = np.array([0.0000005, 0.0000015, -0.0000005, -0.0000015, 0.1239995])
    got = _round6_half_up(xs)
    want = np.array([0.000001, 0.000002, -0.000001, -0.000002, 0.124])
    assert np.allclose(got, want, atol=1e-12)
    # and np.round would have disagreed on the half-to-even cases
    assert not np.allclose(np.round(xs, 6), want, atol=1e-12)


def test_filtered_knn_stays_exact(spark, tmp_path):
    """allow_ids (the ES kNN-with-filter shape): results must equal
    brute force over the FILTERED set, including when the filter
    leaves fewer than k rows in wave 1's cells — the under-filled
    provisional top-k keeps s_k at -inf so wave 2 probes every
    remaining cell instead of skipping a qualifying row."""
    from mongo_es_spark.operators.similarity import ivf_exact_topk

    rows = _arc_rows(
        [i * 0.5 for i in range(20)]            # ids 0..19: near query
        + [120 + i * 0.5 for i in range(20)]    # ids 20..39
        + [240 + i * 0.5 for i in range(20)]    # ids 40..59
    )
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=3)
    qv = [1.0, 0.0]

    def run(allowed_ids, k=10):
        allow = spark.createDataFrame(
            [(i,) for i in allowed_ids], "vec_id long"
        )
        log: list = []
        got = [
            (r["vec_id"], r["score"])
            for r in ivf_exact_topk(
                spark, path, qv, "vec_id", k=k,
                probe_log=log, allow_ids=allow,
            ).collect()
        ]
        want = _brute_topk(
            [r for r in rows if r[0] in set(allowed_ids)], qv, k
        )
        assert got == want, (got, want)
        return log[0]

    # filter keeps >= k near the query: pruning still bites
    log = run(list(range(15)) + [25, 45])
    assert len(log["wave1"]) == 1 and log["wave2"] == []
    # filter leaves only 3 rows in the near cell: wave 2 must open up
    log = run([0, 1, 2] + list(range(20, 60)))
    assert len(log["wave2"]) > 0
    # filter excludes the near cell entirely
    run(list(range(20, 60)))
    # filter smaller than k
    run([5, 25, 45], k=10)
    # empty filter: no rows
    allow = spark.createDataFrame([], "vec_id long")
    assert (
        ivf_exact_topk(
            spark, path, qv, "vec_id", k=5, allow_ids=allow
        ).count()
        == 0
    )


def test_batch_filtered_equals_per_query(spark, tmp_path):
    """allow_ids on the batched path: every query's result equals its
    standalone filtered ivf_exact_topk run (and therefore brute force
    over the filtered set)."""
    from mongo_es_spark.operators.similarity import (
        ivf_exact_batch_topk,
        ivf_exact_topk,
    )

    rows = _arc_rows(
        [i * 0.5 for i in range(20)]
        + [120 + i * 0.5 for i in range(20)]
        + [240 + i * 0.5 for i in range(20)]
    )
    path = str(tmp_path / "ivf")
    _mk_index(spark, rows, path, n_cells=3)
    allowed = [0, 1, 2] + list(range(20, 60))  # near cell almost empty
    allow = spark.createDataFrame(
        [(i,) for i in allowed], "vec_id long"
    )
    queries = [
        (100, [1.0, 0.0]),
        (101, [math.cos(math.radians(125)), math.sin(math.radians(125))]),
    ]
    got = [
        (r["q_id"], r["vec_id"], r["score"])
        for r in ivf_exact_batch_topk(
            spark, path, queries, "vec_id", k=7, allow_ids=allow
        ).collect()
    ]
    want = []
    for q_id, qv in queries:
        want += [
            (q_id, r["vec_id"], r["score"])
            for r in ivf_exact_topk(
                spark, path, qv, "vec_id", k=7, allow_ids=allow
            ).collect()
        ]
    assert got == want and len(got) == 14


def test_missing_centroids_raises_native_error(spark, tmp_path):
    """A missing/partially-created store surfaces the native
    AnalysisException (PATH_NOT_FOUND), not a RecursionError — the
    r12 cached-reader rewrite accidentally made the miss branch
    self-recursive."""
    from pyspark.errors import AnalysisException

    from mongo_es_spark.operators.similarity import _ivf_centroid_rows

    with pytest.raises(AnalysisException):
        _ivf_centroid_rows(spark, str(tmp_path / "no_such_store"))
