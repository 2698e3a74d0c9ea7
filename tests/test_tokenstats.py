"""The store-level document-frequency rollup (``tokenstats``) behind
``significant_terms_over_store``: folds append mergeable deltas, the
reader trusts the rollup only when its summed doc count matches the
live docstats count AND the store is not CDC-mutated, and
``compact_bm25_store`` rebuilds it.  Every path is pinned to produce
results IDENTICAL to the exact postings-wide background aggregate —
the rollup is a plan optimization, never a semantics change.

Also pins the params-resident generation counter: CDC folds allocate
monotonically without scanning docstats, compaction preserves the
counter, and post-compaction folds keep allocating above surviving
generations.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import shutil

import pytest

from pyspark.sql import functions as F

DOCS = [
    (1, "spark streams tables", "en"),
    (2, "spark spark batch", "en"),
    (3, "tables and rows", "fr"),
    (4, "stream of values", "en"),
    (5, "spark rows batch", "fr"),
    (6, "values values tables", "en"),
]
SCHEMA = "doc_id long, text string, lang string"
CDC_SCHEMA = "doc_id long, op string, text string, lang string"


def _fold(spark, store, rows):
    from mongo_es_spark.operators.text import incremental_bm25_index

    incremental_bm25_index(
        spark,
        spark.createDataFrame(rows, SCHEMA),
        store,
        field_cols=["lang"],
    ).count()


def _sig(spark, store):
    from mongo_es_spark.operators.text import (
        significant_terms_over_store,
    )

    return significant_terms_over_store(
        spark, store, ["spark"], size=10
    )


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _postings_scans(plan: str) -> int:
    return len(re.findall(r"Location.*postings", plan))


def test_rollup_serves_and_matches_exact_background(spark, tmp_path):
    store = str(tmp_path / "bm25")
    _fold(spark, store, DOCS[:3])
    _fold(spark, store, DOCS[3:])

    trusted = _sig(spark, store)
    plan = _plan_of(trusted)
    # bg leg reads the rollup, not the postings: only the two
    # foreground postings scans (matched + fg) remain
    assert "tokenstats" in plan
    assert _postings_scans(plan) == 2
    got = sorted(map(tuple, trusted.collect()))

    # force the exact fallback by removing the rollup entirely
    shutil.rmtree(os.path.join(store, "tokenstats"))
    fallback = _sig(spark, store)
    fplan = _plan_of(fallback)
    assert "tokenstats" not in fplan
    assert _postings_scans(fplan) == 3
    assert got == sorted(map(tuple, fallback.collect()))
    assert len(got) > 0


def test_missed_delta_detected_and_falls_back(spark, tmp_path):
    store = str(tmp_path / "bm25")
    _fold(spark, store, DOCS[:3])
    want = sorted(map(tuple, _sig(spark, store).collect()))

    # simulate a crash between the docstats commit and the rollup
    # append: the second fold lands everywhere except tokenstats
    ts = os.path.join(store, "tokenstats")
    before = set(os.listdir(ts))
    _fold(spark, store, DOCS[3:])
    for f in set(os.listdir(ts)) - before:
        p = os.path.join(ts, f)
        (os.remove if os.path.isfile(p) else shutil.rmtree)(p)

    broken = _sig(spark, store)
    # doc-count verification fails -> exact postings-wide background
    assert _postings_scans(_plan_of(broken)) == 3
    shutil.rmtree(ts)
    exact = sorted(map(tuple, _sig(spark, store).collect()))
    assert sorted(map(tuple, broken.collect())) == exact
    assert exact != want  # the second fold did change the stats


def test_cdc_mutation_distrusts_rollup_until_compact(spark, tmp_path):
    from mongo_es_spark.operators.text import (
        apply_cdc_to_bm25_index,
        compact_bm25_store,
    )

    store = str(tmp_path / "bm25")
    rebuilt = str(tmp_path / "rebuilt")
    _fold(spark, store, DOCS)
    apply_cdc_to_bm25_index(
        spark,
        spark.createDataFrame(
            [
                (2, "u", "updated spark tables", "en"),
                (3, "d", None, None),
                (7, "i", "fresh spark doc", "de"),
            ],
            CDC_SCHEMA,
        ),
        store,
        field_cols=["lang"],
    ).count()
    final = [
        (1, "spark streams tables", "en"),
        (2, "updated spark tables", "en"),
        (4, "stream of values", "en"),
        (5, "spark rows batch", "fr"),
        (6, "values values tables", "en"),
        (7, "fresh spark doc", "de"),
    ]
    _fold(spark, rebuilt, final)

    mutated = _sig(spark, store)
    # mutated flag set -> rollup ignored, exact fallback serves
    assert _postings_scans(_plan_of(mutated)) == 3
    want = sorted(map(tuple, _sig(spark, rebuilt).collect()))
    assert sorted(map(tuple, mutated.collect())) == want

    compact_bm25_store(spark, store, min_files=2)
    served = _sig(spark, store)
    # compaction rebuilt the rollup and reset the flag -> trusted
    plan = _plan_of(served)
    assert "tokenstats" in plan and _postings_scans(plan) == 2
    assert sorted(map(tuple, served.collect())) == want


def test_gen_counter_lives_in_params(spark, tmp_path):
    from mongo_es_spark.operators.text import (
        _bm_params_path,
        apply_cdc_to_bm25_index,
        compact_bm25_store,
    )

    store = str(tmp_path / "bm25")
    _fold(spark, store, DOCS)

    def params():
        return spark.read.parquet(_bm_params_path(store)).head()

    assert params()["gen"] == 0
    out1 = apply_cdc_to_bm25_index(
        spark,
        spark.createDataFrame(
            [(2, "u", "updated spark tables", "en")], CDC_SCHEMA
        ),
        store,
        field_cols=["lang"],
    )
    assert [r["gen"] for r in out1.collect()] == [1]
    assert params()["gen"] == 1 and params()["mutated"]

    compact_bm25_store(spark, store, min_files=2)
    # counter survives compaction (surviving rows keep their gens)
    assert params()["gen"] == 1 and not params()["mutated"]

    out2 = apply_cdc_to_bm25_index(
        spark,
        spark.createDataFrame([(2, "d", None, None)], CDC_SCHEMA),
        store,
        field_cols=["lang"],
    )
    # allocates ABOVE the surviving generation, no docstats scan needed
    assert [r["gen"] for r in out2.collect()] == [2]


def test_duplicate_ids_without_seq_still_raise(spark, tmp_path):
    from mongo_es_spark.operators.text import apply_cdc_to_bm25_index

    store = str(tmp_path / "bm25")
    _fold(spark, store, DOCS)
    with pytest.raises(ValueError, match="duplicate doc ids"):
        apply_cdc_to_bm25_index(
            spark,
            spark.createDataFrame(
                [
                    (2, "u", "one version", "en"),
                    (2, "u", "another version", "en"),
                ],
                CDC_SCHEMA,
            ),
            store,
            field_cols=["lang"],
        )
