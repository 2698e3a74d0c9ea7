"""Plan contracts: assertions over the FORMATTED physical plans that
pin the performance claims made in operator docstrings — filter
pushdown reaching the scan, shuffle counts, top-k pruning, and the
absence of accidental broadcasts/cartesians.  A refactor that keeps
results correct but regresses the plan shape fails here, not in a
benchmark three rounds later."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from mongo_es_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    # count Exchange operators, excluding broadcast exchanges (counted
    # separately — a broadcast is deliberate smallness, not a shuffle)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_scan_resume_pushes_filter_and_prunes_columns(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["scan_resume"](spark, SF))
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual", plan)
    # projection pruning: the scan must not read the unmapped comment
    # column
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "c_comment" not in m.group(1)
    assert n_exchanges(plan) == 0  # scan+map is shuffle-free


def test_dedup_exact_is_one_shuffle(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["dedup_exact"](spark, SF))
    assert n_exchanges(plan) == 1
    assert "HashAggregate" in plan  # partial+final agg, not sort-agg


def test_text_repetition_is_shuffle_free(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_repetition"](spark, SF))
    assert n_exchanges(plan) == 0
    assert "BroadcastExchange" not in plan
    # exactly one kernel pass (formatted output lists each node twice:
    # tree line + detail header; count detail headers)
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1


def test_knn_graph_prunes_topk_before_final_exchange(spark):
    from mongo_es_spark.operators.similarity import knn_graph

    emb = load_table(spark, SF, "embeddings")
    plan = plan_of(knn_graph(emb, "vec_id", "embedding", k=5))
    # map-side rank prune: WindowGroupLimit appears both before and
    # after the id exchange (partial + final)
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", plan)) == 2
    # the vector set must never be broadcast
    assert "BroadcastExchange" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lookup_join_broadcasts_the_small_side_only(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["lookup_join"](spark, SF))
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1
    assert "SortMergeJoin" not in plan
    assert n_exchanges(plan) == 0  # broadcast join: no shuffle at all


def test_sessionize_reuses_one_partitioning(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["events_sessionize"](spark, SF))
    # lag window + running-sum window + groupBy all share the
    # user_id hash partitioning: exactly one exchange
    assert n_exchanges(plan) == 1


def test_compaction_is_one_exchange(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["cdc_compaction"](spark, SF))
    assert n_exchanges(plan) == 1


@pytest.mark.parametrize(
    "name",
    [
        "similarity_topk",
        "text_domain_mix",
        "text_contamination",
        "dedup_cross_corpus",
        "search_hybrid_rrf",
        "dedup_cross_semantic",
        "pipeline_decontaminate",
        "similarity_hard_negatives",
    ],
)
def test_no_cartesian_products(spark, name):
    import __spark_entry__ as e

    plan = plan_of(e.queries()[name](spark, SF))
    # nested-loop joins are tolerated only in their BROADCAST form
    # (single-row query vector / totals row / model-sized rate table);
    # a shuffle cartesian of corpus-sized inputs must never appear
    assert "CartesianProduct" not in plan


def test_cross_corpus_benchmark_side_broadcasts(spark):
    """The decontamination candidate join must build on the benchmark
    side as a broadcast (the train corpus is the 100 TB side and must
    not shuffle for candidate generation)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["dedup_cross_corpus"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cross_semantic_benchmark_side_broadcasts(spark):
    """Same contract for the embedding edition: the benchmark side's
    band and vector frames broadcast; the train corpus never shuffles
    for candidate generation."""
    from pyspark.sql import functions as F

    from mongo_es_spark.operators.dedup import cross_embedding_pairs

    emb = load_table(spark, SF, "embeddings")
    out = cross_embedding_pairs(
        emb.filter(F.col("vec_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
        "vec_id",
        "embedding",
        dims=64,
        threshold=0.45,
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_shuffle_no_range_join(spark):
    """The union+window as-of formulation: one exchange on the key,
    never a BroadcastNestedLoopJoin (what a naive range-condition
    as-of degenerates to)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["events_asof_join"](spark, SF))
    assert n_exchanges(plan) == 1
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_window_join_is_equi_join_not_nested_loop(spark):
    """Bucketizing the |dt| <= W predicate must yield a shuffled
    equi-join; the raw inequality would plan as a nested-loop
    broadcast of one whole side."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["events_window_join"](spark, SF))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_scd2_is_single_shuffle(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["cdc_scd2"](spark, SF))
    assert n_exchanges(plan) == 1


def test_snapshot_pushes_raw_ts_filter(spark):
    """Point-in-time snapshot must prune at the scan: the raw-ts
    predicate reaches PushedFilters (row-group pruning at 100 TB of
    oplog), on top of the usual single compaction shuffle."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["cdc_snapshot_at"](spark, SF))
    assert re.search(r"PushedFilters: \[[^\]]*LessThanOrEqual\(ts", plan)
    assert n_exchanges(plan) == 1


def test_span_dedup_no_broadcast_of_corpus(spark):
    """Span dedup shuffles span keys, never broadcasts or
    nested-loops corpus-sized frames."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_span_dedup"](spark, SF))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert n_exchanges(plan) <= 4


def test_source_cap_is_single_shuffle(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_source_cap"](spark, SF))
    assert n_exchanges(plan) == 1


def test_text_scrub_is_shuffle_free_codegen(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_scrub"](spark, SF))
    assert n_exchanges(plan) == 0
    # no Python workers anywhere: the scrub is pure JVM regexp
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "codegen id" in plan


def test_importance_sample_takeordered_no_global_window(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_importance_sample"](spark, SF))
    # top-k must be TakeOrdered (partial per-partition heaps), never a
    # single-partition sort or window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_weighted_sample_takeordered_no_shuffle(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_sample_weighted"](spark, SF))
    # the A-ES top-k must stay a bounded-heap TakeOrdered over one
    # scan: no exchange, no window, no single-partition sort
    assert "TakeOrderedAndProject" in plan
    assert n_exchanges(plan) == 0
    assert "Window" not in plan


def test_token_budget_sample_group_partitioned(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_token_budget_sample"](spark, SF))
    # the running sum is one window per GROUP key — never a global
    # single-partition sort
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_stays_key_partitioned(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["events_funnel"](spark, SF))
    assert "SinglePartition" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_retention_no_global_ops(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["events_retention"](spark, SF))
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_pairs_share_cluster_shuffle(spark):
    from mongo_es_spark.operators.similarity import semantic_dedup_frames

    emb = load_table(spark, SF, "embeddings")
    _per_doc, pairs = semantic_dedup_frames(
        emb, "vec_id", "embedding", n_clusters=4, threshold=0.45
    )
    plan = plan_of(pairs)
    # the cell self-join must be a merge join on the shared cluster
    # shuffle — never a broadcast of the full vector set
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_shuffle_no_single_partition_ranking(spark):
    """The global shuffle position must come from the bucketed
    two-pass prefix sum — never a SinglePartition Exchange feeding one
    giant window (the classic row_number-over-everything trap)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_corpus_shuffle"](spark, SF))
    assert "SinglePartition" not in plan
    assert "Window" in plan  # ranking runs, but inside buckets


def test_unigram_xent_bounded_shuffles(spark):
    """Vocab agg + token join + doc agg: the whole signal fits in a
    handful of exchanges, total broadcast-joined (one row), no
    nested-loop anywhere.  The clone-collapse adds one distinct-text
    aggregation + the null-safe join-back (exchange 7) — the
    deliberate trade that makes token work scale with distinct
    content instead of raw corpus size."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_unigram_xent"](spark, SF))
    assert "CartesianProduct" not in plan
    assert n_exchanges(plan) <= 7


def test_weighted_pairs_no_cartesian(spark):
    """The bounded clone contract stays an equi-join plan — no
    cartesian/nested-loop even though it aggregates group sizes."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["dedup_pairs_weighted"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_corpus_overlap_is_equijoin_shaped(spark):
    """The source-pair overlap is a posting-list equi-join (merge
    join on the shingle), never a cartesian over group pairs; the
    identical self-join sides share their shuffle at runtime via AQE
    ReusedExchange (not visible in the static plan)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_corpus_overlap"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_has_zero_exchanges(spark):
    """Bucketed + sorted layout: the per-order rollup join must run
    with NO Exchange anywhere — distribution comes from the bucketed
    scan, order from the in-bucket sort (pay-the-shuffle-once)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["bucketed_colocated_join"](spark, SF))
    assert n_exchanges(plan) == 0
    assert "SortMergeJoin" in plan


def test_salted_join_spreads_hot_keys(spark):
    """The salted join must shuffle on (key, salt) — the salt column
    appears in the join keys, so a hot key's rows split across
    n_salts partitions instead of one straggler task."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["salted_skew_join"](spark, SF))
    assert "SortMergeJoin" in plan
    assert "__salt" in plan
    assert "CartesianProduct" not in plan


def test_table_profile_is_single_pass(spark):
    """All column statistics must come from ONE table scan (the
    multi-distinct compiles to a single Expand + aggregate), never a
    scan per statistic."""
    import re

    import __spark_entry__ as e

    plan = plan_of(e.queries()["table_profile"](spark, SF))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan


def test_frequent_tokens_merges_sketch_rows_only(spark):
    """The heavy-hitters merge plan must operate on the MATERIALIZED
    per-partition summaries (partitions x (k+1) rows, the checkpointed
    RDD scan), never re-explode the token stream: no Generate, total
    joined as a broadcast one-row frame, top-k via TakeOrdered."""
    from mongo_es_spark.operators.text import frequent_tokens
    from mongo_es_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_of(frequent_tokens(docs, "text", k=16, top=5))
    assert "Scan ExistingRDD" in plan  # the materialized sketch
    assert "Generate" not in plan      # tokens never re-exploded
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan  # the one-row error total


def test_quality_classify_single_scan_one_exchange(spark):
    """Scoring is a codegen'd explode + partial aggregation: the
    corpus side must show exactly one aggregate exchange (one
    partially-aggregated row per doc on the wire) and the scan must
    prune to (doc_id, text).  No BatchEvalPython anywhere — the hash
    arithmetic is all JVM."""
    import __spark_entry__ as e

    from mongo_es_spark.operators.text import quality_classifier

    # a FRESH read is not enough: the cache manager substitutes ANY
    # semantically-equal plan fragment, so a full-table frame cached
    # by another test (test_extensions' documents fixture) replaces
    # this scan with its all-column InMemoryRelation and the pruning
    # contract can't be observed.  Drop cached relations first — the
    # contract is about the operator's own plan.
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(quality_classifier(docs, "doc_id", "text"))
    assert "BatchEvalPython" not in plan
    # pruning: no parquet scan may read the unmapped lang/source cols
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        assert "lang" not in m.group(1)
        assert "source" not in m.group(1)
    # one shuffle for the doc-keyed aggregation; the empty-doc union
    # branch reuses the same scan shape with no exchange of its own
    assert n_exchanges(plan) == 1


def test_substring_dedup_shuffles_hashes_not_window_text(spark):
    """The winner-per-window shuffle must carry the 128-bit hash pair,
    never the window string: the exchange's input attributes include
    h1/h2 and no win column survives past the instance projection."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_substring_dedup"](spark, SF))
    assert "h1" in plan and "h2" in plan
    # the window text column is consumed by the hash projection and
    # must not appear as a shuffle output attribute
    assert not re.search(r"Arguments: hashpartitioning\(win", plan)
    assert "CartesianProduct" not in plan


def test_trailing_features_single_exchange(spark):
    """One user-keyed exchange feeds the RANGE window; no extra
    shuffle, no Python, no cartesian."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["events_trailing_features"](spark, SF))
    assert n_exchanges(plan) == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_transitions_lag_then_tiny_agg(spark):
    """The lag window rides one user-keyed exchange; the transition
    aggregation adds one more (states^2 key space) and nothing else."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["events_transitions"](spark, SF))
    assert n_exchanges(plan) == 2
    assert "CartesianProduct" not in plan


def test_table_quantiles_single_pass(spark):
    """All percentile columns must come from ONE scan + one aggregate
    (no per-column scans, no Expand — percentile needs no distinct)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["table_quantiles"](spark, SF))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_whiten_is_projection_after_model_collect(spark):
    """After the d-row moment collect, the output plan must be a pure
    projection over one scan — no join, no exchange, no Python."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["embedding_whiten"](spark, SF))
    assert n_exchanges(plan) == 0
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_idf_keywords_windowgrouplimit(spark):
    """The per-doc top-k must prune via WindowGroupLimit (rank filter
    pushed into the window), not sort whole documents and filter."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_idf_keywords"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_shuffles_hashes_not_chunk_text(spark):
    """The DF-count groupBy and the membership join must key on the
    two-salt hash pair — chunk text never appears as a shuffle
    partitioning key — and the pair graph stays equi-join (no
    cartesian)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_boilerplate"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert not re.search(r"hashpartitioning\(chunk_text", plan)
    assert re.search(r"hashpartitioning\(__h1", plan)


def test_keep_best_aggregates_without_window(spark):
    """Representative selection is a partial+final max_by aggregation
    per component — no per-cluster Window operator, so a pathological
    clone cluster combines map-side instead of serializing through a
    single window partition."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["dedup_keep_best"](spark, SF))
    # the representative pick itself must not be a window: no window
    # partitioned on the component label (the one Window present is
    # the clone-group min in _text_groups, partitioned on text hash)
    assert not re.search(r"windowspecdefinition\(component", plan)
    assert "max_by" in plan


def test_skew_profile_prunes_to_key_column(spark):
    """The per-key count pass must read ONLY the key column."""
    import __spark_entry__ as e

    spark.catalog.clearCache()
    plan = plan_of(e.queries()["table_skew_profile"](spark, SF))
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        assert "props" not in m.group(1)
        assert "event_type" not in m.group(1)
        assert "value" not in m.group(1)


def test_quality_rank_no_window_broadcast_threshold(spark):
    """Group thresholding must be a broadcast of the |groups|-row
    aggregate, never a percent_rank window over the corpus."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_quality_rank"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_ngram_novelty_no_pair_join(spark):
    """Novelty is the LINEAR inverted-index shape: one shingle DF
    aggregation + one equi-join back — no self-join pair explosion,
    no cartesian."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_ngram_novelty"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # one Generate (the single shingle explode evaluation)
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 2


def test_table_profile_approx_no_expand(spark):
    """The 100 TB profile plan (exact_distinct=False) must compute
    every HLL++ statistic from ONE scan with NO Expand node — the
    Expand multiplication (one replica of every row per distinct
    aggregate) is exactly what the approx path exists to avoid."""
    from mongo_es_spark.operators.profile import table_profile

    li = load_table(spark, SF, "lineitem")
    plan = plan_of(
        table_profile(
            li,
            ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"],
            exact_distinct=False,
        )
    )
    assert "Expand" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # and the exact form genuinely differs: multi-distinct => Expand
    exact_plan = plan_of(
        table_profile(li, ["l_orderkey", "l_suppkey"])
    )
    assert "Expand" in exact_plan


def test_table_quantiles_approx_single_pass_no_buffer_sort(spark):
    """The approx quantile plan must stay one scan + one aggregate —
    approx_percentile's KLL-style state merges map-side; no Sort or
    Expand node anywhere."""
    from mongo_es_spark.operators.profile import table_quantiles_approx

    li = load_table(spark, SF, "lineitem")
    plan = plan_of(
        table_quantiles_approx(li, ["l_quantity", "l_extendedprice"])
    )
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" not in plan and "Sort" not in plan


def test_ann_batch_is_cell_equijoin_with_group_limit(spark):
    """Batch ANN candidates must meet co-grouped by cell (never a
    cartesian of queries x corpus; one hash exchange on cell) and
    the per-query global top-k must run as WindowGroupLimit (rank
    pruning before the final exchange)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["similarity_ann_batch"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    # the probe explode joins on cell
    assert "cell" in plan


def test_layout_zorder_no_shuffle_broadcast_bounds(spark):
    # the DATA path is one scan + project; the only Exchange is the
    # SinglePartition gather of the 4-long bounds row, which then
    # rides a BroadcastExchange back — never a shuffle of the events
    import __spark_entry__ as e

    plan = plan_of(e.queries()["layout_zorder"](spark, SF))
    assert n_exchanges(plan) == 1
    assert "SinglePartition" in plan
    assert "BroadcastExchange" in plan
    assert "hashpartitioning(event_id" not in plan
    assert "CartesianProduct" not in plan


def test_line_dedup_no_window_hash_keyed(spark):
    # winner election must be a hash aggregation on the 128-bit chunk
    # key — never a Window over the occurrence frame, and chunk TEXT
    # must not ride a shuffle as a key
    import __spark_entry__ as e

    plan = plan_of(e.queries()["text_line_dedup"](spark, SF))
    assert "Window" not in plan or "WindowGroupLimit" in plan
    assert "hashpartitioning(__h1" in plan
    assert "hashpartitioning(chunk_text" not in plan


def test_edit_distance_no_levenshtein_before_candidates(spark):
    # the DP must run on rep pairs AFTER the banded candidate join —
    # a plan that evaluates levenshtein inside a cartesian/broadcast
    # of the corpus would be the quadratic mistake
    import __spark_entry__ as e

    plan = plan_of(e.queries()["dedup_edit_distance"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_kmeans_assignment_is_shuffle_free(spark):
    from mongo_es_spark.operators.similarity import kmeans_clusters

    emb = load_table(spark, SF, "embeddings")
    assigned, _C = kmeans_clusters(emb, "vec_id", "embedding", k=4)
    plan = plan_of(assigned)
    assert n_exchanges(plan) == 0
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_hash_embed_prunes_scan_and_bounds_exchanges(spark):
    """hash_embed must read only (doc_id, text) from the parquet scan
    and stay within the documented shuffle budget: explode + one
    conditional-sum hash agg + the clone expand-back join — never a
    token-keyed join (no vocab exchange at all)."""
    from mongo_es_spark.operators.text import hash_embed

    docs = load_table(spark, SF, "documents")
    plan = plan_of(hash_embed(docs, "doc_id", "text", dim=8))
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "lang" not in m.group(1) and "source" not in m.group(1)
    # collapse group + histogram agg + expand-back join keys: the
    # token column itself must never key an Exchange
    assert "hashpartitioning(__tok" not in plan
    assert n_exchanges(plan) <= 4


def test_attribution_single_user_exchange(spark):
    """All three attribution signals ride ONE user-keyed sort: one
    Exchange, one Window, no join anywhere in the plan."""
    from mongo_es_spark.operators.sessions import attribution

    ev = load_table(spark, SF, "events").selectExpr(
        "user_id", "event_id", "ts div 1000000 as ts_ms", "event_type"
    )
    plan = plan_of(
        attribution(
            ev, "user_id", "event_id", "ts_ms", "event_type",
            touch_types=("click", "view"), conversion_type="purchase",
            lookback_ms=3_600_000,
        )
    )
    assert n_exchanges(plan) == 1
    assert "Join" not in plan


def test_perplexity_buckets_no_language_keyed_window(spark):
    """The ranking window must partition by (lang, xent-bin) cells —
    never by the language alone (the single-task skew wall)."""
    from mongo_es_spark.operators.text import perplexity_buckets

    docs = load_table(spark, SF, "documents")
    plan = plan_of(
        perplexity_buckets(docs, "doc_id", "text", "lang", rank_bins=16)
    )
    # every row_number window spec carries the bin column
    specs = re.findall(
        r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan
    )
    assert specs, plan[:500]
    for s in specs:
        assert "__bin" in s, s


def test_bm25_store_query_pushes_token_filter(spark, tmp_path):
    """The postings scan must push the query-term filter into the
    parquet source (row-group pruning at index scale) — a scan that
    reads the whole inverted index for a 3-term query is wrong."""
    from pyspark.sql import functions as F

    from mongo_es_spark.operators.text import (
        bm25_over_store,
        incremental_bm25_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    store = str(tmp_path / "bm")
    incremental_bm25_index(spark, docs, store)
    plan = plan_of(
        bm25_over_store(spark, store, ["spark", "table", "stream"])
    )
    assert re.search(r"PushedFilters: \[.*In\(token", plan)
    assert "CartesianProduct" not in plan


@pytest.fixture(scope="module")
def api_plan_store(spark, tmp_path_factory):
    from mongo_es_spark.operators.text import incremental_bm25_index

    store = str(tmp_path_factory.mktemp("apiplan") / "bm")
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    incremental_bm25_index(
        spark, docs, store, field_cols=["lang", "n_chars"]
    )
    return store


def test_searchapi_scoring_reads_checkpoint_not_index(
    spark, api_plan_store
):
    """The _search executor scans the postings index ONCE (the shared
    weight frame's eager checkpoint); every scoring clause then reads
    the materialized blocks — a 3-clause bool whose plan re-scans
    postings per leaf is wrong."""
    from mongo_es_spark.operators.searchapi import search

    plan = plan_of(search(spark, api_plan_store, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark stream"}}],
            "should": [{"term": {"text": "table"}}],
            "must_not": [{"term": {"text": "value"}}],
        }},
    }))
    assert "CartesianProduct" not in plan
    # scoring side: zero postings scans in the final plan — the
    # weight frame was checkpointed at build time
    assert not re.search(r"Location.*/postings", plan)


def test_searchapi_constant_leaf_pushes_token_filter(
    spark, api_plan_store
):
    from mongo_es_spark.operators.searchapi import search

    plan = plan_of(search(spark, api_plan_store, {
        "query": {"prefix": {"text": "spar"}},
    }))
    assert re.search(
        r"PushedFilters: \[.*(In|EqualTo)\(token", plan
    )


def test_nested_query_no_explode(spark, tmp_path):
    """The nested per-element predicate is a higher-order filter over
    the stored array — a Generate (explode) in the plan means the
    array was flattened, per-doc work amplified by array size."""
    from pyspark.sql import functions as F

    from mongo_es_spark.operators.nested import nested_query_over_store
    from mongo_es_spark.operators.text import incremental_bm25_index

    store = str(tmp_path / "bm")
    df = spark.createDataFrame(
        [("d1", "alpha", [(1.0, "R")])],
        "doc_id string, text string, "
        "items array<struct<qty:double,rflag:string>>",
    )
    incremental_bm25_index(spark, df, store, field_cols=["items"])
    plan = plan_of(nested_query_over_store(
        spark, store, ["alpha"], "items", [("qty", "gte", 1.0)]
    ))
    assert "Generate" not in plan  # no explode
    assert re.search(
        r"PushedFilters: \[.*(In|EqualTo)\(token", plan
    )


def test_has_parent_broadcasts_parent_ids(spark, tmp_path):
    from mongo_es_spark.operators.nested import has_parent_over_store
    from mongo_es_spark.operators.text import incremental_bm25_index

    store = str(tmp_path / "bm")
    df = spark.createDataFrame(
        [("P1", "order urgent", "parent", None, 1.0),
         ("C1", "line rf_R", "child", "P1", 2.0)],
        "doc_id string, text string, join_name string, "
        "parent_id string, price double",
    )
    incremental_bm25_index(
        spark, df, store,
        field_cols=["join_name", "parent_id", "price"],
    )
    plan = plan_of(has_parent_over_store(spark, store, ["urgent"]))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_bloom_prefilter_is_codegen_below_the_join(spark):
    """contamination_bloom's membership test must sit in a Filter
    BELOW the exact join (map-side bit arithmetic over the array
    literal), so the join input is the survivor set, not every
    corpus gram."""
    from pyspark.sql import functions as F

    from mongo_es_spark.operators.text import contamination_bloom

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 89 == 0)
    plan = plan_of(
        contamination_bloom(docs, "doc_id", "text", bench, n=5)
    )
    assert "shiftright" in plan  # the bit test survived into codegen
    assert "CartesianProduct" not in plan


def test_search_after_page_stays_takeordered(spark, tmp_path):
    """Cursor paging pushes the strictly-after predicate BELOW the
    top-k: page 2 is one TakeOrderedAndProject like page 1, never a
    global sort + skip."""
    from mongo_es_spark.operators.searchapi import search
    from mongo_es_spark.operators.text import incremental_bm25_index

    store = str(tmp_path / "sa")
    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 else "alpha gamma") for i in range(40)],
        "doc_id long, text string",
    )
    incremental_bm25_index(spark, df, store).count()
    page2 = search(spark, store, {
        "query": {"match": {"text": "alpha"}},
        "size": 5,
        "search_after": [0.5, 10],
    })
    plan = plan_of(page2)
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan  # no sort-then-skip shape


def test_count_api_reads_cached_weight_frame(spark, tmp_path):
    """_count's final job aggregates the compile-time-materialized
    weight frame: ZERO postings file scans in the count plan (the one
    token-pruned scan happened at localCheckpoint time), and no
    global sort/top-k machinery."""
    from mongo_es_spark.operators.searchapi import count_api
    from mongo_es_spark.operators.text import incremental_bm25_index

    store = str(tmp_path / "cnt")
    df = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)],
        "doc_id long, text string",
    )
    incremental_bm25_index(spark, df, store).count()
    plan = plan_of(count_api(spark, store, {
        "query": {"match": {"text": "alpha"}},
    }))
    assert len(re.findall(r"Location.*/postings", plan)) == 0
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan \
        or "Scan ExistingRDD".lower() in plan.lower()
    assert "TakeOrderedAndProject" not in plan
    assert "Sort " not in plan
