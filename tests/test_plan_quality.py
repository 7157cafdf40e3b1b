"""Physical-plan quality gates: the scale-relevant plan properties the
engine promises (predicate pushdown into the parquet scan, column pruning,
broadcast joins for small dims, partial aggregation, top-k via
TakeOrderedAndProject, whole-stage codegen) asserted against
``explain("formatted")`` output so a regression that silently de-optimizes
a plan fails CI — correctness tests alone would never catch it."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fictional_guacamole_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


class TestPushdownAndPruning:
    def test_q1_filter_pushed_to_scan(self, spark):
        plan = plan_of(spark, "q1_pricing_summary")
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
            in plan

    def test_q1_reads_only_needed_columns(self, spark):
        plan = plan_of(spark, "q1_pricing_summary")
        read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
        # 7 needed columns, and specifically not the unused join keys
        assert "l_orderkey" not in read_schema
        assert "l_partkey" not in read_schema
        assert "l_quantity" in read_schema

    def test_q6_selective_filters_pushed(self, spark):
        plan = plan_of(spark, "q6_forecast_revenue")
        assert "GreaterThanOrEqual(l_shipdate" in plan
        assert "LessThan(l_quantity,24.0)" in plan


class TestJoinStrategies:
    @pytest.mark.parametrize("name", ["q3_shipping_priority",
                                      "q5_region_revenue"])
    def test_dims_broadcast(self, spark, name):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan

    def test_semi_join_physical(self, spark):
        plan = plan_of(spark, "join_semi_active_customers")
        assert "LeftSemi" in plan

    def test_nonequi_is_not_cartesian(self, spark):
        # equi key + range predicate must hash-join on the key, never BNLJ
        plan = plan_of(spark, "join_nonequi_funnel")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_keyless_interval_join_is_not_nested_loop(self, spark):
        # the whole point of the bucketized interval join: a key-less
        # range predicate must run as an equi hash join on the time
        # bucket, never BNLJ/Cartesian (contrast join_pure_theta, which
        # deliberately exercises the BNLJ fallback rule)
        plan = plan_of(spark, "join_interval_bucketed")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Join" in plan  # it IS a join, on the bucket key

    def test_correlated_exists_becomes_semi_join(self, spark):
        # Catalyst must decorrelate EXISTS into a semi join — a per-row
        # subquery execution would be O(n²) at scale
        plan = plan_of(spark, "q4_late_shipment_orders")
        assert "LeftSemi" in plan

    def test_capstone_pipeline_no_cartesian(self, spark):
        plan = plan_of(spark, "pipeline_training_corpus")
        assert "CartesianProduct" not in plan


class TestTpchFullPlans:
    """Plan gates for the fixture-adapted TPC-H completion set
    (plans/tpch_full.py) — the shapes each query exists to exercise."""

    def test_q21_decorrelates_both_subqueries(self, spark):
        # EXISTS → LeftSemi, NOT EXISTS → LeftAnti; no per-row subplans
        plan = plan_of(spark, "q21_waiting_suppliers")
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan

    def test_q8_seven_way_join_broadcasts_dims(self, spark):
        plan = plan_of(spark, "q8_nation_market_share")
        # customer/supplier/region and both nation aliases broadcast: the
        # only shuffle joins are between facts
        assert plan.count("BroadcastHashJoin") >= 5
        assert "CartesianProduct" not in plan

    def test_q16_not_in_is_anti_join(self, spark):
        plan = plan_of(spark, "q16_supplier_part_variety")
        assert "LeftAnti" in plan

    def test_q20_nested_chain_is_semi_joins(self, spark):
        plan = plan_of(spark, "q20_excess_shippers")
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    @pytest.mark.parametrize("name", ["q2_min_cost_supplier",
                                      "q9_product_type_profit",
                                      "q17_small_quantity_revenue"])
    def test_correlated_rewrites_avoid_cartesian(self, spark, name):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q13_filter_stays_in_join_condition(self, spark):
        # the o_orderpriority filter must NOT reach the post-join WHERE —
        # it belongs to the LEFT JOIN condition (zero-order customers with
        # count 0 must survive); a pushed filter on the probe side is fine
        from fictional_guacamole_spark.tables import load_table
        df = REGISTRY["q13_order_count_distribution"].builder(spark, SF)
        total_custs = load_table(spark, SF, "customer").count()
        counted = df.agg(F.sum("custdist")).collect()[0][0]
        assert counted == total_custs  # every customer lands in a bucket


class TestAggAndTopK:
    def test_partial_aggregation_present(self, spark):
        # map-side partial agg halves shuffle volume on every groupBy
        plan = plan_of(spark, "q1_pricing_summary")
        assert "partial_" in plan.lower() or "HashAggregate" in plan

    def test_global_topk_avoids_full_sort(self, spark):
        plan = plan_of(spark, "topk_global_orders")
        assert "TakeOrderedAndProject" in plan

    def test_q1_whole_stage_codegen(self, spark):
        # under AQE the codegen stages only exist in the *executed* plan —
        # run the query, then assert the final plan compiled to codegen
        df = REGISTRY["q1_pricing_summary"].builder(spark, SF)
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed
        # "*(n)" prefixes mark WholeStageCodegen stages in the final plan
        assert "*(1)" in executed and "*(2)" in executed
        # AQE coalesced the tiny test shuffles — the runtime re-plan works
        assert "AQEShuffleRead" in executed


class TestKernelDistribution:
    def test_book_kernel_partitions_by_product(self, spark):
        plan = plan_of(spark, "t2_book_kernel_gaps")
        # the stateful kernel must hash-partition on the group key —
        # that's what lets book state scale across executors
        assert "hashpartitioning(product_id" in plan


class TestPartitionedWrites:
    def test_partition_pruning_on_partitioned_dataset(self, spark, tmp_path):
        """The 100 TB layout story: datasets written partitioned by a
        coarse key must prune partitions at read time (the scan lists only
        matching directories — at scale this is the difference between
        reading 100 TB and reading one partition)."""
        from fictional_guacamole_spark.tables import load_table
        li = load_table(spark, SF, "lineitem")
        p = str(tmp_path / "li_part")
        li.write.partitionBy("l_returnflag").parquet(p)
        back = spark.read.parquet(p).filter(F.col("l_returnflag") == "R")
        plan = back._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        assert "PartitionFilters" in plan
        assert "l_returnflag" in plan.split("PartitionFilters", 1)[1][:200]
        n_r = li.filter(F.col("l_returnflag") == "R").count()
        assert back.count() == n_r


class TestNoDriverCollect:
    @pytest.mark.parametrize("name", sorted(REGISTRY))
    def test_builders_do_not_collect(self, spark, name):
        """Building any query must be pure plan construction — no action,
        no driver-side materialization (collect in a builder would mean
        the operator isn't distributed)."""
        df = REGISTRY[name].builder(spark, SF)
        assert df is not None and df.columns


class TestBucketedLayout:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        """The fact⋈fact layout story: two tables written with the same
        bucket spec must sort-merge-join with NO Exchange on either side —
        the write-once shuffle replaces the per-query shuffle (at 100 TB,
        the single biggest recurring cost in the orders⋈lineitem family).
        Broadcast is disabled so the test exercises the SMJ path that
        matters when neither side is small."""
        from fictional_guacamole_spark.operators.bucketing import (
            bucketed_join, write_bucketed)
        from fictional_guacamole_spark.tables import load_table

        orders = load_table(spark, SF, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice")
        li = load_table(spark, SF, "lineitem").select(
            "l_orderkey", "l_quantity")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            write_bucketed(orders, "b_orders", "o_orderkey", 8)
            write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                           "b_lineitem", "o_orderkey", 8)
            joined = bucketed_join(spark, "b_orders", "b_lineitem",
                                   "o_orderkey")
            plan = joined._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and it is not just a pretty plan — the join is correct
            expected = orders.join(
                li.withColumnRenamed("l_orderkey", "o_orderkey"),
                "o_orderkey").count()
            assert joined.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")

    def test_mismatched_bucket_counts_still_correct(self, spark):
        """Guard the semantics note in operators/bucketing.py: bucket
        specs are an optimization, never a correctness dependency."""
        from fictional_guacamole_spark.operators.bucketing import (
            write_bucketed)
        from fictional_guacamole_spark.tables import load_table
        nation = load_table(spark, SF, "nation")
        try:
            write_bucketed(nation, "b_nation_4", "n_nationkey", 4)
            write_bucketed(nation.select("n_nationkey", "n_name"),
                           "b_nation_2", "n_nationkey", 2)
            j = (spark.table("b_nation_4").select("n_nationkey")
                 .join(spark.table("b_nation_2"), "n_nationkey"))
            assert j.count() == nation.count()
        finally:
            spark.sql("DROP TABLE IF EXISTS b_nation_4")
            spark.sql("DROP TABLE IF EXISTS b_nation_2")


class TestRound6OperatorPlans:
    @staticmethod
    def _n_exchanges(plan: str) -> int:
        import re
        # formatted explain prints each operator once in the tree and once
        # as a "(n) Exchange" detail header — count the detail headers
        return len(re.findall(r"\(\d+\) Exchange", plan))

    @pytest.mark.parametrize("name", ["text_pii_redact", "text_c4_quality"])
    def test_scan_speed_gates_are_shuffle_free(self, spark, name):
        """The compliance/cleaning gates must run at scan speed: a single
        projection over the parquet scan; the only allowed Exchange is the
        final presentation orderBy's range partitioning."""
        plan = plan_of(spark, name)
        assert self._n_exchanges(plan) <= 1, plan
        assert "rangepartitioning" in plan  # i.e. the one is the sort

    def test_tfidf_broadcasts_corpus_count(self, spark):
        """N joins in as a 1-row broadcast, never a shuffled cross."""
        plan = plan_of(spark, "text_tfidf_topk")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan

    def test_line_dedup_no_cartesian(self, spark):
        plan = plan_of(spark, "dedup_lines_global")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_sqlite_roundtrip_builder_bounded(self, spark):
        """The round-trip query's read-back side must stay a 4-task
        mapInPandas scan (no collect of the table into the driver)."""
        df = REGISTRY["sqlite_roundtrip_user_stats"].builder(spark, SF)
        assert df.rdd.getNumPartitions() <= 4


class TestSecondWaveRound6Plans:
    """Scale gates for the time-series / chunking / ORC operators."""

    @staticmethod
    def _n_exchanges(plan: str) -> int:
        import re
        return len(re.findall(r"\(\d+\) Exchange", plan))

    def test_chunking_is_map_only(self, spark):
        """sequence→explode→substring must add ZERO data shuffles; the one
        allowed Exchange is the presentation orderBy's range partitioning."""
        plan = plan_of(spark, "pipeline_chunk_overlap")
        assert self._n_exchanges(plan) <= 1, plan
        assert "rangepartitioning" in plan

    def test_orc_readback_pushes_the_predicate(self, spark):
        """The judged cycle only certifies ORC *values*; this pins that the
        read-back filter reaches the ORC scan instead of running post-scan
        over all row groups."""
        plan = plan_of(spark, "orc_roundtrip_brand_stats")
        assert "Scan orc" in plan
        assert "LessThanOrEqual(p_size,25)" in plan, plan

    def test_gapfill_join_is_keyed(self, spark):
        """Grid ⋈ aggregates must be an equi-join on (key, bucket) — a
        nested-loop here would be O(grid × buckets) at scale."""
        plan = plan_of(spark, "ts_gapfill_locf")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ewma_shuffles_only_on_key(self, spark):
        """row_number window + groupBy share the user_id hash partitioning
        (subset-satisfies-clustering), so the whole EWMA costs ONE data
        shuffle plus the presentation sort."""
        plan = plan_of(spark, "agg_ewma_user_value")
        assert self._n_exchanges(plan) <= 2, plan
        assert "CartesianProduct" not in plan

    @pytest.mark.parametrize("name", ["multimodal_wav_decode",
                                      "multimodal_bmp_decode",
                                      "multimodal_avi_frame_sample"])
    def test_real_codec_queries_are_map_only(self, spark, name):
        """encode → (resize →) decode is chained mapInPandas: zero data
        shuffles; the single allowed Exchange is the presentation sort."""
        plan = plan_of(spark, name)
        assert self._n_exchanges(plan) <= 1, plan
        assert "rangepartitioning" in plan


class TestIvfPartitionedLayout:
    """SCALE.md's IVF claim made executable: the assigned corpus written
    partitioned by cell id IS the inverted-file list structure, and a
    probe becomes a partition-pruned read of n_probe/n_centroids of
    storage — asserted on the plan, and the pruned probe returns exactly
    the rows of the probed cells."""

    def test_probe_is_partition_pruned_and_complete(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from fictional_guacamole_spark.functions import similarity as S
        from fictional_guacamole_spark.tables import load_table

        emb = load_table(spark, SF, "embeddings")
        centroids = S.train_ivf_centroids(emb, n_centroids=8,
                                          vec_col="embedding", seed=4)
        assigned = emb.select(
            "vec_id", "embedding",
            S.nearest_cells(F.col("embedding"), centroids, 1)[0]
            .alias("cid"))
        layout = str(tmp_path / "ivf_cells")
        assigned.write.partitionBy("cid").parquet(layout)

        # probe two cells, the way a query's nearest_cells(n_probe=2)
        # candidate read would
        probe_cells = [1, 5]
        probe = (spark.read.parquet(layout)
                 .filter(F.col("cid").isin(probe_cells)))
        plan = probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "PartitionFilters" in plan
        assert "cid" in plan.split("PartitionFilters", 1)[1][:200], plan

        expect = assigned.filter(F.col("cid").isin(probe_cells)).count()
        got = probe.count()
        assert got == expect and got > 0
        # and the pruned read really skipped the other cells
        assert got < assigned.count()


class TestThirdWaveRound6Plans:
    """Scale gates for the Bloom decontamination + Z-order layout ops."""

    @staticmethod
    def _n_exchanges(plan: str) -> int:
        import re
        return len(re.findall(r"\(\d+\) Exchange", plan))

    def test_bloom_decontaminate_repair_join_broadcasts(self, spark):
        """The exact FP-repair join and the final flag join must both be
        broadcast — the corpus side never sort-merge-shuffles on a string
        key; the Bloom pre-filter itself is an Arrow-batched projection."""
        plan = plan_of(spark, "pipeline_decontaminate_bloom")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "ArrowEvalPython" in plan  # vectorized, never row-at-a-time
        assert "BatchEvalPython" not in plan

    def test_zorder_codes_are_pure_codegen(self, spark):
        """The Morton-code projection must stay JVM-side whole-stage
        codegen with zero data shuffles; the only Exchange is the
        presentation orderBy's range partitioning."""
        plan = plan_of(spark, "layout_zorder_events")
        assert self._n_exchanges(plan) <= 1, plan
        assert "rangepartitioning" in plan
        # a single Project over the scan, nothing in Python, no join/agg
        assert "EvalPython" not in plan
        assert "Join" not in plan and "Aggregate" not in plan

    def test_domain_mix_rates_broadcast(self, spark):
        """The per-source rate table is KB-scale and must broadcast; the
        corpus side is filtered at scan speed, never sort-merge-shuffled
        on the source key."""
        plan = plan_of(spark, "pipeline_domain_mix")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_heavy_hitters_sketch_broadcasts(self, spark):
        """The CMS rows and the 1-row total must broadcast back onto the
        occurrence stream; nothing sort-merge-joins, and no shuffle keys
        on the raw term before the candidate filter."""
        plan = plan_of(spark, "text_heavy_hitters")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


class TestFourthWaveRound6Plans:
    @staticmethod
    def _n_exchanges(plan: str) -> int:
        import re
        return len(re.findall(r"\(\d+\) Exchange", plan))

    def test_random_projection_is_pure_codegen(self, spark):
        """The JL projection must be a single JVM-side projection over the
        scan: no shuffle but the presentation sort, no Python, no joins —
        the whole point is scan-speed reduction."""
        plan = plan_of(spark, "embed_random_projection")
        assert self._n_exchanges(plan) <= 1, plan
        assert "rangepartitioning" in plan
        assert "EvalPython" not in plan
        assert "Join" not in plan

    def test_pq_query_side_broadcasts(self, spark):
        """PQ-ADC scoring joins the corpus codes to the (tiny) query side:
        the query side must broadcast and the corpus must never
        sort-merge-shuffle for the candidate pass."""
        plan = plan_of(spark, "sim_pq_topk")
        assert "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan

    def test_mv_merge_shuffles_only_on_group_key(self, spark):
        """Merge-on-read folds state ∪ partials with hash aggregation on
        the group key — partial aggregation must be present and nothing
        may fall back to Python or a cartesian join."""
        plan = plan_of(spark, "mv_incremental_order_stats")
        assert "partial" in plan.lower()
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_cdc_read_resolves_with_one_window(self, spark):
        """Latest-wins resolution is ONE window over base + deltas keyed
        on the merge key (no self-joins, no cartesian)."""
        plan = plan_of(spark, "merge_upsert_order_stats")
        assert "Window" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_lm_familiarity_joins_on_gram_key(self, spark):
        """LM estimation + scoring must stay equi-join/agg shaped: no
        cartesian, no Python, partial aggregation for the count stages."""
        plan = plan_of(spark, "text_lm_familiarity")
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "EvalPython" not in plan


class TestFederatedPlan:
    def test_three_sources_one_plan_dim_broadcast(self, spark):
        """SQLite scan + commit-log parquet + customer dim compose into
        ONE Catalyst plan: the dim broadcasts, nothing goes cartesian,
        and the SQLite side arrives through the Python DataSource (its
        rows enter as an Arrow/Python scan, never a collect)."""
        plan = plan_of(spark, "federated_tri_source_user_summary")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSixthWaveRound6Plans:
    """Scale gates for the resample / anomaly / graph operators."""

    @staticmethod
    def _n_exchanges(plan: str) -> int:
        import re
        return len(re.findall(r"\(\d+\) Exchange", plan))

    def test_resample_has_no_join_at_all(self, spark):
        """Observations and grid points union into ONE frame bracketed by
        two window passes — the interpolation must compile without any
        join operator (the gapfill sibling needs one; this shape is the
        reason the resample variant exists)."""
        plan = plan_of(spark, "ts_resample_interpolate")
        assert "Join" not in plan, plan
        assert "CartesianProduct" not in plan

    def test_anomaly_is_one_keyed_window(self, spark):
        """Trailing-frame stats + the flag filter ride a single window
        shuffle on the entity key; only the presentation sort may add a
        second Exchange."""
        plan = plan_of(spark, "ts_anomaly_zscore")
        assert self._n_exchanges(plan) <= 2, plan
        assert "Join" not in plan, plan

    def test_pagerank_shuffles_on_node_keys_only(self, spark):
        """Every rank round is an equi-join + groupBy keyed on nodes: no
        CartesianProduct anywhere; the only nested-loop is the deliberate
        broadcast of the 1-row node-count frame onto the node list."""
        plan = plan_of(spark, "graph_pagerank_suppliers")
        assert "CartesianProduct" not in plan, plan
        # the contribution joins are real equi-joins, not cross products
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
            or ("BroadcastHashJoin" in plan), plan


class TestWave6Plans:
    """Scale gates for the retrieval / skipping / bucketed-layout wave."""

    @staticmethod
    def _n_exchanges(plan: str) -> int:
        import re
        return len(re.findall(r"\(\d+\) Exchange", plan))

    def test_inverted_index_has_no_join(self, spark):
        """The index build is two keyed folds — it must compile to
        hash aggregations with no join operator anywhere."""
        plan = plan_of(spark, "index_inverted_postings")
        assert "Join" not in plan, plan
        assert "HashAggregate" in plan

    def test_bm25_term_filter_and_broadcast_stats(self, spark):
        """The query-term filter is the index lookup — it must be applied
        before the df-stats join; the 1-row corpus stats frame must come
        in as a broadcast, and nothing may compile to a shuffled
        cartesian."""
        plan = plan_of(spark, "text_bm25_search")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastExchange" in plan or \
            "BroadcastNestedLoopJoin" in plan
        # term IN (...) reaches the tf build side as a real filter
        assert "spark" in plan and "merge" in plan

    def test_skipping_query_prunes_files_and_pushes_predicate(self, spark):
        """The judged zone-map query must (a) scan FEWER files than the
        full snapshot holds — the log-level skip — and (b) push the exact
        ts predicate into the surviving files' row groups."""
        import datetime
        import glob as _glob
        import hashlib
        import os
        import tempfile

        from fictional_guacamole_spark.sources.txnlog import (
            TransactionalParquetTable)

        # building the judged query materializes the table; reuse its tag
        plan = plan_of(spark, "txnlog_skipping_event_stats")
        assert "PushedFilters" in plan, plan
        assert "GreaterThanOrEqual(ts" in plan, plan
        src = os.path.join(SF, "events.parquet")
        tag = hashlib.md5(
            f"txnskip1:{src}:{os.path.getmtime(src)}".encode()
        ).hexdigest()[:12]
        base = os.path.join(tempfile.gettempdir(), f"fg_txnskip_{tag}")
        t = TransactionalParquetTable(base)
        n_total = len(t.read(spark).inputFiles())
        lo, hi = datetime.datetime(2024, 1, 8), datetime.datetime(2024, 1, 15)
        n_kept = len(t.read_pruned(spark, {"ts": (lo, hi)}).inputFiles())
        assert n_kept < n_total, (n_kept, n_total)

    def test_bucketed_join_query_no_exchange_between_scans_and_join(
            self, spark):
        """The judged bucketed query's join must consume the bucketed
        scans' output partitioning: with broadcast off, a sort-merge join
        with no Exchange below it (the write-time shuffle did the work)."""
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = plan_of(spark, "layout_bucketed_join_revenue")
            assert "SortMergeJoin" in plan, plan
            # allowed Exchanges: partial->final agg + presentation sort;
            # the join inputs themselves must be exchange-free, which
            # bounds the total at 2
            assert self._n_exchanges(plan) <= 2, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestAnalyticsWaveSevenPlans:
    """Scale gates for the late round-6 additions (OLS regression,
    market-basket pair counting)."""

    @staticmethod
    def _n_exchanges(plan: str) -> int:
        import re
        return len(re.findall(r"\(\d+\) Exchange", plan))

    def test_regression_is_one_partial_final_agg(self, spark):
        """The OLS query must stay a straight scan → partial agg →
        one shuffle on the 3-value group key → final agg (plus the
        presentation sort) — co-moments are decomposable sums, so any
        extra exchange means the plan regressed."""
        plan = plan_of(spark, "agg_regr_price_on_qty")
        assert "HashAggregate" in plan
        assert self._n_exchanges(plan) <= 2, plan

    def test_basket_pairs_avoids_fact_self_join(self, spark):
        """Pair expansion must be the JVM array form, never a shuffled
        fact-to-fact self-join: the part dim broadcasts, there is no
        sort-merge join anywhere, and the top-20 is a
        TakeOrderedAndProject (no global sort of the pair space)."""
        plan = plan_of(spark, "basket_brand_pairs")
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan, plan

    def test_classifier_model_join_broadcasts(self, spark):
        """The hashed-linear classifier's model join must broadcast the
        weight table — the corpus side shuffles only for the per-doc
        score groupBy, never for model lookup."""
        plan = plan_of(spark, "text_classifier_scores")
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan


class TestCurationPlans:
    """Round-10 curation rows: the scale-shape promises in their
    docstrings asserted against the actual physical plans."""

    @pytest.mark.parametrize("name", [
        "sample_weighted_bottomk", "pipeline_temperature_mix",
        "dedup_semantic_embedding", "dedup_incremental_minhash",
        "pipeline_dsir_importance",
    ])
    def test_no_cartesian_product(self, spark, name):
        assert "CartesianProduct" not in plan_of(spark, name), name

    def test_dsir_model_is_broadcast(self, spark):
        # the 4096-row bucket-weight model must join as a broadcast —
        # a shuffled join here would shuffle the whole scoring stream
        plan = plan_of(spark, "pipeline_dsir_importance")
        assert "BroadcastHashJoin" in plan

    def test_dsir_selection_is_take_ordered(self, spark):
        plan = plan_of(spark, "pipeline_dsir_importance")
        assert "TakeOrderedAndProject" in plan

    def test_temperature_mix_quota_is_broadcast(self, spark):
        # the per-domain alloc table joins back as a broadcast; the only
        # BNLJ is the 1-row totals frame
        plan = plan_of(spark, "pipeline_temperature_mix")
        assert "BroadcastHashJoin" in plan

    def test_incremental_minhash_band_probe_no_python(self, spark):
        plan = plan_of(spark, "dedup_incremental_minhash")
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "MapInPandas"):
            assert marker not in plan, marker


class TestLateR10Plans:
    @pytest.mark.parametrize("name", [
        "graph_kcore_membership", "txnlog_time_travel_stats",
        "cdc_change_feed_orders", "pipeline_curation_corpus",
    ])
    def test_no_cartesian_product(self, spark, name):
        assert "CartesianProduct" not in plan_of(spark, name), name

    def test_change_feed_reads_only_delta_dirs(self, spark):
        # the feed since v1 must scan the two delta dirs, never the
        # whole table: both scanned paths carry commit dirs > v1
        df = REGISTRY["cdc_change_feed_orders"].builder(
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re
        paths = re.findall(r"fg_cdcfeed_[0-9a-f]+/([a-zA-Z0-9_\-]+)", plan)
        assert paths, "no commit-dir scans found in the plan"
        assert all("00001" not in p for p in paths), paths


class TestR11Plans:
    @pytest.mark.parametrize("name", [
        "dedup_semantic_pretrained", "pipeline_dedup_cascade",
        "txnlog_schema_evolution_stats", "join_salted_skewed_events",
    ])
    def test_no_cartesian_product(self, spark, name):
        assert "CartesianProduct" not in plan_of(spark, name), name

    @pytest.mark.parametrize("name", [
        "dedup_semantic_pretrained", "pipeline_dedup_cascade",
        "join_salted_skewed_events",
    ])
    def test_no_python_boundary(self, spark, name):
        # the whole pipeline (quantize, SRP signs, banding, verify,
        # components / salting) must stay JVM-side
        plan = plan_of(spark, name)
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, (name, marker)

    def test_change_feed_stream_glob_pins_delta_dirs_only(self, spark):
        # the streaming consumer's source path must be a glob over
        # exactly the post-v1 delta dirs — the v1 seed dir unreachable
        from fictional_guacamole_spark.plans.curation import (
            _cdc_orders_feed_table)
        from fictional_guacamole_spark.sources.cdc import UpsertTable
        base = _cdc_orders_feed_table(spark, SF)
        t = UpsertTable(base, keys=["okey"])
        entries = t.history()
        feed_dirs = {e["data_dir"].split("/")[-1] for e in entries
                     if "base_through" not in e and e["version"] > 1}
        seed_dirs = {e["data_dir"].split("/")[-1] for e in entries
                     if e["version"] <= 1}
        glob = "{" + ",".join(sorted(feed_dirs)) + "}"
        # the row builds its glob from the same resolution — recompute
        # and check disjointness explicitly
        assert feed_dirs and seed_dirs
        assert not (feed_dirs & seed_dirs)
        for d in seed_dirs:
            assert d not in glob
