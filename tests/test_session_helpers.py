"""Focused tests for the r11 optimization helpers (OPTIMIZATION_r11.md
§5 _localize_query_terms, §7 ensure_parallelism, §9 partition_for_kernel).

These pin the helpers' CONTRACTS — row preservation, gating, partition
math — the result-level equivalence of every caller is separately gated
by the oracle rows and the distributed-join property tests."""

import pytest
from pyspark.sql import functions as F

import gamma_spark.session as S
from gamma_spark.operators.retrieval import (
    _localize_query_terms,
    _localized_terms_and_set,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestPartitionForKernel:
    def test_partition_count_and_rows(self, spark):
        df = spark.range(100).select(
            (F.col("id") % 8).alias("k"), F.col("id").alias("v")
        )
        before = _rows(df)
        out = S.partition_for_kernel(df, ["k"], ngroups=8)
        # p = min(shuffle.partitions=4, 4*8=32) = 4
        assert out.rdd.getNumPartitions() == 4
        assert _rows(out) == before

    def test_ngroups_caps_partitions(self, spark):
        conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
        df = spark.range(16).select((F.col("id") % 2).alias("k"))
        out = S.partition_for_kernel(df, ["k"], ngroups=1)
        # p = min(conf, 4*1); with the 4-core test session both are 4
        assert out.rdd.getNumPartitions() == min(conf, 4)

    def test_rows_grouped_by_key(self, spark):
        # hash partitioning on the keys: every key lives in ONE partition
        df = spark.range(64).select((F.col("id") % 8).alias("k"))
        out = S.partition_for_kernel(df, ["k"], ngroups=8)
        per_part = out.rdd.mapPartitions(
            lambda it: [set(r.k for r in it)]
        ).collect()
        seen = {}
        for pid, keys in enumerate(per_part):
            for k in keys:
                assert k not in seen, f"key {k} split across partitions"
                seen[k] = pid
        assert set(seen) == set(range(8))


class TestEnsureParallelism:
    def test_small_input_is_untouched(self, spark):
        df = spark.range(10).coalesce(1)
        out = S.ensure_parallelism(df)
        # below the 32 MB size gate the helper must be a strict no-op
        assert out is df

    def test_large_single_partition_input_repartitions(self, spark, monkeypatch):
        monkeypatch.setattr(S, "_REPARTITION_MIN_BYTES", 0)
        df = spark.range(100).coalesce(1)
        before = _rows(df)
        out = S.ensure_parallelism(df)
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert out.rdd.getNumPartitions() == target
        assert _rows(out) == before

    def test_already_parallel_input_is_untouched(self, spark, monkeypatch):
        monkeypatch.setattr(S, "_REPARTITION_MIN_BYTES", 0)
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        df = spark.range(100).repartition(target)
        assert S.ensure_parallelism(df) is df


class TestLocalizeQueryTerms:
    def test_derived_relation_becomes_local(self, spark):
        qt = (
            spark.range(20)
            .select(
                F.col("id").alias("qid"),
                F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
                    "term"
                ),
            )
            .repartition(4)  # force a non-local plan
        )
        out = _localize_query_terms(qt)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # localized: a materialized scan (LocalRelation, or LogicalRDD
        # when createDataFrame runs through Arrow), never the derived
        # subplan (which would show the repartition)
        assert plan.split("\n", 1)[0].startswith(
            ("LocalRelation", "LogicalRDD")
        )
        assert "Repartition" not in plan
        assert _rows(out.select("qid", "term")) == _rows(
            qt.select("qid", "term")
        )

    def test_materialized_input_passes_through(self, spark):
        qt = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "qid long, term string"
        )
        out = _localize_query_terms(qt)
        # already materialized (LocalRelation/LogicalRDD): no extra
        # collect job — the select of the same relation comes back
        assert out._jdf.queryExecution().optimizedPlan().toString() == (
            qt.select("qid", "term")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert _rows(out) == [(1, "alpha"), (2, "beta")]

    def test_extra_columns_are_projected_away(self, spark):
        qt = spark.createDataFrame(
            [(1, "alpha", 0.5)], "qid long, term string, w double"
        )
        out = _localize_query_terms(qt)
        assert out.columns == ["qid", "term"]


class TestLocalizedTermsAndSet:
    """r12: the distinct-term set for the postings semi-join prune is
    deduplicated driver-side when the request relation was collected by
    the localization anyway — the planner then broadcasts a
    LocalRelation instead of running an Exchange + two HashAggregates
    per search."""

    def test_derived_relation_gets_local_qset(self, spark):
        qt = (
            spark.range(20)
            .select(
                F.col("id").alias("qid"),
                F.when(
                    F.col("id") % 7 == 0, F.lit(None).cast("string")
                ).otherwise(
                    F.concat(F.lit("t"), (F.col("id") % 5).cast("string"))
                ).alias("term"),
            )
            .repartition(4)
        )
        terms, qset = _localized_terms_and_set(qt)
        qplan = qset._jdf.queryExecution().optimizedPlan().toString()
        # driver-built set: a materialized local scan, no Aggregate
        assert qplan.split("\n", 1)[0].startswith(
            ("LocalRelation", "LogicalRDD")
        )
        assert "Aggregate" not in qplan
        # exact distinct-set semantics, NULL terms included
        want = sorted(
            {r.term for r in qt.collect()}, key=lambda t: (t is None, t)
        )
        got = sorted(
            (r.term for r in qset.collect()), key=lambda t: (t is None, t)
        )
        assert got == want
        assert _rows(terms) == _rows(qt.select("qid", "term"))

    def test_materialized_input_keeps_distinct_qset(self, spark):
        qt = spark.createDataFrame(
            [(1, "alpha"), (2, "alpha"), (2, "beta")],
            "qid long, term string",
        )
        terms, qset = _localized_terms_and_set(qt)
        # pass-through path: no extra collect job — the set stays the
        # planner-side distinct over the already-local relation
        assert _rows(terms) == _rows(qt)
        assert _rows(qset) == [("alpha",), ("beta",)]
