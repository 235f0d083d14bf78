"""Physical-layout evidence: bucketed co-located joins and partition pruning
— the storage-layout levers the 100 TB deployment depends on (SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources.tokengen import tokens_df


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed by the join key join WITHOUT an Exchange —
    the co-located join strategy for repeated big-big joins (e.g. tokens ⋈
    per-doc metadata at corpus scale)."""
    t = tokens_df(spark, 2000, num_partitions=4)
    meta = t.select("doc_id", F.size("tokens").alias("len0"))

    (
        t.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("tok_bucketed")
    )
    (
        meta.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("meta_bucketed")
    )
    a = spark.table("tok_bucketed")
    b = spark.table("meta_bucketed")
    joined = a.join(b, "doc_id")
    assert joined.count() == 2000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:1500]

    # contrast: the same join on plain parquet DOES shuffle (or broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t.write.mode("overwrite").parquet(str(tmp_path / "plain"))
        p = spark.read.parquet(str(tmp_path / "plain"))
        j2 = p.join(p.select("doc_id", F.col("n_tok").alias("x")), "doc_id")
        j2.count()
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS tok_bucketed")
        spark.sql("DROP TABLE IF EXISTS meta_bucketed")


def test_partition_pruning_on_route_sinks(spark, tmp_path):
    """Reading one route from the per-route sink only scans that partition
    (PartitionFilters in the scan — the reason sinks partition by route)."""
    from opentelemetry_collector_contrib_spark.plans.pipeline import full_pipeline
    from opentelemetry_collector_contrib_spark.operators.router import write_routed

    routed, _ = full_pipeline(tokens_df(spark, 2000, num_partitions=4), spark, use_pandas_udf=False)
    out = str(tmp_path / "sinks")
    write_routed(routed, out)

    df = spark.read.parquet(out).filter(F.col("route") == "acme")
    n_acme = df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the route predicate lands in PartitionFilters (directory-level prune),
    # not in DataFilters (row-level)
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "route" in pf and "acme" in pf, pf
    total = spark.read.parquet(out).count()
    assert 0 < n_acme < total
