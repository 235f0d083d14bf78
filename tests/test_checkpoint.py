"""Kill/resume exactly-once test (SURVEY §5 rebuild plan item 4)."""

import shutil
import tempfile

import pytest

from opentelemetry_collector_contrib_spark.plans.checkpoint import CheckpointedRunner
from opentelemetry_collector_contrib_spark.plans.pipeline import full_pipeline
from opentelemetry_collector_contrib_spark.sources.tokengen import tokens_df

N = 3000


@pytest.fixture(scope="module")
def tokens_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ckpt") / "tokens")
    tokens_df(spark, N, num_partitions=8).write.parquet(p)
    return p


def _pipeline(df, spark):
    return full_pipeline(df, spark, match_once=True)


def test_resume_exactly_once(spark, tokens_path, tmp_path):
    out_interrupted = str(tmp_path / "out_a")
    out_oneshot = str(tmp_path / "out_b")

    # reference: a clean single run
    ref = CheckpointedRunner(out_oneshot, _pipeline, files_per_chunk=2)
    ref.run(spark, tokens_path)
    want = {r.doc_id for r in ref.routed(spark).select("doc_id").collect()}
    assert len(want) == N

    # "killed" run: stops after 2 chunks
    r = CheckpointedRunner(out_interrupted, _pipeline, files_per_chunk=2)
    r.run(spark, tokens_path, max_chunks=2)
    partial = r.routed(spark).select("doc_id").count()
    assert 0 < partial < N
    assert len(r.completed_chunks(spark)) == 2

    # resume: only remaining chunks processed; output identical to oneshot
    r.run(spark, tokens_path)
    got_rows = r.routed(spark).select("doc_id").collect()
    got = {x.doc_id for x in got_rows}
    assert got == want
    assert len(got_rows) == N  # no duplicates

    # aggregates match the oneshot aggregates
    a = {tuple(x) for x in r.aggregates(spark).collect()}
    b = {tuple(x) for x in ref.aggregates(spark).collect()}
    assert a == b

    # lineage recorded one row per chunk
    assert r.metrics(spark).count() == len(r.completed_chunks(spark))


def test_rerun_is_noop(spark, tokens_path, tmp_path):
    out = str(tmp_path / "out_c")
    r = CheckpointedRunner(out, _pipeline, files_per_chunk=4)
    r.run(spark, tokens_path)
    n1 = r.routed(spark).count()
    ck1 = len(r.completed_chunks(spark))
    r.run(spark, tokens_path)  # everything committed → no-op
    assert r.routed(spark).count() == n1
    assert len(r.completed_chunks(spark)) == ck1
