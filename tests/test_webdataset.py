"""WebDataset tar shard sink: round-trip, determinism, manifest."""

import os
import tarfile

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.webdataset import (
    read_webdataset,
    write_webdataset_shards,
)


def _docs(spark):
    return spark.createDataFrame(
        [(i, [i, i * 2 % 97, i * 3 % 97], "s%d" % (i % 4)) for i in range(60)],
        "doc_id long, tokens array<int>, source string",
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "wds")
    man = write_webdataset_shards(_docs(spark), out, num_shards=4).collect()
    assert sorted(m.shard_id for m in man) == [0, 1, 2, 3]
    assert sum(m.n_samples for m in man) == 60
    assert sum(m.n_tokens for m in man) == 180
    for m in man:
        assert os.path.getsize(m.path) == m.tar_bytes

    back = read_webdataset(spark, out)
    got = {r.doc_id: (r.tokens, r.source, r.shard_id) for r in back.collect()}
    want = {r.doc_id: (r.tokens, r.source) for r in _docs(spark).collect()}
    assert set(got) == set(want)
    for k, (toks, src) in want.items():
        assert got[k][0] == toks and got[k][1] == src
    # shard assignment recorded in the manifest matches the reader's view
    per_shard = {m.shard_id: m.n_samples for m in man}
    seen = {}
    for _, (_, _, sid) in got.items():
        seen[sid] = seen.get(sid, 0) + 1
    assert seen == per_shard


def test_shard_bytes_reproducible(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(_docs(spark).repartition(7), a, num_shards=3).collect()
    write_webdataset_shards(_docs(spark).repartition(2), b, num_shards=3).collect()
    for i in range(3):
        fa = open(os.path.join(a, "shard-%05d.tar" % i), "rb").read()
        fb = open(os.path.join(b, "shard-%05d.tar" % i), "rb").read()
        assert fa == fb, i  # bytes are a pure function of the row set


def test_entries_sorted_and_zero_mtime(spark, tmp_path):
    out = str(tmp_path / "wds2")
    write_webdataset_shards(_docs(spark), out, num_shards=1).collect()
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tf:
        names = [m.name for m in tf.getmembers()]
        assert names == sorted(names)
        assert all(m.mtime == 0 and m.uid == 0 for m in tf.getmembers())


def test_precomputed_shard_column(spark, tmp_path):
    out = str(tmp_path / "wds3")
    docs = _docs(spark).withColumn(
        "my_shard", (F.col("doc_id") % 2).cast("int")
    )
    man = write_webdataset_shards(
        docs, out, num_shards=2, shard_col="my_shard"
    ).collect()
    assert {m.shard_id: m.n_samples for m in man} == {0: 30, 1: 30}
