"""WebDataset-style tar shard sink/source for training-data delivery.

Training loaders (WebDataset, its torchdata descendants) stream samples
from tar shards: one shard = one sequentially-readable .tar, one sample =
adjacent entries sharing a basename stem ("<key>.tokens" + "<key>.json"
…). This is the ML-native counterpart of the per-route parquet sink —
after curation/packing, the corpus ships as shards a dataloader mounts
directly.

Spark shape: the shard assignment is the ONLY exchange — a repartition on
shard id (deterministic mix32 of the key, or any precomputed shard
column, e.g. deterministic_shuffle's) — then each shard writes ITS tar in
one pass via ``foreachPartition``-style mapInPandas (no driver
round-trip, no per-row JVM crossing; entries sorted by key within the
shard so the file bytes are a pure function of the shard's row set).
Tar entries use zeroed mtime/uid/gid, so shard bytes are REPRODUCIBLE —
the same determinism discipline as every sink in this repo (write_routed
salt, checkpoint commits).

Format per sample key K (12-digit zero-padded doc id):
  K.tokens — little-endian int32 array (the token sequence)
  K.txt    — UTF-8 source string
Both stdlib tarfile USTAR entries; a reader (``read_webdataset``)
round-trips shards back to a DataFrame for verification.

Reference anchor: fileexporter writes per-route files
(exporter/fileexporter); the tar-shard layout is the training-data
delivery analog (public WebDataset convention), beyond reference scope.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import mix32_col

_MANIFEST_SCHEMA = (
    "shard_id int, n_samples long, n_tokens long, tar_bytes long, path string"
)


def _tar_add(tf: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tf.addfile(info, io.BytesIO(payload))


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    num_shards: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    source_col: str = "source",
    shard_col: str | None = None,
    seed: int = 17,
) -> DataFrame:
    """Write (id, tokens, source) rows as ``shard-%05d.tar`` files; return
    the shard manifest (shard_id, n_samples, n_tokens, tar_bytes, path).

    ``shard_col`` reuses a precomputed assignment (e.g. from
    deterministic_shuffle); otherwise shard = mix32(id) % num_shards.
    One exchange (repartition on shard), one tar written per shard task.

    ``out_dir`` is opened with plain ``tarfile`` on the EXECUTOR — on a
    real cluster it must be a shared/distributed filesystem mount (NFS,
    FUSE'd object store); in local mode any directory works. The shard
    bytes themselves are deterministic either way.
    """
    if shard_col is None:
        df = df.withColumn(
            "__shard",
            F.pmod(mix32_col(F.col(id_col).cast("long"), seed=seed),
                   F.lit(num_shards)).cast("int"),
        )
        shard_col = "__shard"
    staged = (
        df.select(
            F.col(shard_col).alias("shard_id"),
            F.col(id_col).cast("long").alias("key"),
            F.col(tokens_col).alias("tokens"),
            F.col(source_col).cast("string").alias("source"),
        )
        .repartition(num_shards, "shard_id")
        # sort the whole partition (shard, key) so the writer can STREAM
        # Arrow batches straight into the tars: per-task memory is one
        # Arrow batch, not O(corpus/num_shards), and the bytes stay
        # reproducible because rows arrive in their final tar order.
        .sortWithinPartitions("shard_id", "key")
    )

    os.makedirs(out_dir, exist_ok=True)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one task may hold several shard ids (hash collisions on the
        # partitioner), but rows arrive sorted (shard_id, key): keep ONE
        # tar open at a time and roll it when the shard id changes.
        cur_sid: int | None = None
        tf = None
        path = ""
        n_tok = n_samp = 0
        rows = []

        def close_current() -> None:
            nonlocal tf
            if tf is not None:
                tf.close()
                tf = None
                rows.append(dict(
                    shard_id=cur_sid, n_samples=n_samp, n_tokens=n_tok,
                    tar_bytes=os.path.getsize(path), path=path,
                ))

        for pdf in batches:
            for sid, key, toks, src in zip(
                pdf["shard_id"], pdf["key"], pdf["tokens"], pdf["source"]
            ):
                sid = int(sid)
                if sid != cur_sid:
                    close_current()
                    cur_sid, n_tok, n_samp = sid, 0, 0
                    path = os.path.join(out_dir, "shard-%05d.tar" % sid)
                    tf = tarfile.open(path, "w", format=tarfile.USTAR_FORMAT)
                stem = "%012d" % int(key)
                arr = np.asarray(toks, dtype="<i4")
                n_tok += len(arr)
                n_samp += 1
                _tar_add(tf, stem + ".tokens", arr.tobytes())
                _tar_add(tf, stem + ".txt", str(src).encode("utf-8"))
        close_current()
        yield pd.DataFrame(
            rows,
            columns=["shard_id", "n_samples", "n_tokens", "tar_bytes", "path"],
        )

    return staged.mapInPandas(gen, _MANIFEST_SCHEMA)


_READ_SCHEMA = "doc_id long, tokens array<int>, source string, shard_id int"


def read_webdataset(spark, out_dir: str) -> DataFrame:
    """Round-trip reader: binaryFile-scan the shards, untar distributed."""
    bins = spark.read.format("binaryFile").load(os.path.join(out_dir, "*.tar"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                sid = int(os.path.basename(path).split("-")[1].split(".")[0])
                with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    sample: dict[str, dict] = {}
                    for m in tf.getmembers():
                        stem, ext = m.name.rsplit(".", 1)
                        payload = tf.extractfile(m).read()
                        sample.setdefault(stem, {})[ext] = payload
                    for stem, parts in sorted(sample.items()):
                        rows.append(dict(
                            doc_id=int(stem),
                            tokens=np.frombuffer(
                                parts["tokens"], dtype="<i4"
                            ).tolist(),
                            source=parts["txt"].decode("utf-8"),
                            shard_id=sid,
                        ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tokens", "source", "shard_id"]
            )

    return bins.select("path", "content").mapInPandas(gen, _READ_SCHEMA)
