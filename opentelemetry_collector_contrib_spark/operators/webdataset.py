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
    staged = df.select(
        F.col(shard_col).alias("shard_id"),
        F.col(id_col).cast("long").alias("key"),
        F.col(tokens_col).alias("tokens"),
        F.col(source_col).cast("string").alias("source"),
    ).repartition(num_shards, "shard_id")

    os.makedirs(out_dir, exist_ok=True)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one task may hold several shard ids (hash collisions on the
        # partitioner); group and write one tar per shard id it owns
        chunks = list(batches)
        pdf = pd.concat(chunks, ignore_index=True) if chunks else None
        if pdf is None or len(pdf) == 0:
            yield pd.DataFrame(
                columns=["shard_id", "n_samples", "n_tokens", "tar_bytes", "path"]
            )
            return
        rows = []
        for sid, grp in pdf.groupby("shard_id"):
            grp = grp.sort_values("key")
            path = os.path.join(out_dir, "shard-%05d.tar" % int(sid))
            n_tok = 0
            with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
                for key, toks, src in zip(grp["key"], grp["tokens"], grp["source"]):
                    stem = "%012d" % int(key)
                    arr = np.asarray(toks, dtype="<i4")
                    n_tok += len(arr)
                    _tar_add(tf, stem + ".tokens", arr.tobytes())
                    _tar_add(tf, stem + ".txt", str(src).encode("utf-8"))
            rows.append(dict(
                shard_id=int(sid), n_samples=len(grp), n_tokens=n_tok,
                tar_bytes=os.path.getsize(path), path=path,
            ))
        yield pd.DataFrame(rows)

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
