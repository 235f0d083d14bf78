"""AVI/RIFF container codec + distributed video frame-sampling."""

import numpy as np
import pytest

from opentelemetry_collector_contrib_spark.operators.video import (
    decode_avi,
    encode_avi,
    sample_frame_indices,
    video_features_from_tokens,
)


def test_dib_roundtrip_identity():
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(6, 8, 8)).astype(np.uint8)
    dec, meta = decode_avi(encode_avi(frames, fps=10, codec="DIB "))
    assert np.array_equal(dec, frames)
    assert meta["n_frames"] == 6 and meta["usec_per_frame"] == 100_000
    assert (meta["width"], meta["height"], meta["codec"]) == (8, 8, "DIB")


def test_dib_row_padding_and_flip():
    # odd width exercises the 4-byte stride pad; a gradient pins the
    # bottom-up un-flip (a flipped decode would reverse rows)
    frames = np.arange(2 * 5 * 7, dtype=np.uint8).reshape(2, 5, 7)
    dec, meta = decode_avi(encode_avi(frames, fps=4))
    assert np.array_equal(dec, frames)
    assert (meta["width"], meta["height"]) == (7, 5)


def test_mjpeg_frames_decode_close():
    # block-constant frames survive DCT quantization nearly exactly
    rng = np.random.RandomState(3)
    base = rng.randint(16, 240, size=(3, 2, 2)).astype(np.uint8)
    frames = np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)
    dec, meta = decode_avi(encode_avi(frames, fps=5, codec="MJPG", quality=95))
    assert meta["codec"] == "MJPG" and dec.shape == frames.shape
    mae = np.abs(dec.astype(int) - frames.astype(int)).mean()
    assert mae < 3.0, mae


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        decode_avi(b"RIFX" + b"\x00" * 32)


def test_sample_frame_indices():
    assert sample_frame_indices(10, 100_000, 250) == [0, 2, 4, 6, 8]
    assert sample_frame_indices(10, 100_000, 1000) == [0]  # 10 fps, 1/s... step 10
    assert sample_frame_indices(3, 100_000, 50) == [0, 1, 2]  # never upsample
    assert sample_frame_indices(0, 100_000, 250) == []


def test_video_features_distributed(spark):
    df = spark.createDataFrame(
        [(i, list(range(i, i + 70))) for i in range(12)],
        "doc_id long, tokens array<int>",
    ).repartition(4)
    out = {r.media_id: r for r in video_features_from_tokens(df).collect()}
    assert len(out) == 12
    for mid, r in out.items():
        nf = 3 + mid % 4
        assert r.n_frames == nf and r.n_sampled == (nf + 1) // 2
        toks = [(mid + j) % 256 for j in range(64)]
        want_sum = sum(
            (t + f) % 256 for f in range(0, nf, 2) for t in toks
        )
        assert r.sam_sum == want_sum, mid
