"""Multimodal columns: opaque binary payloads + typed metadata.

Design for 100 TB: image/audio/video payloads ride as ``binary`` columns
with a typed metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas functions over
``mapInPandas`` so payload bytes stay columnar end-to-end and never pass
through row-at-a-time Python.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image`` raises ``NotImplementedError`` unless a codec is
available, and ``extract_metadata`` uses a deterministic header parse
(byte length + a fake format tag) — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

def metadata_schema(id_col: str = "doc_id") -> str:
    return f"{id_col} long, n_bytes long, format string"


METADATA_SCHEMA = metadata_schema()


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the text
    column — a deterministic stand-in for real image/audio bytes)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def extract_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched metadata extraction over ``mapInPandas``.

    Yields one row per payload with (id, byte length, format tag).  The
    batch loop is the real shape a codec would use: bytes in, small typed
    record out, no payload in the output schema (column pruning drops the
    blob immediately above this operator).
    """

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "format": "raw",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        meta_batches, metadata_schema(id_col)
    )


N_FEATURES = 16


def feature_schema(id_col: str = "doc_id") -> str:
    return f"{id_col} long, " + ", ".join(f"h{i} long" for i in range(N_FEATURES))


FEATURE_SCHEMA = feature_schema()


def nibble_histogram(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Feature extraction over binary payloads: 16-bin nibble histogram.

    The codec-free stand-in for "decode bytes → feature vector": numpy
    reads each payload zero-copy from the Arrow batch, splits bytes into
    high/low nibbles, and bincounts — the exact compute shape of a real
    featurizer (bytes in, fixed-width numeric vector out), vectorized
    per batch.  Counts are integers, so any engine reproduces them
    bit-exactly (oracle: hex-digit frequencies of the payload).
    """
    import numpy as np

    def hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            # One concatenation + one bincount for the WHOLE batch: tag each
            # byte's nibbles with its row index (row*16 + nibble) and count
            # into an (n_rows, 16) matrix — no per-row Python loop.
            lens = pdf[payload_col].map(len).to_numpy(dtype=np.int64)
            all_bytes = np.frombuffer(
                b"".join(pdf[payload_col]), dtype=np.uint8
            ).astype(np.int64)
            row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            keys = np.concatenate(
                [row_ids * N_FEATURES + (all_bytes >> 4),
                 row_ids * N_FEATURES + (all_bytes & 15)]
            )
            counts = np.bincount(keys, minlength=n_rows * N_FEATURES).reshape(
                n_rows, N_FEATURES
            )
            out = {id_col: pdf[id_col].to_numpy()}
            for i in range(N_FEATURES):
                out[f"h{i}"] = counts[:, i]
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        hist_batches, feature_schema(id_col)
    )


def resize_image(
    df: DataFrame, payload_col: str = "payload", width: int = 224, height: int = 224
) -> DataFrame:
    """Resize image payloads — STUB (no codec in this container).

    Fails fast like ``decode_image``; the batch plumbing a real resizer
    would use (binary in → binary out over mapInPandas) is the same shape
    as ``nibble_histogram``.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires an image codec (PIL/opencv), not "
            "available in this environment; see nibble_histogram for the "
            "exercised mapInPandas batch shape"
        ) from exc
    raise NotImplementedError("codec integration not implemented")


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode image payloads to (height, width, channels) — STUB.

    A real deployment plugs a codec (PIL/opencv) into the batch loop; this
    container has none, so the operator fails fast with a clear error
    rather than fake-decoding silently.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image codec (PIL/opencv), not "
            "available in this environment; the mapInPandas plumbing is "
            "exercised via extract_metadata instead"
        ) from exc
    raise NotImplementedError("codec integration not implemented")


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
) -> DataFrame:
    """Deterministic 'frame sampling' over binary payloads: one output row
    per 64-byte window (stand-in for video frame extraction), Arrow-batched.

    Demonstrates the 1→N mapInPandas shape (explode-like fan-out of frames
    from one payload) without needing a codec.
    """

    import numpy as np

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized 1→N fan-out: per-payload frame counts via numpy,
            # then repeat/arange — no per-row Python loop inside the batch.
            lens = pdf[payload_col].map(len).to_numpy(dtype=np.int64)
            n_frames = -(-lens // every_n_bytes)  # ceil-div; 0 for empty
            ids = np.repeat(pdf[id_col].to_numpy(), n_frames)
            total = int(n_frames.sum())
            # frame_idx restarts at 0 for each payload: global arange minus
            # each payload's start offset, broadcast via repeat.  cumsum -
            # n_frames is the exclusive prefix sum, length-matched with
            # n_frames so an empty batch yields an empty result instead of
            # the shape-(1,)-vs-(0,) broadcast error of concatenate([0],…).
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            idxs = np.arange(total, dtype=np.int64) - starts
            rem = np.repeat(lens, n_frames) - idxs * every_n_bytes
            sizes = np.minimum(rem, every_n_bytes)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs.astype("int32"),
                    "frame_bytes": sizes.astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        sample_batches, f"{id_col} long, frame_idx int, frame_bytes int"
    )
