"""Multimodal columns: opaque binary payloads + typed metadata.

Design for 100 TB: image/audio/video payloads ride as ``binary`` columns
with a typed metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas functions over
``mapInPandas`` so payload bytes stay columnar end-to-end and never pass
through row-at-a-time Python.

Decoding comes in two clearly-marked forms: ``decode_image``/
``resize_image`` are REAL codec operators behind an optional Pillow
dependency (driver-side fail-fast ``NotImplementedError`` when the
codec is absent, as in this container; tests skip-if-absent), while
``decode_fake``/``resize_fake`` are DETERMINISTIC FAKES — the payload
bytes viewed as a zero-padded grayscale grid with real integer
nearest-neighbor resampling — so the full decode→resize plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is exercised
end-to-end and pinned against a Python model in tests regardless of
installed codecs.
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


def _fake_grid_dims(n: int) -> tuple[int, int]:
    """Deterministic (height, width) for an n-byte payload viewed as a
    square-ish grayscale pixel grid: width = ceil(isqrt-based root),
    height = ceil(n / width).  Pure integer math (no float sqrt)."""
    if n <= 0:
        return 0, 0
    import math

    w = math.isqrt(n)
    if w * w < n:
        w += 1
    h = -(-n // w)
    return h, w


def decode_fake(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic FAKE decode: bytes → (height, width, channels=1,
    sum_pixels) treating the payload as a zero-padded square-ish grayscale
    grid.

    This is the documented "deterministic fake" alternative to the
    fail-fast codec stubs (``decode_image``): the batch loop, output
    schema, and column-pruned payload input are exactly what a real
    decoder uses — swap the grid math for ``PIL.Image.open`` and nothing
    else changes.  All outputs are integers, reproducible anywhere.
    """

    import numpy as np

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf[payload_col].map(len).to_numpy(dtype=np.int64)
            # per-payload byte sums via one prefix sum over the whole batch
            # (cumsum-difference handles empty payloads and empty batches;
            # reduceat would mis-handle zero-length segments)
            blob = np.frombuffer(b"".join(pdf[payload_col]), dtype=np.uint8)
            csum = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(blob, dtype=np.int64)]
            )
            ends = np.cumsum(lens)
            sums = csum[ends] - csum[ends - lens]
            dims = [_fake_grid_dims(int(n)) for n in lens]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "height": np.array([d[0] for d in dims], dtype=np.int32),
                    "width": np.array([d[1] for d in dims], dtype=np.int32),
                    "channels": np.full(len(pdf), 1, dtype=np.int32),
                    "sum_pixels": sums,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches,
        f"{id_col} long, height int, width int, channels int, sum_pixels long",
    )


def resize_fake(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_h: int = 8,
    out_w: int = 8,
) -> DataFrame:
    """Deterministic FAKE resize: nearest-neighbor resample of the fake
    pixel grid to (out_h, out_w), emitting the resized grid's checksum.

    REAL resampling math — source index ``(r·src_h) div out_h`` /
    ``(c·src_w) div out_w``, all integer — over the same zero-padded grid
    as ``decode_fake``; only the pixel source is fake.  Per-payload numpy
    gather inside the Arrow batch (ragged dims make cross-row
    vectorization meaningless here; the per-row work is one fancy-index).
    Empty payloads produce a 0×0 result with checksum 0.
    """
    import numpy as np

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: [], "out_h": [], "out_w": [],
                                    "checksum": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                h, w = _fake_grid_dims(len(payload))
                if h == 0:
                    out[id_col].append(i)
                    out["out_h"].append(0)
                    out["out_w"].append(0)
                    out["checksum"].append(0)
                    continue
                grid = np.zeros(h * w, dtype=np.int64)
                grid[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
                grid = grid.reshape(h, w)
                rr = (np.arange(out_h, dtype=np.int64) * h) // out_h
                cc = (np.arange(out_w, dtype=np.int64) * w) // out_w
                resized = grid[np.ix_(rr, cc)]
                out[id_col].append(i)
                out["out_h"].append(out_h)
                out["out_w"].append(out_w)
                out["checksum"].append(int(resized.sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches, f"{id_col} long, out_h int, out_w int, checksum long"
    )


def resize_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Resize real image payloads to (width, height) via Pillow and
    re-encode as PNG — binary in → binary out over ``mapInPandas``.

    Pillow is an OPTIONAL public dependency: the import check runs at
    plan-build time on the DRIVER so a missing codec fails fast with a
    clear ``NotImplementedError`` instead of per-task executor errors.
    ``decode_fake``/``resize_fake`` remain the oracle-checked default
    path — this operator is for pipelines with real JPEG/PNG bytes.
    NEAREST resampling keeps the output deterministic across Pillow
    versions (bilinear kernels have varied historically).
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires an image codec (Pillow), not "
            "available in this environment; resize_fake exercises the "
            "same mapInPandas batch shape deterministically"
        ) from exc

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            ids, blobs = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                with Image.open(io.BytesIO(payload)) as im:
                    buf = io.BytesIO()
                    im.resize((width, height), Image.NEAREST).save(
                        buf, format="PNG"
                    )
                ids.append(i)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({id_col: ids, payload_col: blobs})

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches, f"{id_col} long, {payload_col} binary"
    )


def decode_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode real image payloads to (height, width, channels, format)
    via Pillow — the real-codec counterpart of ``decode_fake``.

    Same optional-dependency contract as ``resize_image``: driver-side
    fail-fast when Pillow is absent.  ``Image.open`` reads only the
    header to size the image, so the per-row cost is parsing, not a full
    pixel decode.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image codec (Pillow), not "
            "available in this environment; decode_fake exercises the "
            "same mapInPandas batch shape deterministically"
        ) from exc

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            out: dict[str, list] = {
                id_col: [], "height": [], "width": [], "channels": [],
                "format": [],
            }
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                with Image.open(io.BytesIO(payload)) as im:
                    w, h = im.size
                    out[id_col].append(i)
                    out["height"].append(h)
                    out["width"].append(w)
                    out["channels"].append(len(im.getbands()))
                    out["format"].append(im.format or "")
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches,
        f"{id_col} long, height int, width int, channels int, format string",
    )


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
