"""Multimodal columns: opaque binary payloads + typed metadata.

Extension surface (SURVEY §2.11): image/audio/video assets ride in a
DataFrame as ``binary`` columns next to a typed metadata struct; the
compute pattern is Arrow-batched ``mapInPandas`` over partition-sized
pandas batches — the payload never round-trips through Python row by
row, and partitioning stays whatever the upstream scan gave us.

Codec note: image/audio libraries are not available in this
environment, so the *decode* step is pluggable: ``StubDecoder`` raises
``NotImplementedError`` (the honest production placeholder) and
``FakeDecoder`` produces deterministic synthetic "pixels" from the
payload bytes so the full pipeline (schema, batching, UDF signatures,
feature shapes) is exercised end-to-end in tests.

Asset fixtures are synthesized from the ``documents`` table (UTF-8
payloads) — the driver ships no binary fixtures.
"""

from __future__ import annotations

from typing import Iterator, Protocol

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor (stable driver-checkable shape).
ASSET_FEATURES_SCHEMA = (
    "asset_id long, kind string, n_bytes long, features array<float>"
)

N_FEATURES = 16


class Decoder(Protocol):
    def decode(self, payload: bytes) -> np.ndarray: ...


class StubDecoder:
    """Production placeholder: real codecs (PIL/ffmpeg/soundfile) are
    not installed here."""

    def decode(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "media codecs unavailable in this environment; plug a real "
            "Decoder or use FakeDecoder for deterministic tests"
        )


class FakeDecoder:
    """Deterministic fake: payload bytes ARE the sample buffer."""

    def decode(self, payload: bytes) -> np.ndarray:
        return np.frombuffer(payload or b"\x00", dtype=np.uint8)


def make_assets(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents fixture:
    UTF-8 payload + typed metadata struct. Kind assignment is
    deterministic (doc_id mod 3)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.col("n_chars").cast("long").alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def extract_features(
    assets: DataFrame, decoder: Decoder | None = None
) -> DataFrame:
    """Decode + featurize each asset: 16-bin byte histogram (L1
    normalized) as the stand-in embedding. ``mapInPandas`` — one
    Python call per Arrow batch, vectorized numpy inside."""
    decoder = decoder or FakeDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                buf = decoder.decode(payload)
                if buf.size == 0:
                    # OPERATOR-level invariant (not delegated to the
                    # decoder): every row featurizes over ≥1 sample so
                    # the histogram's L1 mass is exactly 1 — the
                    # registered oracle pins feat_l1=1.0 per row
                    buf = np.zeros(1, dtype=np.uint8)
                hist, _ = np.histogram(buf, bins=N_FEATURES, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=ASSET_FEATURES_SCHEMA)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame sampling for video-kind assets: deterministic stride over
    the payload — a real frame sampler would seek keyframes; the
    Spark-side contract (explode to one row per frame with an index)
    is identical. Pure built-ins: no Python.

    Stride offsets, frame count, and slices all use ONE unit — the
    decoded string's character positions — so frame boundaries agree
    with the char-based SQL oracle for non-ASCII payloads too
    (``F.length`` on the raw binary counts bytes, which diverges from
    ``LENGTH(text)`` the moment a multi-byte char appears)."""
    decoded = F.col("payload").cast("string")
    frames = F.element_at(
        F.transform(
            F.array(decoded),  # let-bind: decode the payload once per row
            lambda s: F.transform(
                F.sequence(
                    F.lit(0),
                    F.least(
                        (F.length(s) / every_n_bytes).cast("int"),
                        F.lit(max_frames - 1),
                    ),
                ),
                lambda i: F.struct(
                    i.alias("frame_no"),
                    F.substring(
                        s, i * every_n_bytes + 1, every_n_bytes
                    ).alias("frame_bytes"),
                ),
            ),
        ),
        1,
    )
    return (
        assets.filter(F.col("meta.kind") == "video")
        .select("asset_id", F.explode(frames).alias("f"))
        .select("asset_id", "f.frame_no", "f.frame_bytes")
    )


RESIZED_SCHEMA = "asset_id long, kind string, orig_bytes long, resized binary"

TARGET_SAMPLES = 32


def resize_assets(
    assets: DataFrame, decoder: Decoder | None = None, target: int = TARGET_SAMPLES
) -> DataFrame:
    """Resize/resample each asset to a fixed sample count: decode →
    bucketed mean over ``target`` equal slices → re-encode. A real
    implementation would be PIL ``resize`` / ffmpeg scale with the
    same mapInPandas plumbing (Arrow batches in, binary column out);
    the bucketed mean is the deterministic stand-in. Payloads shorter
    than ``target`` are zero-padded (never dropped), so the output
    length is constant — the property downstream fixed-shape
    feature extractors rely on."""
    decoder = decoder or FakeDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for payload in pdf["payload"]:
                buf = decoder.decode(payload).astype(np.float64)
                # operator-level invariant (see extract_features): the
                # zero-pad below also covers an EMPTY decode, so the
                # fixed resized length the oracle pins holds for every
                # decoder, not just FakeDecoder's b"\\x00" substitute
                if len(buf) < target:
                    buf = np.pad(buf, (0, target - len(buf)))
                cut = (len(buf) // target) * target
                means = buf[:cut].reshape(target, -1).mean(axis=1)
                resized.append(bytes(np.clip(means, 0, 255).astype(np.uint8)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "orig_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "resized": resized,
                }
            )

    return assets.mapInPandas(run, schema=RESIZED_SCHEMA)
