"""Multimodal column plumbing: opaque binary media + typed metadata.

Media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing (schemas, partitioning, Arrow batch shapes,
``mapInPandas`` signatures) is real and tested. The actual image/audio
DECODE step is stubbed: the container has no codec libraries, so
``decode_media`` either raises ``NotImplementedError`` (real mode) or
produces a deterministic fake decode (test mode) — clearly marked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_DIM = 8

DECODED_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, "
    "width int, height int, n_bytes long, features array<float>"
)


def fetch_media_bytes(media_spans: DataFrame) -> DataFrame:
    """Resolve media_ref -> binary payload.

    STUB: a real deployment resolves ``media://`` refs against an object
    store. Here the payload is a deterministic function of the ref
    (sha256 stream), so every downstream shape is exercised with stable
    bytes. Column types and batch flow match the real path exactly.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                hashlib.sha256(ref.encode()).digest() * 4  # 128 bytes
                for ref in pdf["media_ref"]
            ]
            yield pdf.assign(payload=payloads)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media_spans.schema.fields)
    return media_spans.mapInPandas(gen, schema=schema + ", payload binary")


def decode_media(media_with_bytes: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary media -> (dimensions, feature vector).

    ``fake=False`` raises NotImplementedError from the executors (no
    codec libs in this environment). ``fake=True`` derives deterministic
    pseudo-features from the payload bytes — the Arrow batch shape,
    output schema, and partition behavior are identical to a real
    decoder, which is what the engine layer needs to be correct about.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; run with fake=True for plumbing tests"
                )
            raw = np.stack([
                np.frombuffer(p[:MEDIA_FEATURE_DIM * 4], dtype=np.uint8)[: MEDIA_FEATURE_DIM * 4]
                for p in pdf["payload"]
            ])
            feats = raw.reshape(len(pdf), MEDIA_FEATURE_DIM, 4).sum(axis=2) / 1020.0
            first = np.stack([np.frombuffer(p[:4], dtype=np.uint16)[:2] for p in pdf["payload"]])
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"],
                "media_ref": pdf["media_ref"],
                "width": (first[:, 0] % 1920 + 16).astype("int32"),
                "height": (first[:, 1] % 1080 + 16).astype("int32"),
                "n_bytes": pdf["payload"].str.len().astype("int64"),
                "features": list(feats.astype(np.float32)),
            })
            yield out

    return media_with_bytes.mapInPandas(gen, schema=DECODED_SCHEMA)


def media_feature_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> media spans -> bytes -> decoded features.

    The end-to-end multimodal path: extraction is pure Catalyst; fetch +
    decode are Arrow-batched mapInPandas stages that scale by partition.
    """
    from ..sources.documents import extract_media_spans

    spans = extract_media_spans(docs)
    with_bytes = fetch_media_bytes(spans.select("doc_id", "span_idx", "media_ref"))
    return decode_media(with_bytes)
