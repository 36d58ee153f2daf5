"""Production job entry point: MULTIMODAL media-curation pipeline over
span-shaped documents — extract media spans, decode every payload
through all three real container parsers (image headers+pixels, WAV
audio, MP4 video metadata), and emit per-span quality gates a
training-data builder filters on (min pixel area, non-silent audio,
sane frame rate / frame count). Chunked + checkpoint-resumable like
jobs/curation_pipeline.py: a killed run resumes from the last
committed chunk with identical rows.

Every stage is a narrow Arrow-batched ``mapInPandas`` over the span
relation (no shuffle besides the final joins on the span key), so
throughput scales with partitions/executors — the 100 TB shape.

Cluster usage (north rule: multi-executor via --py-files)::

    cd repo && zip -r geodistpy_spark.zip geodistpy_spark
    spark-submit --py-files geodistpy_spark.zip \
        jobs/media_curation_pipeline.py \
        --docs s3://bucket/documents/ \
        --out s3://bucket/curated_media/ --chunks 256

Local smoke::

    PYTHONPATH=. python jobs/media_curation_pipeline.py \
        --docs <span-shaped documents parquet> \
        --out /tmp/media_out --chunks 4

In this sandbox the three fetch stubs synthesize deterministic REAL
container payloads per modality from each span's ref (a deployment
reads the object store once and dispatches on magic bytes); the
decode, feature, and gating stages are the production code paths.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None, stop_session: bool = True):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="span-shaped documents table (doc_id, spans)")
    ap.add_argument("--out", required=True, help="output + checkpoint dir")
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--min-pixels", type=int, default=64 * 64,
                    help="keep images with width*height >= this")
    ap.add_argument("--max-silence", type=float, default=0.5,
                    help="keep audio with silence_ratio <= this")
    ap.add_argument("--min-audio-ms", type=float, default=50.0)
    ap.add_argument("--min-fps", type=float, default=5.0)
    ap.add_argument("--max-fps", type=float, default=120.0)
    ap.add_argument("--min-frames", type=int, default=2)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("media_curation_pipeline") \
        .getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from geodistpy_spark.plans import CheckpointedRun
    from geodistpy_spark.sources.documents import extract_media_spans
    from geodistpy_spark.textops import (
        decode_audio,
        decode_media,
        decode_video_meta,
        fetch_audio_bytes,
        fetch_media_bytes,
        fetch_video_bytes,
    )

    docs = spark.read.parquet(args.docs)
    spans = extract_media_spans(docs).select(
        "doc_id", "span_idx", "media_ref").withColumn(
        # CheckpointedRun chunks on one key column; the span key is
        # unique per row and stable across runs
        "span_key", F.concat_ws(":", "doc_id", F.col("span_idx")))

    def transform(chunk):
        base = chunk.select("span_key", "doc_id", "span_idx", "media_ref")
        ids = base.select("span_key", "doc_id", "span_idx", "media_ref")

        img = decode_media(fetch_media_bytes(
            ids.select("doc_id", "span_idx", "media_ref"))).select(
            "doc_id", "span_idx",
            F.col("format").alias("img_format"),
            F.col("width").alias("img_w"),
            F.col("height").alias("img_h"))
        au = decode_audio(fetch_audio_bytes(
            ids.select("doc_id", "span_idx", "media_ref"))).select(
            "doc_id", "span_idx",
            F.col("duration_ms").alias("a_dur_ms"),
            F.col("silence_ratio").alias("a_silence"),
            F.col("sample_rate").alias("a_rate"))
        vid = decode_video_meta(fetch_video_bytes(
            ids.select("doc_id", "span_idx", "media_ref"))).select(
            "doc_id", "span_idx",
            F.col("brand").alias("v_brand"),
            F.col("fps").alias("v_fps"),
            F.col("n_frames").alias("v_frames"),
            F.col("width").alias("v_w"),
            F.col("height").alias("v_h"))

        keys = ["doc_id", "span_idx"]
        out = (base.join(img, on=keys).join(au, on=keys).join(vid, on=keys)
               .withColumn("keep_image",
                           F.col("img_w") * F.col("img_h")
                           >= args.min_pixels)
               .withColumn("keep_audio",
                           (F.col("a_silence") <= args.max_silence)
                           & (F.col("a_dur_ms") >= args.min_audio_ms))
               .withColumn("keep_video",
                           F.col("v_fps").between(args.min_fps,
                                                  args.max_fps)
                           & (F.col("v_frames") >= args.min_frames)))
        return out.withColumn(
            "keep", F.col("keep_image") & F.col("keep_audio")
            & F.col("keep_video"))

    run = CheckpointedRun(args.out, key_col="span_key",
                          n_chunks=args.chunks)
    executed = run.run(spans, transform)
    result = run.result(spark)
    n = result.count()
    n_keep = result.filter("keep").count()
    n_in = spans.count()
    print(f"media_curation_pipeline complete: {len(executed)} chunks "
          f"executed this run, {n_in} media spans in -> {n} decoded rows "
          f"({n_keep} pass all gates) committed at {args.out}")
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
