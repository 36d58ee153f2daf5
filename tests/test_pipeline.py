"""Checkpoint/resume tests: kill mid-run, resume, identical output rows."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geodistpy_spark.plans import CheckpointedRun


def _transform(chunk):
    """A representative engine transform: extraction + distance filter."""
    from geodistpy_spark.operators import point_in_radius
    from geodistpy_spark.sources.documents import extract_geo_spans

    geo = extract_geo_spans(chunk)
    return point_in_radius(geo, (48.8566, 2.3522), 3_000_000.0).select(
        "doc_id", "span_idx", F.round("dist", 3).alias("dist_m"))


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


class TestCheckpointResume:
    def test_kill_resume_identical_rows(self, spark, docs, tmp_path):
        # uninterrupted reference run
        ref = CheckpointedRun(str(tmp_path / "ref"), n_chunks=6)
        ref.run(docs, _transform)
        expected = _canon(ref.result(spark).toPandas())

        # killed run: crash injected after chunk 2
        killed = CheckpointedRun(str(tmp_path / "killed"), n_chunks=6)
        with pytest.raises(RuntimeError, match="injected failure"):
            killed.run(docs, _transform, fail_after_chunk=2)
        assert killed.committed_chunks() == {0, 1, 2}

        # resume: only the remaining chunks execute
        resumed = CheckpointedRun(str(tmp_path / "killed"), n_chunks=6)
        executed = resumed.run(docs, _transform)
        assert executed == [3, 4, 5]

        got = _canon(resumed.result(spark).toPandas())
        pd.testing.assert_frame_equal(got, expected)

    def test_lineage_log_has_partition_metrics(self, spark, docs, tmp_path):
        run = CheckpointedRun(str(tmp_path / "lin"), n_chunks=3)
        run.run(docs, _transform)
        events = run.lineage()
        commits = [e for e in events if e["event"] == "chunk_committed"]
        assert len(commits) == 3
        for c in commits:
            assert c["input"]["n_rows"] > 0
            assert isinstance(c["partitions"], list)
            assert sum(p["rows"] for p in c["partitions"]) == c["rows_out"]

    def test_rerun_is_noop(self, spark, docs, tmp_path):
        run = CheckpointedRun(str(tmp_path / "noop"), n_chunks=3)
        assert len(run.run(docs, _transform)) == 3
        again = CheckpointedRun(str(tmp_path / "noop"), n_chunks=3)
        assert again.run(docs, _transform) == []

    def test_chunking_is_deterministic_partition(self, spark, docs):
        from geodistpy_spark.plans import chunk_of

        counts = (
            docs.withColumn("c", chunk_of("doc_id", 6))
            .groupBy("c").count().toPandas()
        )
        assert set(counts.c) == set(range(6))
        assert counts["count"].sum() == docs.count()


class TestCurationJob:
    def test_curation_pipeline_runs_and_resumes(self, spark, tmp_path):
        # job-level smoke of jobs/curation_pipeline.py via main(): the
        # curated survivor count equals the dedup_near(keep='best')
        # survivor count on the same corpus, and a re-run executes 0
        # chunks with the identical committed rows
        import io
        import sys as _sys
        from contextlib import redirect_stdout

        _sys.path.insert(0, "jobs")
        import curation_pipeline

        from geodistpy_spark.textops import dedup_near

        docs_path = "/root/testdata/sf0.001/documents.parquet"
        out = str(tmp_path / "curated")
        argv = ["--docs", docs_path, "--out", out, "--chunks", "2",
                "--threshold", "0.5"]
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert curation_pipeline.main(argv, stop_session=False) == 0
        first = buf.getvalue().strip().splitlines()[-1]
        assert "2 chunks executed" in first, first

        expected = dedup_near(spark.read.parquet(docs_path),
                              threshold=0.5, keep="best",
                              score_col="n_chars").count()
        # read back through the run's own result reader
        from geodistpy_spark.plans import CheckpointedRun

        res = CheckpointedRun(out, key_col="doc_id", n_chunks=2).result(spark)
        assert res.count() == expected
        assert res.filter(res.quality.isNull()).count() == 0

        buf2 = io.StringIO()
        with redirect_stdout(buf2):
            assert curation_pipeline.main(argv, stop_session=False) == 0
        second = buf2.getvalue().strip().splitlines()[-1]
        assert "0 chunks executed" in second, second
