"""Interleaved-documents source tests: extraction + span-sequence invariant."""

import numpy as np
from pyspark.sql import functions as F

from geodistpy_spark.sources import (
    explode_spans,
    extract_geo_spans,
    extract_media_spans,
    reassemble_spans,
    span_fingerprint,
    verify_span_sequence,
)


class TestExtraction:
    def test_schema_matches_input_hint(self, docs):
        assert [f.name for f in docs.schema.fields] == ["doc_id", "spans"]
        span_t = docs.schema["spans"].dataType.elementType
        assert [f.name for f in span_t.fields] == ["kind", "text", "media_ref", "offset"]

    def test_geo_extraction_parses_payloads(self, docs):
        geo = extract_geo_spans(docs).toPandas()
        assert len(geo) > 0
        assert geo.lat.between(-90, 90).all()
        assert geo.lon.between(-180, 180).all()
        # cross-check one doc's payload against a manual parse
        row = docs.filter(F.col("doc_id") == geo.doc_id.iloc[0]).collect()[0]
        span = row["spans"][int(geo.span_idx.iloc[0])]
        lat_s, lon_s = span["text"].split(",")
        assert float(lat_s) == geo.lat.iloc[0]
        assert float(lon_s) == geo.lon.iloc[0]

    def test_geo_extraction_with_cell_index(self, docs):
        from geodistpy_spark import grid as G

        geo = extract_geo_spans(docs, res=10).toPandas()
        exp = G.cell_id_np(geo.lat.values, geo.lon.values, 10)
        assert (geo.cell_r10.values == exp).all()

    def test_media_extraction(self, docs):
        media = extract_media_spans(docs).toPandas()
        assert len(media) > 0
        assert (media.media_scheme == "media").all()
        assert media.media_key.str.len().gt(0).all()

    def test_malformed_payloads_dropped(self, spark):
        bad = spark.createDataFrame(
            [("d1", [{"kind": "geo", "text": "not,anumber", "media_ref": None, "offset": 0},
                     {"kind": "geo", "text": "91.0,0.0", "media_ref": None, "offset": 10},
                     {"kind": "geo", "text": "10.0,20.0", "media_ref": None, "offset": 20}])],
            schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        geo = extract_geo_spans(bad).toPandas()
        assert len(geo) == 1 and geo.lat.iloc[0] == 10.0


class TestGeotag:
    def test_nearest_preceding_geo_attaches(self, spark):
        from geodistpy_spark.sources.documents import geotag_text_spans

        docs = spark.createDataFrame(
            [("d1", [
                {"kind": "text", "text": "before any geo", "media_ref": None, "offset": 0},
                {"kind": "geo", "text": "10.0,20.0", "media_ref": None, "offset": 10},
                {"kind": "text", "text": "near first geo", "media_ref": None, "offset": 20},
                {"kind": "geo", "text": "30.0,40.0", "media_ref": None, "offset": 30},
                {"kind": "media", "text": None, "media_ref": "media://x", "offset": 35},
                {"kind": "text", "text": "after second geo", "media_ref": None, "offset": 40},
            ])],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        out = geotag_text_spans(docs).toPandas().set_index("span_idx")
        assert np.isnan(out.loc[0].lat)                      # before any geo
        assert out.loc[2].lat == 10.0 and out.loc[2].lon == 20.0
        assert out.loc[5].lat == 30.0 and out.loc[5].lon == 40.0
        assert out.loc[5].geo_offset == 30


class TestSpanInvariant:
    """The per-row invariant vs the reference: span-sequence equality
    (kind, text, media_ref, order) through extract -> index -> join ->
    reassemble (BASELINE.json input_hint)."""

    def test_roundtrip_identity(self, docs):
        rt = reassemble_spans(explode_spans(docs))
        assert verify_span_sequence(docs, rt) == 0

    def test_fingerprint_detects_reorder(self, spark, docs):
        shuffled = explode_spans(docs).withColumn(
            "span_idx",
            F.when(F.col("span_idx") == 0, F.lit(1_000_000)).otherwise(F.col("span_idx")),
        )
        rt = reassemble_spans(shuffled)
        # docs with >= 2 spans get their first span moved to the end
        n_multi = docs.filter(F.size("spans") >= 2).count()
        assert verify_span_sequence(docs, rt) == n_multi

    def test_fingerprint_detects_drop(self, spark, docs):
        dropped = explode_spans(docs).filter(F.col("span_idx") != 0)
        rt = reassemble_spans(dropped)
        viol = verify_span_sequence(docs, rt)
        assert viol == docs.count()  # every doc lost its first span

    def test_extraction_is_nondestructive(self, docs):
        # running extraction does not alter the source relation
        before = span_fingerprint(docs).toPandas().sort_values("doc_id")
        _ = extract_geo_spans(docs).count()
        after = span_fingerprint(docs).toPandas().sort_values("doc_id")
        assert (before.span_fp.values == after.span_fp.values).all()

    def test_join_preserves_span_sequence(self, docs, places):
        """End-to-end: extract points, radius-join them, reassemble from
        the ORIGINAL spans of the joined docs — sequences intact."""
        from geodistpy_spark.operators import point_in_radius

        geo = extract_geo_spans(docs)
        hits = point_in_radius(geo, (48.85, 2.35), 2_000_000.0)
        hit_docs = docs.join(hits.select("doc_id").distinct(), on="doc_id", how="inner")
        rt = reassemble_spans(explode_spans(hit_docs))
        assert verify_span_sequence(hit_docs, rt) == 0


class TestSpanPath:
    def test_path_stats_hand_computed(self, spark):
        from geodistpy_spark import kernels as K
        from geodistpy_spark.sources.documents import span_path_stats

        def geo(off, lat, lon):
            return {"kind": "geo", "text": f"{lat},{lon}",
                    "media_ref": None, "offset": off}

        rows = [
            # 3-leg path Paris -> Berlin -> Munich -> Paris (span order,
            # interleaved with text spans that must be ignored)
            ("d1", [geo(0, 48.8566, 2.3522),
                    {"kind": "text", "text": "x", "media_ref": None, "offset": 5},
                    geo(10, 52.52, 13.405), geo(20, 48.1351, 11.582),
                    geo(30, 48.8566, 2.3522)]),
            # single geo span: path 0, net 0
            ("d2", [geo(0, 10.0, 20.0)]),
            # no geo spans: absent from the output
            ("d3", [{"kind": "text", "text": "t", "media_ref": None, "offset": 0}]),
        ]
        docs = spark.createDataFrame(
            rows, schema="doc_id string, spans array<struct<"
            "kind:string,text:string,media_ref:string,offset:int>>")
        out = span_path_stats(docs).toPandas().set_index("doc_id")
        assert set(out.index) == {"d1", "d2"}
        pts = [(48.8566, 2.3522), (52.52, 13.405), (48.1351, 11.582),
               (48.8566, 2.3522)]
        exp_mm = sum(
            int(round(float(K.great_circle([a[0]], [a[1]], [b[0]], [b[1]])[0]) * 1000))
            for a, b in zip(pts, pts[1:]))
        assert out.loc["d1", "n_points"] == 4
        assert abs(int(out.loc["d1", "path_mm"]) - exp_mm) <= 3  # per-leg mm rounding
        assert out.loc["d1", "net_m"] == 0.0  # closed loop: first == last
        assert out.loc["d2", "n_points"] == 1
        assert out.loc["d2", "path_mm"] == 0 and out.loc["d2", "net_m"] == 0.0

    def test_exact_variant_close_to_gc(self, spark):
        from geodistpy_spark.sources.documents import span_path_stats

        docs = spark.createDataFrame(
            [("d", [{"kind": "geo", "text": "0.0,0.0", "media_ref": None, "offset": 0},
                    {"kind": "geo", "text": "0.0,1.0", "media_ref": None, "offset": 1}])],
            schema="doc_id string, spans array<struct<"
            "kind:string,text:string,media_ref:string,offset:int>>")
        gc = span_path_stats(docs).toPandas().path_mm.iloc[0]
        ex = span_path_stats(docs, exact=True).toPandas().path_mm.iloc[0]
        # equatorial degree: ~111.32 km; Vincenty vs Lambert within meters
        assert abs(ex - 111_319_491) < 2_000  # mm
        assert abs(gc - ex) < 20_000


class TestSimplifyPath:
    def test_dp_guarantee_and_corner_survival(self, spark):
        import numpy as np

        from geodistpy_spark.sources import simplify_path

        # doc A: straight east-ward path with tiny wiggles (< eps) ->
        # only the endpoints survive. doc B: a sharp corner (>> eps)
        # must survive. doc C: 2 points pass through untouched.
        rows = []
        for i in range(20):
            rows.append(("A", i, 10.0 + (0.0001 if i % 2 else -0.0001),
                         20.0 + i * 0.01))
        rows += [("B", 0, 0.0, 0.0), ("B", 1, 0.0, 1.0), ("B", 2, 1.0, 1.0)]
        rows += [("C", 0, 5.0, 5.0), ("C", 1, 5.1, 5.1)]
        df = spark.createDataFrame(rows, "doc_id string, span_idx long, lat double, lon double")
        out = simplify_path(df, epsilon_m=100.0).toPandas()
        a = out[out.doc_id == "A"].sort_values("span_idx")
        assert list(a.span_idx) == [0, 19]           # wiggles ~11m < 100m
        b = out[out.doc_id == "B"].sort_values("span_idx")
        assert list(b.span_idx) == [0, 1, 2]         # corner ~78km >> eps
        c = out[out.doc_id == "C"]
        assert len(c) == 2
        # eps=0 keeps everything non-collinear
        out0 = simplify_path(df, epsilon_m=0.0).toPandas()
        assert len(out0[out0.doc_id == "A"]) == 20
        import pytest as _p
        with _p.raises(ValueError, match="epsilon"):
            simplify_path(df, epsilon_m=-1.0)

    def test_dp_error_bound_random_paths(self, spark):
        # property: every dropped point is within eps cross-track of the
        # segment between its surviving neighbors
        import numpy as np

        from geodistpy_spark import kernels as K
        from geodistpy_spark.sources import simplify_path

        rng = np.random.default_rng(23)
        rows = []
        for d in range(10):
            la, lo = rng.uniform(-60, 60), rng.uniform(-170, 170)
            for i in range(30):
                la += rng.uniform(-0.05, 0.05)
                lo += rng.uniform(0.0, 0.08)
                rows.append((str(d), i, float(la), float(lo)))
        df = spark.createDataFrame(rows, "doc_id string, span_idx long, lat double, lon double")
        eps = 500.0
        out = simplify_path(df, epsilon_m=eps).toPandas()
        byd = {str(d): [r for r in rows if r[0] == str(d)] for d in range(10)}
        for d, pts in byd.items():
            kept = sorted(out[out.doc_id == d].span_idx)
            assert kept[0] == 0 and kept[-1] == 29
            for a, b in zip(kept, kept[1:]):
                for i in range(a + 1, b):
                    # dropped point within eps of chord a->b (via the
                    # triangle bound: min leg distance <= xtrack + slop)
                    d_a = K.great_circle(np.array([pts[a][2]]), np.array([pts[a][3]]),
                                         np.array([pts[i][2]]), np.array([pts[i][3]]))[0]
                    d_b = K.great_circle(np.array([pts[b][2]]), np.array([pts[b][3]]),
                                         np.array([pts[i][2]]), np.array([pts[i][3]]))[0]
                    chord = K.great_circle(np.array([pts[a][2]]), np.array([pts[a][3]]),
                                           np.array([pts[b][2]]), np.array([pts[b][3]]))[0]
                    # Heron altitude of the planar-ized triangle ~ cross-track
                    s = (d_a + d_b + chord) / 2
                    area = max(s * (s - d_a) * (s - d_b) * (s - chord), 0.0) ** 0.5
                    alt = 2 * area / max(chord, 1e-9)
                    assert alt <= eps * 1.1, (d, i, alt)

    def test_doubling_back_point_survives(self, spark):
        # segment-clamped metric regression (round-3 advice): a path
        # that doubles back — (0,0)->(0,5)->(0,0.001) — has its middle
        # point 555 km from the SEGMENT endpoints even though its raw
        # cross-track vs the infinite great circle is ~0, so DP must
        # keep it at any reasonable epsilon
        from geodistpy_spark.sources import simplify_path

        df = spark.createDataFrame(
            [("d", 0, 0.0, 0.0), ("d", 1, 0.0, 5.0), ("d", 2, 0.0, 0.001)],
            "doc_id string, span_idx long, lat double, lon double")
        out = simplify_path(df, epsilon_m=100.0).toPandas()
        assert sorted(out.span_idx) == [0, 1, 2]

    def test_matches_golden_kept_set(self, spark):
        # committed independent scalar-DP golden over the fixture docs
        import pyspark.sql.functions as F

        from geodistpy_spark.sources import simplify_path
        from geodistpy_spark.sources.documents import extract_geo_spans
        from geodistpy_spark.sources.fixtures import ensure_default_fixtures

        ensure_default_fixtures()
        docs = spark.read.parquet("fixtures/documents_interleaved.parquet")
        eng = simplify_path(extract_geo_spans(docs), epsilon_m=10_000.0) \
            .select("doc_id", F.col("span_idx").cast("long").alias("span_idx"))
        gold = spark.read.parquet("fixtures/golden/simplify.parquet")
        assert eng.exceptAll(gold).count() == 0
        assert gold.exceptAll(eng).count() == 0


class TestVerifyRoundtrip:
    def test_single_pass_clean_and_flagged(self, spark):
        from geodistpy_spark.sources.documents import verify_roundtrip
        from geodistpy_spark.sources.fixtures import ensure_default_fixtures

        ensure_default_fixtures()
        docs = spark.read.parquet("fixtures/documents_interleaved.parquet")
        assert verify_roundtrip(docs.limit(200)) == 0
        # empty spans cannot survive explode->reassemble: flagged
        empty = spark.createDataFrame([("e", [])], schema=docs.schema)
        assert verify_roundtrip(empty) == 1

    def test_adversarial_spans_roundtrip_exact(self, spark):
        # duplicate offsets and null span FIELDS must roundtrip
        # fingerprint-exact (array_sort keys on span_idx, the struct's
        # first field, so payload nulls/collisions cannot reorder)
        schema = ("doc_id long, spans array<struct<kind:string,"
                  "text:string,media_ref:string,offset:int>>")
        docs = spark.createDataFrame([
            (1, [("text", "a", None, 0), ("geo", None, "g:1", 1),
                 ("text", "b", None, 2)]),
            (4, [("text", None, None, 0), ("text", None, None, 0)]),
        ], schema)
        out = reassemble_spans(explode_spans(docs))
        fp0 = {r.doc_id: r.span_fp
               for r in span_fingerprint(docs).collect()}
        fp1 = {r.doc_id: r.span_fp
               for r in span_fingerprint(out).collect()}
        assert fp0 == fp1
