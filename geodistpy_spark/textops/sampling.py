"""Dataset-hygiene operators: benchmark decontamination + reproducible
splits — the two bookkeeping ops every large-scale training-data
pipeline runs on every refresh.

Both are pure Catalyst (no UDFs): decontamination is an exact word
n-gram equi-join (the shape Dolma/C4-style pipelines use — shingle both
corpora, shuffle on the shingle, verify by equality, so there are no
hash-collision false positives); splits are md5-keyed so they are
deterministic across engines, runs and cluster sizes, and keyed per
DOCUMENT (every row of a key lands on the same side — no leakage when a
table carries multiple rows per document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles


def ngram_contamination(docs: DataFrame, probes: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        probe_id_col: str = "probe_id",
                        probe_text_col: str = "text",
                        n: int = 5) -> DataFrame:
    """Training docs sharing at least one word ``n``-gram with a probe
    (benchmark/eval) corpus: (doc_id, probe_id, n_shared) where n_shared
    counts DISTINCT shared n-grams.

    Plan: shingle both sides (distinct word n-grams per doc), equi-join
    on the shingle STRING (exact — no hash-collision false positives),
    one groupBy. At scale the shuffle carries (id, shingle) pairs only;
    the probe side is typically tiny (benchmarks) and broadcasts.
    Filtering/thresholding (e.g. ``n_shared >= k`` or dropping
    ``doc_id == probe_id`` when the corpora overlap) is the caller's
    policy.
    """
    d = shingles(docs.select(F.col(id_col), F.col(text_col)), text_col, n)
    p = shingles(
        probes.select(F.col(probe_id_col).alias("__pid"),
                      F.col(probe_text_col).alias("__ptext")),
        "__ptext", n,
    ).withColumnRenamed("shingle", "__psh")
    joined = d.join(p, d["shingle"] == p["__psh"], "inner")
    return (
        joined.groupBy(F.col(id_col), F.col("__pid").alias(probe_id_col))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(docs: DataFrame, probes: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  probe_id_col: str = "probe_id",
                  probe_text_col: str = "text",
                  n: int = 5, min_shared: int = 1) -> DataFrame:
    """Drop every training doc contaminated by the probe corpus (shares
    ``>= min_shared`` distinct word n-grams with ANY probe). All columns
    preserved; anti-join on the flagged id set."""
    hits = ngram_contamination(docs, probes, id_col, text_col,
                               probe_id_col, probe_text_col, n)
    flagged = hits.filter(F.col("n_shared") >= min_shared).select(id_col).distinct()
    return docs.join(flagged, on=id_col, how="left_anti")


def hash_split(df: DataFrame, key_col: str = "doc_id",
               val_frac: float = 0.1, salt: str = "v1",
               out: str = "split") -> DataFrame:
    """Deterministic train/val assignment: ``out`` is 'val' iff the
    first 4 hex digits of md5(salt:key) fall below val_frac * 65536.

    md5-keyed (not Spark's hash/xxhash64) so the SAME assignment is
    reproducible in any engine, and keyed by ``key_col`` so every row of
    a document lands on one side. Change ``salt`` to draw an independent
    split. Resolution is 1/65536 (~0.0015%% of val_frac granularity).
    """
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))),
            1, 4),
        16, 10,
    ).cast("long")
    cut = int(round(val_frac * 65536))
    return df.withColumn(
        out, F.when(bucket < cut, F.lit("val")).otherwise(F.lit("train")))


def stratified_sample(df: DataFrame, strata_col: str,
                      key_col: str = "doc_id", frac: float = 0.1,
                      salt: str = "v1", exact: bool = True) -> DataFrame:
    """Deterministic proportional stratified sample: each stratum
    contributes the same fraction, selected by md5(salt:key) so the draw
    is reproducible across engines, runs and cluster sizes. All columns
    preserved.

    ``exact=True`` keeps EXACTLY ceil(frac * n_stratum) rows per stratum
    (rank by hash inside each stratum — one shuffle on ``strata_col``;
    window sort per stratum, so at extreme scale a single giant stratum
    sorts on few tasks). ``exact=False`` thresholds the hash directly
    (hash_split-style): no window, fully scale-safe, binomial jitter
    around the quota.
    """
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    if not exact:
        bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
        return df.filter(bucket < int(round(frac * 65536)))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    wall = Window.partitionBy(strata_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wall))
        .filter(F.col("__rn") <= F.ceil(F.lit(float(frac)) * F.col("__n")))
        .drop("__rn", "__n")
    )
