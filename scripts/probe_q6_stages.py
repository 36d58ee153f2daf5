"""Stage-level decomposition of q6 (minhash near-dup) at two
parallelism levels — the same forensic pattern that attributed q7's
sub-0.8 sweep efficiency to the host's level-independent scan
bandwidth (scripts/calibrate_io.py).

q6 = near_duplicates_minhash(docs, threshold=0.5) is four stages over
one cached shingle relation:

  A. scan + tokenize + shingle explode + cache      (corpus-sized)
  B. minhash signatures (12 seed-hash mins, groupBy) (corpus-sized)
  C. band explode + self-join -> candidate pairs     (small output)
  D. exact-Jaccard verify joins through the pairs    (pairs x shingles)

Each stage is timed separately at local[2] and local[8] on the SAME
pre-generated sweep corpus, in separate JVMs, so the per-stage
efficiency shows WHERE the 4x core budget stops helping. Per the sweep
protocol this must run at quiet load and never concurrently with a
sweep level.

Usage: python scripts/probe_q6_stages.py [n_docs]   (default 800_000)
Writes BENCH/q6_stage_probe.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

level = int(sys.argv[1])
src = sys.argv[2]

spark = (
    SparkSession.builder.master(f"local[{{level}}]")
    .appName(f"q6probe{{level}}")
    .config("spark.sql.shuffle.partitions", str(max(level * 4, 8)))
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from geodistpy_spark.textops.dedup import (
    shingles, minhash_signatures, lsh_candidate_pairs, ngram_jaccard)

docs = spark.read.parquet(src)
out = {{}}

def timed(name, fn):
    t0 = time.perf_counter()
    r = fn()
    out[name] = round(time.perf_counter() - t0, 3)
    return r

# A: corpus-sized explode, materialized into the block-manager cache.
# Mirrors the production pipeline: shingle strings collapse to xxhash64
# longs BEFORE the cache (set Q6_PROBE_STRINGS=1 for the legacy string
# relation the round-5 baseline probe measured).
sh = shingles(docs.select("doc_id", "text"), "text", 3)
if not os.environ.get("Q6_PROBE_STRINGS"):
    sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
sh = sh.cache()
timed("A_shingle_cache", lambda: sh.count())

# B: signatures from the cached relation (12 mins + one groupBy)
sig = minhash_signatures(docs, _shingles=sh)
timed("B_minhash_groupby", lambda: sig.agg(
    F.sum(F.col("mh0").cast("decimal(38,0)")).alias("s")).collect())

# C: band explode + self-join (pairs are small; count forces the join)
pairs = lsh_candidate_pairs(docs, _shingles=sh).cache()
n_pairs = timed("C_lsh_pairs", lambda: pairs.count())

# D: verify — the production small-pairs broadcast/array strategy
# (set Q6_PROBE_RELATIONAL=1 for the legacy two-join form that
# shuffles the whole cached relation twice)
ver = ngram_jaccard(docs, pairs, _shingles=sh,
                    small_pairs=not os.environ.get("Q6_PROBE_RELATIONAL"))
timed("D_jaccard_verify", lambda: ver.filter(
    F.col("jaccard") >= 0.5).count())

out["n_pairs"] = n_pairs
print("PROBE_JSON:" + json.dumps(out))
spark.stop()
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    sys.path.insert(0, _REPO)
    from bench import ensure_bench_texts  # reuses the sweep corpus

    src = ensure_bench_texts(n)
    child = os.path.join("/tmp", "q6_probe_child.py")
    with open(child, "w") as fh:
        fh.write(_CHILD.format(repo=_REPO))

    res = {"n_docs": n, "levels": {}}
    for level in (8, 2):
        os.system("sync")
        p = subprocess.run(
            [sys.executable, child, str(level), src],
            capture_output=True, text=True, cwd=_REPO)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("PROBE_JSON:")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"probe failed at local[{level}]")
        res["levels"][str(level)] = json.loads(line[0][len("PROBE_JSON:"):])
        print(f"local[{level}]: {res['levels'][str(level)]}", flush=True)

    lo, hi = res["levels"]["2"], res["levels"]["8"]
    res["stage_efficiency"] = {
        k: round(lo[k] / (4 * hi[k]), 3)
        for k in lo if k.startswith(("A_", "B_", "C_", "D_")) and hi.get(k)
    }
    path = os.path.join(_REPO, "BENCH", "q6_stage_probe.json")
    with open(path, "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
