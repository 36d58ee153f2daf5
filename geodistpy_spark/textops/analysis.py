"""Text-analysis operators: language ID, quality scoring, token counts,
document fingerprinting. All pure Catalyst column math (codegen'd) with
exact ANSI-SQL mirrors for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokenize

# tiny seeded stopword lexicons for the n-gram/stopword-hit language
# heuristic (public common-word lists)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "la": ["lorem", "ipsum", "dolor", "sit", "amet", "et", "ut", "ad", "ex", "ea"],
}


def token_count(df: DataFrame, text_col: str = "text",
                out: str = "n_tokens") -> DataFrame:
    """Whitespace token count per document."""
    return tokenize(df, text_col).withColumn(out, F.size("words")).drop("words")


#: BPE-ish pre-tokenization classes: letter runs, digit runs, symbol runs
#: (GPT-2-style word/number/punct split, ASCII classes only so the SAME
#: pattern runs under Java regex (Spark) and RE2 (DuckDB oracle))
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]+"


def token_count_bpe(df: DataFrame, text_col: str = "text",
                    out: str = "n_tokens_bpe") -> DataFrame:
    """BPE-ish token count: length of the regex pre-tokenization
    (letter/digit/symbol runs) — the usual upper-anchor estimate for
    subword-tokenizer budgets, a few times coarser than real BPE but
    monotone with it. Pure codegen (regexp_extract_all + size)."""
    return df.withColumn(
        out, F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))))


def trigram_logprob(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    out: str = "tri_logprob") -> DataFrame:
    """Perplexity-style quality signal: mean ln-probability of a doc's
    character trigrams under the CORPUS's own trigram distribution
    (KenLM-style filtering without external models — gibberish and
    boilerplate score far from the corpus mode).

    Plan: one explode to (doc, trigram) rows, one global count agg
    (map-side combined; trigram vocab is bounded ~ charset^3), one join
    back (the count table is small -> broadcast), one per-doc avg.
    Self-scoring means every trigram is observed (no smoothing branch).
    Docs shorter than 3 chars get NULL.
    """
    tri = df.select(
        F.col(id_col),
        F.explode(
            # size guard: Spark's sequence(1, 0) is DESCENDING [1, 0]
            F.expr(
                f"CASE WHEN length(lower({text_col})) >= 3 THEN "
                f"transform(sequence(1, length(lower({text_col})) - 2), "
                f"i -> substring(lower({text_col}), i, 3)) "
                "ELSE array() END"
            )
        ).alias("tg"),
    )
    counts = tri.groupBy("tg").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("tot"))
    scored = (
        tri.join(F.broadcast(counts), on="tg")
        .crossJoin(F.broadcast(total))
        .select(id_col, (F.log(F.col("n") / F.col("tot"))).alias("__lp"))
        .groupBy(id_col)
        .agg(F.avg("__lp").alias(out))
    )
    return df.select(id_col).join(scored, on=id_col, how="left")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:

    - n_chars, n_tokens, avg_token_len
    - alpha_ratio (letters / chars), space_ratio
    - stopword_ratio (hits in the combined lexicon / tokens)
    - quality: 0..1 composite (length-saturating * alpha * stopword mix)
    """
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    toks = tokenize(df, text_col)
    scored = (
        toks.withColumn("n_chars", F.length(text_col))
        .withColumn("n_tokens", F.size("words"))
        .withColumn(
            "alpha_ratio",
            F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
            / F.greatest(F.length(text_col), F.lit(1)),
        )
        .withColumn(
            "stop_hits",
            F.size(F.filter("words", lambda w: w.isin(all_stop))),
        )
        .withColumn(
            "stopword_ratio",
            F.col("stop_hits") / F.greatest(F.col("n_tokens"), F.lit(1)),
        )
        .withColumn(
            "avg_token_len",
            F.col("n_chars") / F.greatest(F.col("n_tokens"), F.lit(1)),
        )
    )
    quality = (
        F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.col("alpha_ratio") * 0.4
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.2
    )
    return scored.withColumn("quality", quality).drop("words")


def language_id(df: DataFrame, text_col: str = "text",
                out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language heuristic: per language, count lexicon hits
    among tokens; predict the argmax (ties -> lexicographically first
    language, deterministic).
    """
    toks = tokenize(df, text_col)
    hit_cols = [
        F.size(F.filter("words", lambda w: w.isin(ws))).alias(f"hits_{lang}")
        for lang, ws in sorted(LANG_STOPWORDS.items())
    ]
    scored = toks.select("*", *hit_cols).drop("words")
    langs = sorted(LANG_STOPWORDS)
    # argmax with deterministic ties: fold over (hits, lang) structs
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for lang in langs:
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return scored.withColumn(out, pred)


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token list — robust to token reordering, sensitive to vocabulary.
    """
    toks = tokenize(df, text_col)
    return toks.withColumn(
        out,
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("words")))),
    ).drop("words")


def rolling_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 4,
                         keep_every: int = 8) -> DataFrame:
    """Winnowing-style rolling shingle fingerprints: hash every k-token
    window, keep the hashes that are 0 mod keep_every (deterministic
    sampling). Output: (id, fp) rows — the sampled fingerprint set.
    """
    from .dedup import shingles

    sh = shingles(df.select(id_col, text_col), text_col, k)
    hashed = sh.select(
        id_col,
        F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("long").alias("fp"),
    )
    return hashed.filter(F.col("fp") % keep_every == 0).distinct()
