"""Text analysis operators (SURVEY.md §2 B.10): language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure SQL expressions (codegen, no UDF) and all deterministic —
each has an exact DuckDB twin in plans/llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the heuristic language ID —
# presence-count of marker tokens decides (deterministic tie-break by
# fixed language order). A real pipeline would use fastText/cld3; the
# Spark plumbing (tokenize → score → argmax) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with", "fast"],
    "es": ["el", "la", "los", "datos", "con"],
    "de": ["der", "die", "das", "und", "mit"],
    "fr": ["le", "les", "des", "avec", "donnees"],
    "zh": ["shuju", "chaxun", "biao", "hang", "lie"],
}

# BPE-ish token pattern: letter runs, digit runs, or single
# non-alphanumeric marks — the classic pre-tokenizer split.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (size of split)."""
    return F.size(F.split(text, " "))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer count via regexp_extract_all."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features — the
    standard cheap filters of a pretraining data pipeline."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_ws = ws_token_count(text)
    stop = F.array([F.lit(s) for s in LANG_MARKERS["en"]])
    toks = F.split(text, " ")
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^a-zA-Z0-9 ]", ""))
    return df.select(
        *df.columns,
        n_chars.alias("q_chars"),
        n_ws.alias("q_ws_tokens"),
        (n_chars.cast("double") / n_ws).alias("q_chars_per_token"),
        (n_punct.cast("double") / n_chars).alias("q_punct_ratio"),
        (n_stop.cast("double") / F.lit(len(LANG_MARKERS["en"]))).alias(
            "q_stopword_hit_ratio"
        ),
    )


def predict_lang(text_col: str) -> Column:
    """Marker-lexicon language ID: argmax over per-language hit
    counts, first-listed language wins ties, 'und' when no marker
    hits. Pure CASE/array expression — SQL-twin-able."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array([F.lit(m) for m in markers]))
        )
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    expr = F.lit("und")
    # reversed so the FIRST language in order wins ties
    for lang in reversed(langs):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def positional_fingerprint(text_col: str, modulus: int = 1_000_000_007) -> Column:
    """Deterministic document fingerprint: Σ (ascii(c_i)+1)·i over
    characters, mod p — an order-sensitive rolling digest computable
    as one higher-order-function fold, with an exact SQL twin.
    (Content-equal ⇒ equal; reordering changes it, unlike a bag hash.)"""
    # 2-arg transform lambda receives (element, 0-based index) — one
    # linear pass; substring(text, i, 1) per index would rescan the
    # string per char (quadratic on long docs).
    return F.expr(
        f"aggregate(transform(split({text_col}, ''), "
        f"(c, i) -> (ascii(c) + 1) * cast(i + 1 as bigint)), "
        f"cast(0 as bigint), (acc, x) -> acc + x) % {modulus}"
    )
