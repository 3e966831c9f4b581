"""Text analysis: language ID, quality scoring, token stats, fingerprints.

All pure column expressions (JVM-side) so they run at scan speed — these
are the per-document map stages of a training-data pipeline and must never
leave whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword sets for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "fr": ("le", "la", "et", "les", "de"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "y", "de"),
    "zh": ("的", "了", "是", "在", "我"),
}

FP_P = 1_000_000_007


def token_col(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(token_col(col), lambda t: t.isin(*words)))


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_hits(col, ws) for lang, ws in LANG_STOPWORDS.items()}


def predict_lang(col: Column) -> Column:
    """argmax of stopword hits, ties broken by language code order; no hit
    at all -> 'und' (undetermined)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase features + a composite
    quality score in [0,1] for filter thresholds."""
    t = F.col(text_col)
    toks = token_col(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop_en = stopword_hits(t, LANG_STOPWORDS["en"])
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_en / F.greatest(n_tokens, F.lit(1)) * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct / F.greatest(n_chars, F.lit(1)) * 10, F.lit(1.0))) * 0.3
    )
    return df.select(
        "*",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(upper / F.greatest(n_chars, F.lit(1)), 4).alias("upper_ratio"),
        F.round(stop_en / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: word pieces split on non-alnum plus a
    length-based surcharge (a word of n chars ~ ceil(n/4) BPE tokens)."""
    pieces = F.filter(F.split(col, r"[^\p{L}\p{N}]+"), lambda p: p != "")
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.ceil(F.length(p) / 4.0).cast("long"),
    )


def doc_fingerprint(col: Column) -> Column:
    """Order-sensitive rolling hash over the token stream (content
    fingerprint; same token sequence <=> same fingerprint mod collisions).

    h = fold(tokens, 0, h*31 + len(tok)*7 + ascii(tok[0])) mod P — kept in
    [0, P) so 64-bit arithmetic never overflows (ANSI-safe), and expressible
    identically in ANSI SQL for the oracle.
    """
    return F.aggregate(
        token_col(col),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(
            acc * 31 + F.length(tok) * 7 + F.ascii(F.substring(tok, 1, 1)),
            F.lit(FP_P),
        ),
    )
