"""Text-analysis columns for training-data curation.

No reference analog (fastq-dupaway §2.7: scalar function library absent);
these are the curation primitives a 100 TB text pipeline needs around the
dedup core: token counting, quality scoring, language-ID heuristics,
document fingerprinting. Everything here is built-in column expressions
(JVM, whole-stage codegen) — deliberately portable to ANSI SQL so the
driver's DuckDB oracle can verify them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: small fixed stopword list used by the quality score (portable constant)
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokens. split on single space — matches the oracle's
    string_split; synthetic corpora are single-spaced."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


#: whitespace-RUN tokenizer class — EXPLICIT [ \t\r\n\f]+ rather than \s:
#: Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte on this ASCII
#: class but diverge on \s flag/Unicode extensions ((?U) is Java-only),
#: so the explicit class is what keeps the variant oracle-provable.
WS_RUN_RE = "[ \\t\\r\\n\\f]+"


def tokens_ws(text: Column) -> Column:
    """Whitespace-RUN tokens for real-world corpora (round-5 verdict item
    7): splits on runs of spaces/tabs/newlines and drops the empty edge
    tokens that leading/trailing whitespace yields in both engines. The
    single-space `tokens` remains the default (documented oracle
    constraint for the synthetic single-spaced corpora); this is the
    variant to feed the shingle/simhash/quality stack on scraped text."""
    return F.filter(F.split(text, WS_RUN_RE), lambda t: t != "")


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_ws(text))


def avg_token_len(text: Column) -> Column:
    """Average token length, rounded for cross-engine float stability."""
    return F.round(
        (F.length(text) - token_count(text) + 1) / token_count(text), 4
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(n_stop / F.size(toks), 4)


def quality_score_x10k(text: Column) -> Column:
    """Length/stopword composite scaled to [0, 10000] as an integer.

    Integer output via floor (not decimal rounding): both engines compute
    the identical IEEE double expression, so floor is bit-stable across
    Spark and the DuckDB oracle — round-half behavior differs between
    engines and flips the 4th decimal on midpoints."""
    n_tok = token_count(text)
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    len_component = F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0))
    stop_component = F.least(
        F.lit(4.0) * n_stop / n_tok, F.lit(1.0)
    )
    return F.floor((len_component + stop_component) / 2 * 10000).cast("int")


def lang_guess(text: Column) -> Column:
    """Marker-token language heuristic (n-gram language-ID stand-in; the
    real corpus carries a lang column — this derives a guess from content
    alone). Checks distinctive function words per language."""
    toks = tokens(F.lower(text))
    has = lambda *ws: F.size(F.filter(toks, lambda t: t.isin(*ws))) > 0  # noqa: E731
    return (
        F.when(has("der", "und", "nicht", "das"), "de")
        .when(has("le", "la", "et", "les"), "fr")
        .when(has("el", "los", "que", "para"), "es")
        .when(has("的", "是", "了"), "zh")
        .otherwise("en")
    )


#: BPE-ish pre-tokenization pattern: alpha runs, digit runs, single
#: non-alphanumeric marks — the classic GPT-2-style split coarsened to a
#: regex subset with identical semantics in Java regex (Spark) and RE2
#: (DuckDB): disjoint character classes, no ambiguity, no lookarounds.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_tokens(text: Column) -> Column:
    """Subword-ish tokens via regexp_extract_all (JVM, codegen)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def fingerprint(text: Column, width: int = 16) -> Column:
    """Document fingerprint: xxhash64 of the `width`-token normalized
    prefix — a cheap near-front hash used for fast candidate bucketing
    (engine-specific hash; not oracle-checked). For REAL rolling-hash
    document fingerprinting (Schleimer et al. winnowing, oracle-checked)
    use detectors/winnow.winnow_fingerprints."""
    head = F.array_join(F.slice(tokens(F.lower(text)), 1, width), " ")
    return F.xxhash64(head)


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(c))
        .withColumn("avg_token_len", avg_token_len(c))
        .withColumn("stopword_ratio", stopword_ratio(c))
        .withColumn("quality_score_x10k", quality_score_x10k(c))
        .withColumn("lang_guess", lang_guess(c))
    )
