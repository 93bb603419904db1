"""Text-analysis operators over the documents table (M4 north star):
language-ID, quality scoring, token counting, fingerprinting.

Every operator is a pure built-in expression tree (arrays +
higher-order functions + regex), so it vectorizes in codegen and has an
exact ANSI-SQL twin for the DuckDB oracle. No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.functions.textfns import (
    fingerprint, token_count, tokens)

# Small per-language function-word lists for the n-gram/stopword
# language heuristic. Deliberately tiny and hardcoded: the operator's
# point is the *shape* (set-overlap scoring + argmax), which is what a
# real lang-ID (fastText-style) would replace.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "for", "it"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"),
    "es": ("el", "la", "los", "las", "y", "de", "un", "una", "es", "para"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"),
}


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace token count + distinct token count per document.

    The token array is materialized as a named column first: Spark does
    no common-subexpression elimination inside higher-order functions,
    so an inlined ``tokens(text)`` re-runs the regex split per
    reference (see functions.textfns.word_ngrams_from_tokens)."""
    return (documents
            .withColumn("__toks", tokens(F.col("text")))
            .select("doc_id",
                    F.size("__toks").alias("n_tokens"),
                    F.size(F.array_distinct("__toks"))
                    .alias("n_distinct_tokens")))


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, lexical diversity, stopword
    rate, punctuation/alpha balance — the standard cheap pre-filters a
    training-data pipeline applies before expensive model scoring."""
    toks = F.col("__toks")  # named column — see token_counts note
    documents = documents.withColumn("__toks", tokens(F.col("text")))
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    diversity = F.when(n_tok > 0, n_distinct / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(n_stop / F.lit(5.0), F.lit(1.0))
    quality = F.round(
        0.3 * length_score + 0.3 * diversity
        + 0.2 * alpha_ratio + 0.2 * stop_score, 6)
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(diversity, 6).alias("lexical_diversity"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        n_stop.alias("n_stopword_hits"),
        quality.alias("quality_score"))


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language heuristic: score each language by
    distinct-token overlap with its function-word list; argmax with
    deterministic (alphabetical) tie-break; 'und' (undetermined) when
    no list matches at all."""
    # distinct-token array via named column (referenced once per
    # language — inline it would re-split per score; see token_counts)
    documents = documents.withColumn(
        "__dt", F.array_distinct(tokens(F.lower(F.col("text")))))
    distinct_toks = F.col("__dt")
    scores = {
        lang: F.size(F.array_intersect(
            distinct_toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in sorted(LANG_STOPWORDS.items())
    }
    best = F.greatest(*scores.values())
    predicted = F.lit("und")
    # Reverse alphabetical fold so the earliest language wins ties.
    for lang in sorted(scores, reverse=True):
        predicted = F.when(scores[lang] == best, F.lit(lang)).otherwise(predicted)
    predicted = F.when(best == 0, F.lit("und")).otherwise(predicted)
    out_cols = [F.col("doc_id")]
    out_cols += [scores[lang].alias(f"score_{lang}") for lang in sorted(scores)]
    out_cols.append(predicted.alias("predicted_lang"))
    return documents.select(*out_cols)


def fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic md5 fingerprint of the normalized text — the
    document-identity primitive exact dedup and incremental loads key
    on."""
    return documents.select("doc_id", fingerprint(F.col("text")).alias("fp"))
