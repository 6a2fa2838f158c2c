"""Repetition-based document quality signals (Gopher-style).

Rae et al.'s Gopher rules (arXiv:2112.11446 §A1.1) filter web documents by
how repetitious they are: fraction of duplicated words, fraction of the
text accounted for by the single most frequent word, and duplicate n-gram
fractions. These are the workhorse quality gates of a pretraining
pipeline, so they must run as ONE pass over the corpus.

Plan shape at 100 TB: ONE exchange end-to-end, and it moves the COMPACT
(un-exploded) documents — the words array is materialized once per doc,
the docs are hash-partitioned by doc_id before the explode, and both
downstream aggregates ((doc, word) then (doc)) are satisfied by that
partitioning (subset clustering rule), so neither re-shuffles the
exploded words. The 2-gram fractions are pure array ops in the same
projection. Zero Python.

Tokenization matches the dedup family (``normalized_text`` → whitespace
split) so these signals compose with the dedup/decontam operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def _words(text_col: str) -> Column:
    toks = F.split(normalized_text(text_col), " ")
    return F.filter(toks, lambda t: F.length(t) > 0)


def _raw_2grams(words: Column) -> Column:
    # F.sequence(0, -1) would generate a DESCENDING sequence, so guard the
    # one-word case explicitly instead of relying on greatest().
    idx = F.sequence(F.lit(0), F.size(words) - 2)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.get(words, i), F.get(words, i + 1)))
    return F.when(F.size(words) >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def _staged(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize words → bigrams → scalars in SEPARATE projections.

    Inlining these as one big select duplicates the split/filter/transform
    expression tree into every consumer — including once per EXPLODED row
    — and higher-order functions are interpreted (no codegen, no common-
    subexpression elimination), which turns a 500-doc input into minutes
    of regex re-evaluation. Staged selects keep each array computed once
    per document: CollapseProject refuses to merge projections whose
    non-cheap outputs are referenced more than once downstream.
    """
    # Shuffle the COMPACT raw docs on doc_id FIRST: HashPartitioning
    # (doc_id) satisfies ClusteredDistribution for BOTH downstream
    # aggregates — (doc_id, word) by the subset rule and (doc_id) exactly —
    # so the whole signal computation runs in one exchange of un-exploded
    # rows instead of two exchanges of exploded words. Repartitioning
    # before the tokenization also spreads the regex/split work across
    # cores when the corpus arrives as a handful of parquet files.
    w0 = docs.repartition(F.col(id_col)).select(
        F.col(id_col), _words(text_col).alias("__w")
    )
    w1 = w0.select(id_col, "__w", _raw_2grams(F.col("__w")).alias("__g2"))
    return w1.select(
        F.col(id_col),
        F.explode(F.col("__w")).alias("__word"),
        F.size("__g2").alias("__n2"),
        F.size(F.array_distinct("__g2")).alias("__n2d"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals:

    - ``n_words`` / ``n_distinct_words``
    - ``dup_word_frac``  = 1 − distinct/total words (Gopher "duplicate
      word fraction")
    - ``top_word_frac``  = occurrences of the most frequent word / total
      words (Gopher "top word fraction"; docs dominated by one token are
      boilerplate)
    - ``dup_2gram_frac`` = 1 − distinct/total word 2-grams ("duplicate
      bigram fraction"; catches repeated phrases that distinct words miss)

    Documents whose normalized text is empty are dropped (they fail any
    downstream quality gate regardless).
    """
    base = _staged(docs, id_col, text_col)
    per_word = base.groupBy(id_col, "__word").agg(
        F.count(F.lit(1)).alias("__c"),
        F.max("__n2").alias("__n2"),
        F.max("__n2d").alias("__n2d"),
    )
    agg = per_word.groupBy(id_col).agg(
        F.sum("__c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("__c").alias("__top"),
        F.max("__n2").alias("__n2"),
        F.max("__n2d").alias("__n2d"),
    )
    return agg.select(
        id_col,
        "n_words",
        "n_distinct_words",
        F.round(1 - F.col("n_distinct_words") / F.col("n_words"), 6).alias("dup_word_frac"),
        F.round(F.col("__top") / F.col("n_words"), 6).alias("top_word_frac"),
        F.when(F.col("__n2") > 0, F.round(1 - F.col("__n2d") / F.col("__n2"), 6))
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 1_000_000,
    min_quality: float | None = 0.5,
    max_dup_word_frac: float | None = 0.5,
    max_top_word_frac: float | None = 0.3,
    max_dup_2gram_frac: float | None = 0.5,
    langs: tuple[str, ...] | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """Composite document quality gate: every input row comes back with
    ``drop_reasons: array<string>`` (empty = clean) and ``keep: boolean``
    — the auditable form a pipeline needs (dropping silently makes mix
    debugging impossible; a reasons column makes every removal countable
    by cause).

    Gates, in fixed order: empty normalized text, length bounds, language
    allowlist (on the ``lang_col`` metadata column), quality-score floor
    (functions/text.py expr_quality_score), and the Gopher repetition caps
    (repetition_signals). Any threshold set to None skips its gate.

    Plan: repetition_signals' one-exchange aggregate, then ONE
    co-partitioned join back to the docs (the signals side is already
    hash-partitioned by doc_id from its groupBy, so only the docs side
    exchanges) — 2 exchanges end-to-end, all gates pure Catalyst
    projections, zero Python.
    """
    from ..functions.text import expr_quality_score

    rep = repetition_signals(docs, id_col=id_col, text_col=text_col).select(
        id_col, "dup_word_frac", "top_word_frac", "dup_2gram_frac"
    )
    joined = docs.join(rep, id_col, "left")

    gates: list[tuple[str, Column]] = [
        # no repetition row ⇔ normalized text was empty
        ("empty", F.col("dup_word_frac").isNull()),
        ("too_short", F.length(text_col) < min_chars),
        ("too_long", F.length(text_col) > max_chars),
    ]
    if langs is not None:
        gates.append(("lang", ~F.col(lang_col).isin(*langs)))
    if min_quality is not None:
        gates.append(("low_quality", expr_quality_score(text_col) < min_quality))
    if max_dup_word_frac is not None:
        gates.append(("dup_words", F.col("dup_word_frac") > max_dup_word_frac))
    if max_top_word_frac is not None:
        gates.append(("top_word", F.col("top_word_frac") > max_top_word_frac))
    if max_dup_2gram_frac is not None:
        gates.append(("dup_2grams", F.col("dup_2gram_frac") > max_dup_2gram_frac))

    reasons = F.filter(
        F.array(
            *[
                F.when(cond.eqNullSafe(F.lit(True)), F.lit(name)) for name, cond in gates
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return joined.withColumn("drop_reasons", reasons).withColumn(
        "keep", F.size("drop_reasons") == 0
    )
