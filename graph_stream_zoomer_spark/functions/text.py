"""Text-derived scalar functions over transcript/document text.

Two implementations of each function:
  - a native Catalyst expression (``expr_*``) — JVM-side, whole-stage
    codegen, DuckDB-oracle-expressible; the hot-path default;
  - an Arrow-vectorized pandas UDF (``pdf_*``) — the extension point for
    logic Catalyst can't express (A+B axis: any Python that touches data is
    Arrow-batched, never per-row).

Tests assert the two agree so either can be swapped in.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType, StringType

# Tiny deterministic stopword list shared by quality scoring and the
# n-gram-heuristic language id. English-only on purpose: the heuristic is
# "how English does this look", which is what a training-data filter needs.
STOPWORDS = (
    "the a an and or of to in is are was for on with as at by it this that "
    "be from not have has had you he she they we i".split()
)

TOKEN_PATTERN = r"[A-Za-z0-9]+(?:'[a-z]+)?"  # BPE-ish wordpiece seed tokens


# ---------------------------------------------------------------- lengths
def expr_text_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


@F.pandas_udf(IntegerType())
def pdf_text_len(texts: pd.Series) -> pd.Series:
    return texts.str.len().fillna(0).astype("int32")


# ---------------------------------------------------------------- tokens
def expr_token_count(col: Column | str) -> Column:
    """Count of TOKEN_PATTERN matches (whitespace+punct robust)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0)))


@F.pandas_udf(IntegerType())
def pdf_token_count(texts: pd.Series) -> pd.Series:
    return texts.str.count(TOKEN_PATTERN).fillna(0).astype("int32")


# ---------------------------------------------------------------- quality
def expr_quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic:
    0.4·min(1, len/200) + 0.3·(1 − punct_ratio) + 0.3·min(1, 4·stop_ratio)
    where punct_ratio = non-alnum-non-space chars / len and stop_ratio =
    stopword tokens / tokens. Purely arithmetic so it is oracle-expressible.
    """
    c = F.col(col) if isinstance(col, str) else col
    length = F.length(c).cast("double")
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")).cast("double")
    tokens = F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+"), F.lit(0))
    n_tokens = F.size(tokens).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t))).cast("double")
    punct_ratio = F.when(length > 0, punct / length).otherwise(F.lit(1.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), length / F.lit(200.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(4.0) * stop_ratio)
    )
    return F.round(score, 6)


@F.pandas_udf(DoubleType())
def pdf_quality_score(texts: pd.Series) -> pd.Series:
    t = texts.fillna("")
    length = t.str.len().astype("float64")
    punct = t.str.count(r"[^A-Za-z0-9\s]").astype("float64")
    tokens = t.str.lower().str.findall(r"[a-z0-9]+")
    n_tokens = tokens.str.len().astype("float64")
    stop = set(STOPWORDS)
    n_stop = tokens.map(lambda ts: sum(1 for x in ts if x in stop)).astype("float64")
    punct_ratio = (punct / length).where(length > 0, 1.0)
    stop_ratio = (n_stop / n_tokens).where(n_tokens > 0, 0.0)
    score = (
        0.4 * (length / 200.0).clip(upper=1.0)
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * (4.0 * stop_ratio).clip(upper=1.0)
    )
    return score.round(6)


# ---------------------------------------------------------------- lang id
def expr_lang_en_score(col: Column | str) -> Column:
    """n-gram-heuristic language id, scored as stopword-hit ratio;
    classify en when ratio ≥ 0.1."""
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+"), F.lit(0))
    n = F.size(tokens).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t))).cast("double")
    return F.round(F.when(n > 0, hits / n).otherwise(F.lit(0.0)), 6)


def expr_lang_id(col: Column | str) -> Column:
    return F.when(expr_lang_en_score(col) >= 0.1, F.lit("en")).otherwise(F.lit("other"))


@F.pandas_udf(StringType())
def pdf_lang_id(texts: pd.Series) -> pd.Series:
    stop = set(STOPWORDS)
    tokens = texts.fillna("").str.lower().str.findall(r"[a-z]+")
    n = tokens.str.len().astype("float64")
    hits = tokens.map(lambda ts: sum(1 for x in ts if x in stop)).astype("float64")
    ratio = (hits / n).where(n > 0, 0.0)
    return pd.Series(["en" if r >= 0.1 else "other" for r in ratio])


# ------------------------------------------------------------ fingerprint
def expr_fingerprint(col: Column | str) -> Column:
    """Document fingerprint: xxhash64 of the token-normalized text
    (lowercase, collapse non-alnum runs to single spaces, trim)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))
    return F.xxhash64(norm)


@F.pandas_udf(LongType())
def pdf_rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash over normalized tokens (Karp-Rabin style) —
    the reference-free 'rolling hash' fingerprint variant; vectorized over
    the Arrow batch, per-doc loop is over tokens only."""
    import re

    def roll(s: str) -> int:
        h = 0
        for tok in re.findall(r"[a-z0-9]+", (s or "").lower()):
            th = 0
            for ch in tok.encode():
                th = (th * 131 + ch) & 0xFFFFFFFFFFFFFFFF
            h = (h * 1000003 + th) & 0xFFFFFFFFFFFFFFFF
        # map to signed int64 for LongType
        return h - (1 << 64) if h >= (1 << 63) else h

    return texts.map(roll).astype("int64")


# ----------------------------------------------------------------- PII
# Redaction patterns chosen for the Java-regex ∩ RE2 (DuckDB) common
# subset — no lookaround, no backreferences — so the Catalyst path is
# oracle-expressible verbatim. Order matters: emails before phones (an
# email's digit runs must not be phone-matched), IPs before phones.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d ()-]{6,14}\d\b", "<PHONE>"),
)


def expr_redact_pii(col: Column | str) -> Column:
    """Redact emails / IPv4s / international-format phone numbers with
    typed placeholder tokens. Chained Catalyst ``regexp_replace`` — three
    JVM regex passes inside one codegen stage, no Python. A heuristic
    (training-data hygiene), not a compliance guarantee."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def expr_pii_counts(col: Column | str) -> list[Column]:
    """Per-kind match counts (``n_email``/``n_ip``/``n_phone``) — the
    audit columns a redaction pass should always emit alongside the
    redacted text. Counts are measured on the ORIGINAL text, each kind
    after the prior kinds' redaction (same order as expr_redact_pii), so
    e.g. an email's host dots are never double-counted as an IP."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for name, pat, token in PII_PATTERNS:
        out.append(F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{name}"))
        c = F.regexp_replace(c, pat, token)
    return out


@F.pandas_udf(StringType())
def pdf_redact_pii(texts: pd.Series) -> pd.Series:
    """Arrow twin of expr_redact_pii (same patterns, pandas str.replace)."""
    out = texts.fillna("")
    for _, pat, token in PII_PATTERNS:
        out = out.str.replace(pat, token, regex=True)
    return out
