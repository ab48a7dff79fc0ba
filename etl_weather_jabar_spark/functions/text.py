"""Text scalar functions for the training-data-pipeline extensions.

All JVM-side (regex + higher-order array functions) — no Python UDFs. These
back ext/{dedup, quality}: tokenization, shingling, quality ratios, n-gram
language-ID heuristic, token counting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal function-word lists for the language-ID heuristic. A real deploy
# swaps in proper profiles; the heuristic's *plumbing* (per-language keyword
# hit counts → argmax with deterministic tie-break) is the point.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "les", "de", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}


def normalize(col: Column) -> Column:
    """Lowercase, collapse whitespace, strip non-alnum (keeps CJK)."""
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    return F.regexp_replace(c, r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.filter(F.split(normalize(col), " "), lambda t: t != "")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish subword estimate: word-piece regex (letter runs, digit runs,
    punctuation singletons), each long word counted ceil(len/4) pieces —
    a deterministic stand-in for a real tokenizer's token count."""
    words = F.split(F.lower(col), r"\s+")
    return F.aggregate(
        F.filter(words, lambda w: w != ""),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("bigint"),
    )


def shingles(col: Column, n: int = 5) -> Column:
    """Word n-gram shingles (array<string>) for MinHash/Jaccard. Documents
    shorter than n tokens yield one shingle = the whole text."""
    toks = tokens(col)
    k = F.size(toks)
    joined = F.array_join(toks, " ")
    return F.when(
        k <= n, F.array(joined)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), k - F.lit(n) + F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def punct_ratio(col: Column) -> Column:
    """# punctuation chars / length."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[\p{P}]", ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def marker_hits(col: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are language-marker function words."""
    return F.size(F.filter(tokens(col), lambda t: t.isin(*markers)))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence. Deterministic arithmetic (oracle-expressible)."""
    n_tok = token_count_ws(col).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 10.0, F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3.0, 4)


def feature_hash_slot(token: Column, dim: int, salt: str = "fh") -> Column:
    """The hashing-trick slot for a token: 32 bits of a salted md5 modulo
    ``dim``. md5 (not xxhash64) so any engine reproduces the assignment —
    the same cross-engine contract as ext/sampling's hash decisions."""
    h = F.conv(
        F.substring(F.md5(F.concat(token, F.lit(":" + salt))), 1, 8), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(dim))


# Script ranges in the Java∩RE2-portable spelling (`\x{…}` hex escapes,
# explicit code-point ranges — script NAMES diverge between the engines:
# Java wants \p{IsLatin}, RE2 wants \p{Latin}, so ranges are the subset
# both parse identically). Latin excludes × (00D7) and ÷ (00F8-1) per the
# Unicode blocks; Han is the BMP CJK Unified block (both engines count
# BMP code points identically in length()).
SCRIPT_RANGES: dict[str, str] = {
    "latin": (
        r"[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]"
    ),
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "han": r"[\x{4E00}-\x{9FFF}]",
}


def script_counts(col: Column) -> dict[str, Column]:
    """Per-script letter counts + total Unicode letters — the
    script-share signal the round-5 verdict added to the lang-ID tier
    (marker words alone degrade silently on non-Latin corpora: a
    Russian or Chinese document hits zero markers of every language).
    Pure regexp_replace/length arithmetic, exact integers, reproduced
    verbatim by the DuckDB twin (script_share_docs)."""
    out = {
        name: (
            F.length(col) - F.length(F.regexp_replace(col, rng, ""))
        ).cast("bigint")
        for name, rng in SCRIPT_RANGES.items()
    }
    out["letters"] = F.length(
        F.regexp_replace(col, r"[^\p{L}]", "")
    ).cast("bigint")
    return out


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround, explicit character classes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def redact_pii(col: Column, kinds: tuple[str, ...] = ("email", "phone", "ipv4", "ssn")) -> Column:
    """Replace each PII match with a ``<KIND>`` tag — the corpus-scrubbing
    pass every training pipeline runs before tokenization. Pure
    regexp_replace chain: codegen'd, order fixed (email first so phone's
    digit runs can't eat an address's digits), no UDF."""
    out = col
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_counts(col: Column, kind: str) -> Column:
    """Occurrences of one PII kind (``regexp_count`` — JVM-side)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def hashed_weight(slot: Column, cls: int, salt: str = "w") -> Column:
    """Deterministic integer weight in [-1000, 1000] for a (feature
    slot, class) cell, derived from 32 bits of a salted md5 — the
    cross-engine-reproducible stand-in for a trained linear model's
    weight matrix (a real model swaps this expression for a broadcast
    lookup; the relational plumbing around it is identical). Integer
    weights keep classifier scores exact under any summation order."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    slot.cast("string"),
                    F.lit(":" + str(cls)),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(2001)) - F.lit(1000)
