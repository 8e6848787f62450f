"""Text column functions: tokenization, shingles, language-ID, quality
scoring, token counting, fingerprinting.

Tokenization follows the reference's term pattern ``[a-zA-Z]+``
(/root/reference/src/main/scala/invertedIndex.scala:47). All functions are
built-in column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path. Byte-faithful char offsets per occurrence live in
operators/index.token_stream_with_offsets (the reference's
(lineOffset, textOffset) analog).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-zA-Z]+"

# Tiny per-language stopword marker sets for the n-gram language-ID
# heuristic. Deliberately deterministic and vocabulary-based: testdata text
# is synthetic English-ish regardless of its `lang` label, so the heuristic
# is exercised for its plumbing (score → argmax), not NLP accuracy.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "zh": ("de", "shi", "le", "wo", "ni"),
}

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Lower-cased ``[a-zA-Z]+`` token array (reference P3's term stream)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), F.lit(0))


def token_count(col: Column | str) -> Column:
    """Whitespace-free token count (BPE-ish proxy: regex word pieces)."""
    return F.size(tokens(col))


# GPT-2-family pre-tokenizer pattern, restricted to constructs shared by
# Java regex and RE2 (no lookarounds, which RE2/DuckDB lacks): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs. Run
# over lower() text so the letter class stays [a-z].
BPE_RE = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+"
WS_RE = "\\S+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of ``BPE_RE`` over the lower-cased
    text — the token-budget estimate an LLM pipeline bills by (a trained
    BPE merges within these pre-token pieces, never across, so the count
    upper-bounds piece granularity deterministically, engine-portably)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_RE), F.lit(0)))


def ws_token_count(col: Column | str) -> Column:
    """Whitespace-delimited token count (the naive budget baseline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(WS_RE), F.lit(0)))


def char_shingles(col: Column | str, k: int = 8) -> Column:
    """All character k-grams of a string as an array (for MinHash/Jaccard).

    Pure expression: ``transform(sequence(...), i -> substr(s, i, k))``
    stays in codegen; at 100 TB this is a map-side expansion with no
    shuffle until the downstream aggregation.
    """
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: F.substr(c, i, F.lit(k)),
    )
    return F.when(F.length(c) < k, F.array(c)).otherwise(grams)


def word_shingles_of(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) over an already-materialized
    token array column.

    Callers should project ``tokens(text)`` into its own column FIRST and
    pass the attribute reference: referencing a `regexp_extract_all` call
    directly here makes Catalyst re-evaluate the regex inside the
    ``transform`` lambda (measured ~1.7× slower end-to-end at sf0.1).
    """
    return F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) over the token stream. Prefer
    the two-step ``word_shingles_of`` form in hot paths (see its note)."""
    return word_shingles_of(tokens(col), n)


def normalize_text(col: Column | str) -> Column:
    """Canonical text cleanup for ingest: strip C0 control chars (except
    tab/newline, which become spaces), collapse whitespace runs to one
    space, trim, lowercase. Expressed as a regexp_replace chain using
    explicit character classes (no \\s shorthand) so the RE2-based
    DuckDB oracle applies byte-identical rules. Pure projection — the
    normalize pass over a 100 TB crawl is map-only."""
    c = F.col(col) if isinstance(col, str) else col
    no_ctrl = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    one_ws = F.regexp_replace(no_ctrl, "[ \\t\\r\\n]+", " ")
    return F.lower(F.trim(one_ws))


EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
LONG_NUM_RE = "[0-9][0-9 .-]{6,}[0-9]"


def redact_pii(col: Column | str) -> Column:
    """Ingest-time PII-style redaction: replace email addresses with
    ``<EMAIL>`` and long digit runs (phone/account-shaped, ≥8 chars of
    digits with separators) with ``<NUM>``. Pure map-side
    regexp_replace chain; the patterns use RE2-compatible classes so the
    DuckDB oracle applies byte-identical rules. This is the cheap
    regex tier of a PII pipeline — a production stack layers NER after
    it; the Spark-side plumbing is identical either way."""
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, LONG_NUM_RE, "<NUM>")


def language_id(col: Column | str) -> Column:
    """Heuristic language-ID: argmax of per-language marker-token hits.

    Ties break lexicographically ('en' beats 'fr' at equal score) so the
    result is deterministic and oracle-reproducible.
    """
    toks = tokens(col)
    scored = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in marks]))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, marks in sorted(_LANG_MARKERS.items())
    ]
    # array_max on struct(score, lang) orders by score then lang; we want
    # max score, ties → smallest lang, so compare on (score, negated-order
    # proxy) — simplest deterministic form: reduce with a when-chain.
    best = scored[0]
    for s in scored[1:]:
        best = F.when(s["score"] > best["score"], s).otherwise(best)
    return best["lang"]


def quality_score(text_col: Column | str, n_chars_col: Column | str | None = None) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4·length_score + 0.3·(1 − punct_ratio·5 clipped) + 0.3·stopword_ratio.

    length_score saturates at 2000 chars; punct_ratio is non-alnum-non-space
    chars per char; stopword_ratio is stopword tokens per token.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(c) if n_chars_col is None else (
        F.col(n_chars_col) if isinstance(n_chars_col, str) else n_chars_col
    )
    length_score = F.least(n_chars / F.lit(2000.0), F.lit(1.0))
    punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    punct_ratio = punct / F.greatest(F.length(c), F.lit(1))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    toks = tokens(c)
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in _STOPWORDS])))
    # distinct-stopword presence ratio over a fixed 8-word list
    stop_score = stop_hits / F.lit(float(len(_STOPWORDS)))
    return F.round(0.4 * length_score + 0.3 * punct_score + 0.3 * stop_score, 6)


def fingerprint(col: Column | str, width: int = 16) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream, truncated to ``width`` hex chars. Rolling-hash analog that is
    portable between Spark and the DuckDB oracle."""
    return F.substring(F.md5(F.array_join(tokens(col), " ")), 1, width)


def gram_hashes_of(toks: Column, k: int = 4) -> Column:
    """Word k-gram hash sequence (md5-derived 60-bit ints, portable to
    the DuckDB oracle) — step 1 of winnowing. Callers MUST project this
    into its own column before sliding windows over it: referencing the
    expression inside another ``transform`` lambda defeats subexpression
    elimination and recomputes the whole hash array per window (measured
    ~10× slower at sf0.1 — same trap as the regex note above)."""
    grams = word_shingles_of(toks, k)
    return F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    )


def window_minima_of(hs: Column, w: int = 4) -> Column:
    """Winnowing step 2 (Schleimer, Wilkerson & Aiken 2003 — the MOSS
    algorithm): each w-window's minimum over a MATERIALIZED hash-array
    column, dedup + sort. Guarantee: any shared token run of ≥ w + k − 1
    tokens contributes at least one common fingerprint, so partial-
    overlap detection needs only a set intersection — no alignment.
    ``least(element_at…)`` rather than ``array_min(slice…)``: no per-
    window array allocation (least skips the NULLs short docs produce).
    """
    n_windows = F.greatest(F.size(hs) - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.least(*[F.element_at(hs, i + j) for j in range(w)]),
    )
    return F.sort_array(F.array_distinct(mins))
