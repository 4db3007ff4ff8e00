"""Text-analysis operators for large-scale training-data pipelines:
language-ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting. All built from JVM-side expressions (split /
filter / regexp) — no Python in the hot path — so they stream through
whole-stage codegen at 100 TB.

These extend the reference's text handling (line parsing, keyword
predicates — run_scraper.py:97-101, nba_props_scraper.py:633-645) to the
LLM-data-pipeline operator set called for by the project north star.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# Stopword lists for the language-ID heuristic. Deterministic and tiny on
# purpose: the operator's contract is a reproducible score, not NLP accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "y", "es", "que", "los", "un"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就"),
}

WS_TOKEN_PATTERN = r"\s+"
# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[.!?,;:]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (after trim so no boundary empties)."""
    return F.split(F.trim(text), WS_TOKEN_PATTERN)


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex — the cheap proxy for
    'how many LLM tokens is this document'."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(ws_tokens(text), lambda t: F.array_contains(arr, t)))


def predict_lang(text: Column) -> Column:
    """Stopword-scoring language ID with a deterministic tie-break (langs
    compared in sorted order; first max wins)."""
    langs = sorted(LANG_STOPWORDS)
    scores = {lang: stopword_hits(text, lang) for lang in langs}
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        better = scores[lang] > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    return best


def predict_lang_fast(text: Column) -> Column:
    """Arrow-vectorized language ID — identical semantics to
    ``predict_lang`` (stopword occurrence counts, first-max over langs in
    sorted order) but one tokenization pass per document instead of one
    regex split per (lang × stopword) filter, which is what makes the
    pure-expression form O(40×) slower on long documents."""
    langs = sorted(LANG_STOPWORDS)
    stop_sets = {lang: frozenset(LANG_STOPWORDS[lang]) for lang in langs}

    @F.pandas_udf("string")
    def _predict(s: pd.Series) -> pd.Series:
        def f(t: str) -> str:
            toks = (t or "").split()
            best_lang, best_score = langs[0], -1
            for lang in langs:
                ss = stop_sets[lang]
                score = sum(1 for tok in toks if tok in ss)
                if score > best_score:
                    best_lang, best_score = lang, score
            return best_lang

        return s.map(f)

    return _predict(text)


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features + a composite score —
    all exact-integer counts divided pairwise, so cross-engine stable."""
    n_chars = F.length(text)
    n_tokens = token_count_ws(text)
    n_nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), 0))
    n_stop = stopword_hits(text, "en")
    avg_token_len = n_nonspace.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_tokens
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
    }


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the sorted distinct token set — invariant
    to word order and duplication, the cheap exact-near-dup key."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws_tokens(text))), " "))


def distinct_word_shingles_fast(
    text: Column, k: int = 3, single_eval: bool = False
) -> Column:
    """Arrow-vectorized distinct k-word shingles.

    The pure-expression form (``word_shingles``) is interpreted per row
    (higher-order transform + element_at) and measures ~1.8 ms/doc; this
    Pandas UDF computes the identical strings ~100× faster, which matters
    when shingling feeds every dedup operator. Whitespace ``str.split()``
    matches the engine's trim+regex-split tokenization on whitespace-
    separated text, so downstream hashes are unchanged.

    ``single_eval=True`` marks the UDF non-deterministic (it is in fact
    pure, so results are unchanged) to stop the optimizer CLONING the call
    when two consumers reference it across a Project/Generate boundary —
    e.g. ``size(arr)`` beside ``explode(arr)`` in
    ``dedup.hashed_shingle_sets`` planned as TWO ArrowEvalPython nodes,
    doubling the shingling cost (guide §4.4). Off by default: the flag
    also blocks legitimate reorderings (filter pushdown past the UDF), so
    callers opt in only where the duplication is real."""

    @F.pandas_udf("array<string>")
    def _shingles(s: pd.Series) -> pd.Series:
        def f(t: str):
            toks = (t or "").split()
            if len(toks) < k:
                return []
            seen = dict.fromkeys(
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            )
            return list(seen)

        return s.map(f)

    fn = _shingles.asNondeterministic() if single_eval else _shingles
    return fn(text)


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as strings; [] when the doc has fewer than k tokens.
    Built with sequence+transform (JVM-side), no explode needed."""
    toks = ws_tokens(text)
    n = F.size(toks)
    # guard: sequence(1, 0) would be DESCENDING [1,0], not empty
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def winnow_minima_fast(text: Column, k: int = 3, w: int = 4) -> Column:
    """Arrow-vectorized winnowing fingerprints: distinct sliding-window
    (width ``w``) minima over the md5 hashes of the document's k-gram
    sequence. The pure-expression form (higher-order ``transform`` with a
    per-element md5 + a per-doc ROWS window) is interpreted per element and
    measured ~25 s on the sf0.1 corpus; this computes identical strings in
    one Python pass (~1 s), the same trade ``distinct_word_shingles_fast``
    makes for shingling. Output order is the document's window order —
    callers that need set semantics get it for free (duplicates removed,
    first occurrence kept)."""
    import hashlib

    @F.pandas_udf("array<string>")
    def _winnow(s: pd.Series) -> pd.Series:
        def f(t: str):
            toks = (t or "").split()
            n = len(toks) - (k - 1)
            if n < w:
                return []
            hashes = [
                hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
                for i in range(n)
            ]
            return list(dict.fromkeys(min(hashes[i : i + w]) for i in range(n - w + 1)))

        return s.map(f)

    return _winnow(text)
