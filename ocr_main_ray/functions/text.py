"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (SURVEY.md lists these as first-class
additions): language-ID, quality scoring, token counting, document
fingerprinting.  All vectorized or tight per-row loops over Arrow batches;
stateful pieces (compiled regexes, n-gram profiles) live in actor ``__init__``
when used as a pool (see pipelines/queries.py).
"""
from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# Language ID — character n-gram profile heuristic.  Profiles are tiny,
# hand-built from the most frequent trigrams of each language's function
# words; the point is the operator shape (per-row scoring against a
# broadcast profile table), not linguistic accuracy.
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    "eng": ["the", "and", "ing", "ion", "to ", "of ", " th", "he ", "er ", "in "],
    "spa": ["de ", " de", "la ", "os ", "ión", "ent", " la", "es ", "ar ", "que"],
    "por": ["ão ", "de ", " de", "os ", "ent", "ção", " co", "ar ", "da ", "em "],
    "fra": ["es ", " de", "de ", "le ", "ent", "et ", " le", "la ", "ion", "re "],
    "deu": ["en ", "er ", "ch ", "der", "die", "ein", "sch", "und", "den", " de"],
}


class LangId:
    """Callable class for map_batches actor pools: profiles built once."""

    def __init__(self):
        self.profiles = {
            lang: {g: len(grams) - i for i, g in enumerate(grams)}
            for lang, grams in _LANG_PROFILES.items()
        }

    def score_text(self, text: str) -> str:
        t = text.lower()
        if not t.strip():
            return "und"
        best_lang, best = "und", 0
        for lang, prof in self.profiles.items():
            s = sum(w * t.count(g) for g, w in prof.items())
            if s > best:
                best_lang, best = lang, s
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.score_text(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_id", pa.array(langs, pa.string()))


def detect_language(text: str) -> str:
    return LangId().score_text(text)


# ---------------------------------------------------------------------------
# Quality scoring — length / punctuation / alpha / stopword ratios.
# Definitions chosen to be exactly replicable in ANSI SQL (see the
# quality_score oracle in pipelines/queries.py).
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT = re.compile(r"[0-9]")
_PUNCT = re.compile(r"[.,;:!?]")


def quality_features(text: str) -> dict:
    n = len(text)
    words = text.split()
    n_words = len(words)
    n_alpha = len(_ALPHA.findall(text))
    n_digit = len(_DIGIT.findall(text))
    n_punct = len(_PUNCT.findall(text))
    n_stop = sum(1 for w in words if w.lower() in _STOPWORDS)
    return {
        "n_chars_text": n,
        "n_words": n_words,
        "alpha_ratio": n_alpha / n if n else 0.0,
        "digit_ratio": n_digit / n if n else 0.0,
        "punct_ratio": n_punct / n if n else 0.0,
        "stopword_ratio": n_stop / n_words if n_words else 0.0,
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
    }


def quality_score(text: str) -> float:
    """Composite in [0, 100]: rewards alpha-heavy, stopword-bearing prose
    with sane word lengths — the usual web-text quality shape."""
    f = quality_features(text)
    score = (
        40.0 * f["alpha_ratio"]
        + 30.0 * min(1.0, f["stopword_ratio"] * 4)
        + 20.0 * (1.0 if 3.0 <= f["mean_word_len"] <= 10.0 else 0.0)
        + 10.0 * (1.0 if f["n_words"] >= 20 else f["n_words"] / 20.0)
    )
    return round(score, 4)


# ---------------------------------------------------------------------------
# Token counting — whitespace and BPE-ish regex (RE2-compatible pattern so
# the DuckDB oracle can run the identical expression).
# ---------------------------------------------------------------------------

BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_BPE_RE = re.compile(BPE_PATTERN)


def whitespace_token_count(text: str) -> int:
    return len(text.split())


def bpe_token_count(text: str) -> int:
    return len(_BPE_RE.findall(text))


# ---------------------------------------------------------------------------
# Document fingerprinting — winnowing-style rolling hash (Schleimer et al.,
# SIGMOD 2003 shape): crc32 over character k-grams, keep the minimum hash in
# each window, fingerprint = crc32 of the selected minima sequence.
# ---------------------------------------------------------------------------

def winnow_minima(text: str, k: int = 8, window: int = 16) -> list[int]:
    """The winnowing sketch itself: the DISTINCT selected k-gram minima
    (sorted).  Two documents sharing a >= (k + window - 1)-char substring
    share at least one selected minimum — the retrieval guarantee of
    Schleimer et al. — so these are the keys for shared-substring
    (copy/paste) near-dup retrieval.  ``fingerprint`` below collapses the
    ordered minima sequence into one int and cannot retrieve."""
    data = text.encode("utf-8", errors="replace")
    if len(data) < k:
        return [zlib.crc32(data)]
    hashes = np.fromiter(
        (zlib.crc32(data[i : i + k]) for i in range(len(data) - k + 1)),
        dtype=np.int64,
    )
    if len(hashes) <= window:
        return [int(hashes.min())]
    w = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return sorted({int(m) for m in w.min(axis=1)})


def fingerprint(text: str, k: int = 8, window: int = 16) -> int:
    data = text.encode("utf-8", errors="replace")
    if len(data) < k:
        return zlib.crc32(data)
    hashes = np.fromiter(
        (zlib.crc32(data[i : i + k]) for i in range(len(data) - k + 1)),
        dtype=np.int64,
    )
    if len(hashes) <= window:
        minima = [int(hashes.min())]
    else:
        w = np.lib.stride_tricks.sliding_window_view(hashes, window)
        mins = w.min(axis=1)
        # winnowing keeps distinct consecutive minima
        keep = np.empty(len(mins), dtype=bool)
        keep[0] = True
        keep[1:] = mins[1:] != mins[:-1]
        minima = mins[keep].tolist()
    acc = 0
    for m in minima:
        acc = zlib.crc32(int(m).to_bytes(8, "little", signed=False), acc)
    return acc
