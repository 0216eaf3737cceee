"""Text-analysis stages for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All are stateless-per-batch transforms (actor pool only to amortize
regex compilation); every hot loop is either a compiled-regex C call or
numpy. Designed over the ``documents`` table (doc_id, text, lang, ...)
but column names are parameters.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "que", "por"},
}

_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"[a-zA-Z]+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_DIGIT_RE = re.compile(r"\d")


def token_count(text: str) -> int:
    """Whitespace token count — matches DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` for non-empty text."""
    t = text.strip()
    return len(_WS_RE.split(t)) if t else 0


class TokenStats:
    """map_batches class: (id, text) → (id, n_tokens, n_chars, n_words)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n_tokens = np.fromiter((token_count(t or "") for t in texts), np.int64, len(texts))
        n_chars = np.fromiter((len(t or "") for t in texts), np.int64, len(texts))
        n_words = np.fromiter(
            (len(_WORD_RE.findall(t or "")) for t in texts), np.int64, len(texts)
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_tokens": pa.array(n_tokens),
                "n_chars": pa.array(n_chars),
                "n_words": pa.array(n_words),
            }
        )


class QualityScore:
    """Heuristic quality features + a composite score in [0, 1]:
    length, punctuation/digit ratios, mean word length, stopword ratio
    (the standard pre-training corpus filters)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", lang: str = "en"):
        self.id_col, self.text_col = id_col, text_col
        self.stops = _LANG_PROFILES.get(lang, _LANG_PROFILES["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        rows = {
            "punct_ratio": [], "digit_ratio": [], "mean_word_len": [],
            "stopword_ratio": [], "quality": [],
        }
        for t in texts:
            t = t or ""
            n = max(1, len(t))
            words = _WORD_RE.findall(t.lower())
            nw = max(1, len(words))
            punct = len(_PUNCT_RE.findall(t)) / n
            digit = len(_DIGIT_RE.findall(t)) / n
            mwl = sum(map(len, words)) / nw
            stop = sum(w in self.stops for w in words) / nw
            # composite: reward stopword presence & sane word length,
            # penalize punctuation/digit soup and trivial length
            q = max(
                0.0,
                min(
                    1.0,
                    0.4 * min(1.0, stop * 4)
                    + 0.3 * (1.0 - min(1.0, punct * 5))
                    + 0.2 * (1.0 - min(1.0, digit * 5))
                    + 0.1 * min(1.0, len(t) / 500),
                ),
            )
            rows["punct_ratio"].append(punct)
            rows["digit_ratio"].append(digit)
            rows["mean_word_len"].append(mwl)
            rows["stopword_ratio"].append(stop)
            rows["quality"].append(q)
        cols = {self.id_col: batch.column(self.id_col)}
        cols.update({k: pa.array(v, pa.float64()) for k, v in rows.items()})
        return pa.table(cols)


class LanguageId:
    """Stopword-profile language identification (en/de/fr/es/unknown)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs = []
        for t in texts:
            words = set(_WORD_RE.findall((t or "").lower()))
            scores = {l: len(words & prof) for l, prof in _LANG_PROFILES.items()}
            best = max(sorted(scores), key=lambda l: scores[l])
            langs.append(best if scores[best] > 0 else "unknown")
        return pa.table(
            {self.id_col: batch.column(self.id_col), "lang_pred": pa.array(langs, pa.string())}
        )


def md5_fingerprint(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, md5 hex of text) — matches DuckDB md5()."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table({id_col: batch.column(id_col), "fingerprint": pa.array(fps, pa.string())})


def rolling_fingerprint(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text",
                        window: int = 64) -> pa.Table:
    """Content-defined fingerprint: min crc32 over sliding windows —
    robust to local edits (winnowing-style, single hash per doc)."""
    texts = batch.column(text_col).to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        if len(b) <= window:
            out[i] = zlib.crc32(b)
        else:
            out[i] = min(
                zlib.crc32(b[j : j + window]) for j in range(0, len(b) - window + 1, 16)
            )
    return pa.table({id_col: batch.column(id_col), "fingerprint64": pa.array(out)})


def token_stats(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    return ds.map_batches(
        TokenStats(id_col, text_col), batch_format="pyarrow", zero_copy_batch=True
    )


def quality_scores(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    return ds.map_batches(
        QualityScore(id_col, text_col), batch_format="pyarrow", zero_copy_batch=True
    )


def language_id(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    return ds.map_batches(
        LanguageId(id_col, text_col), batch_format="pyarrow", zero_copy_batch=True
    )
