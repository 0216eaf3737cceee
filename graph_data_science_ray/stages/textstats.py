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
# GPT-2-style pre-tokenizer shape (contractions | space+word | space+number
# | space+other-run | whitespace-run) — a proxy for BPE token counts without
# a merges table; RE2-safe, so Arrow and DuckDB count it identically
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?\d+| ?[^\sa-zA-Z\d]+|\s+"


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
        import pyarrow.compute as pc

        t = pc.fill_null(pc.cast(batch.column(self.text_col), pa.string()), "")
        trimmed = pc.utf8_trim_whitespace(t)
        ws_runs = pc.count_substring_regex(trimmed, r"\s+").to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
        n_tokens = np.where(nonempty, ws_runs + 1, 0).astype(np.int64)
        n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = (
            pc.count_substring_regex(t, "[a-zA-Z]+").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        n_bpe = (
            pc.count_substring_regex(t, BPE_ISH_PATTERN)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_tokens": pa.array(n_tokens),
                "n_chars": pa.array(n_chars),
                "n_words": pa.array(n_words),
                "n_bpe_tokens": pa.array(n_bpe),
            }
        )


class QualityScore:
    """Heuristic quality features + a composite score in [0, 1]:
    length, punctuation/digit ratios, mean word length, stopword ratio
    (the standard pre-training corpus filters).

    Fully vectorized: every count is one ``pyarrow.compute.
    count_substring_regex`` kernel over the whole batch (RE2, the same
    engine DuckDB uses — the oracle replicates each pattern verbatim).
    Stopwords match on RE2 ``\\b`` token boundaries: digits/underscore
    adjacent to a word ("a1") do NOT end a token, unlike the old
    per-row ``findall`` membership — identical on real prose."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", lang: str = "en"):
        self.id_col, self.text_col = id_col, text_col
        stops = sorted(_LANG_PROFILES.get(lang, _LANG_PROFILES["en"]))
        self.stop_pat = r"\b(?:" + "|".join(stops) + r")\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pc.fill_null(pc.cast(batch.column(self.text_col), pa.string()), "")

        def cnt(col, pat):
            return pc.count_substring_regex(col, pat).to_numpy(zero_copy_only=False).astype(np.float64)

        n = np.maximum(1.0, pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.float64))
        nchars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.float64)
        punct = cnt(t, r"[^\w\s]") / n
        digit = cnt(t, r"\d") / n
        nw = np.maximum(1.0, cnt(t, "[a-zA-Z]+"))
        mwl = cnt(t, "[a-zA-Z]") / nw
        stop = cnt(pc.utf8_lower(t), self.stop_pat) / nw
        q = np.maximum(
            0.0,
            np.minimum(
                1.0,
                0.4 * np.minimum(1.0, stop * 4)
                + 0.3 * (1.0 - np.minimum(1.0, punct * 5))
                + 0.2 * (1.0 - np.minimum(1.0, digit * 5))
                + 0.1 * np.minimum(1.0, nchars / 500),
            ),
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "punct_ratio": pa.array(punct, pa.float64()),
                "digit_ratio": pa.array(digit, pa.float64()),
                "mean_word_len": pa.array(mwl, pa.float64()),
                "stopword_ratio": pa.array(stop, pa.float64()),
                "quality": pa.array(q, pa.float64()),
            }
        )


class LanguageId:
    """Stopword-profile language identification (en/de/fr/es/unknown).

    Vectorized: per profile word, one boolean ``match_substring_regex``
    kernel over the batch (RE2 ``\\b`` token match); a language's score
    is how many of its profile words occur at least once. Winner =
    alphabetically-first max; score 0 → ``unknown``."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.langs = sorted(_LANG_PROFILES)
        self.patterns = {
            l: [r"\b" + w + r"\b" for w in sorted(_LANG_PROFILES[l])] for l in self.langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pc.utf8_lower(pc.fill_null(pc.cast(batch.column(self.text_col), pa.string()), ""))
        scores = np.zeros((len(self.langs), batch.num_rows), dtype=np.int64)
        for i, l in enumerate(self.langs):
            for pat in self.patterns[l]:
                scores[i] += pc.match_substring_regex(t, pat).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
        best = np.argmax(scores, axis=0)  # first (alphabetical) max wins
        top = scores[best, np.arange(batch.num_rows)]
        lang_arr = np.array(self.langs, dtype=object)[best]
        lang_arr[top == 0] = "unknown"
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "lang_pred": pa.array(lang_arr.tolist(), pa.string()),
            }
        )


def md5_fingerprint(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, md5 hex of text) — matches DuckDB md5()."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table({id_col: batch.column(id_col), "fingerprint": pa.array(fps, pa.string())})


def rolling_fingerprint(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text",
                        window: int = 64, stride: int = 16) -> pa.Table:
    """Content-defined fingerprint: min crc32 over sliding byte windows —
    robust to local edits (winnowing-style, single hash per doc).

    Windows are taken straight off the column's UTF-8 data buffer as
    zero-copy memoryview slices — no per-doc Python-string decode
    (``to_pylist``) and no per-window bytes copy. The inner hash stays
    zlib's C crc32: a fully-vectorized numpy table-driven CRC was built
    and MEASURED 10× SLOWER (byte-at-a-time gathers can't beat zlib's
    slice-by-8 kernel at 64-byte windows), so per-window C calls are the
    fast path here, ~8 µs/doc on the bench corpus."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pa.compute.fill_null(col, "")
    n = len(col)
    out = np.empty(n, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    dbuf = col.buffers()[2]
    data = np.frombuffer(dbuf, dtype=np.uint8) if dbuf is not None else np.empty(0, np.uint8)
    mv = memoryview(data)
    crc32 = zlib.crc32
    for i in range(n):
        a, b = int(offs[i]), int(offs[i + 1])
        if b - a <= window:
            out[i] = crc32(mv[a:b])
        else:
            out[i] = min(
                crc32(mv[j : j + window]) for j in range(a, b - window + 1, stride)
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
