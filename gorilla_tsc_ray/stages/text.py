"""Text-analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Everything is vectorized pandas/regex per batch; regexes use character
classes with identical semantics in Python ``re`` and DuckDB RE2 so the
token/quality metrics are SQL-oracle-checkable.

Cross-engine whitespace contract: Python ``re`` counts ``\\x0b``,
``\\x1c``–``\\x1f`` and unicode spaces (U+0085, U+00A0, U+2000…) as
``\\s``; RE2/DuckDB (the gate oracle) counts only ``[\\t\\n\\f\\r ]``.
Inputs containing those Python-only whitespace codepoints are OUTSIDE the
contract — the two reference engines themselves disagree there (found by
``tests/test_text_property.py`` via ``'\\x0b\\x80'``).  The shipped
corpora are pure ASCII without them; the property tests pin equality on
the agreed domain.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..util import round_half_away

WORD_RE = r"[A-Za-z0-9]+"
MERSENNE = (1 << 61) - 1

# tiny per-language marker-word lists (public-knowledge stopwords); scoring
# = count of whole-word marker occurrences, argmax with alphabetical
# tie-break — simple enough to mirror exactly in SQL.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


# GPT-2-flavoured pretokenizer, simplified to alternation-only syntax so
# Python re (leftmost-first) and RE2/DuckDB (leftmost-longest) agree: the
# alternatives are ordered longest/most-specific first
BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
WS_RE = r"\S+"


def token_stats(df: pd.DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> pd.DataFrame:
    """Token counts: word-regex (``[A-Za-z0-9]+``), whitespace-split, and a
    BPE-ish pretokenizer count (``BPE_RE``), plus character length."""
    text = df[text_col]
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(),
        "n_tokens": text.str.count(WORD_RE).to_numpy().astype(np.int64),
        "n_ws_tokens": text.str.count(WS_RE).to_numpy().astype(np.int64),
        "n_bpe_tokens": text.str.count(BPE_RE).to_numpy().astype(np.int64),
        "n_chars": text.str.len().to_numpy().astype(np.int64),
    })


def quality_scores(df: pd.DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id") -> pd.DataFrame:
    """Quality heuristics: character-class ratios + mean token length,
    rounded to 6 decimals (cross-engine float stability)."""
    text = df[text_col]
    n = text.str.len().to_numpy().astype(np.float64)
    nz = np.maximum(n, 1.0)
    n_alpha = text.str.count(r"[A-Za-z]").to_numpy()
    n_digit = text.str.count(r"[0-9]").to_numpy()
    n_space = text.str.count(r" ").to_numpy()
    n_punct = text.str.count(r"[.,;:!?]").to_numpy()
    n_tok = text.str.count(WORD_RE).to_numpy().astype(np.float64)
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(),
        "n_chars": n.astype(np.int64),
        "alpha_ratio": round_half_away(n_alpha / nz, 6),
        "digit_ratio": round_half_away(n_digit / nz, 6),
        "space_ratio": round_half_away(n_space / nz, 6),
        "punct_ratio": round_half_away(n_punct / nz, 6),
        "mean_token_len": round_half_away(n_alpha / np.maximum(n_tok, 1.0), 6),
    })


def _utf8_view(text_col):
    """(data_u8, offsets_i64) zero-copy views of an Arrow string column:
    ``data[offsets[i]:offsets[i+1]]`` is row i's UTF-8 bytes."""
    import pyarrow as pa

    arr = text_col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    # normalize to offsets[0] == 0 so cumsum indexing is direct
    data = data[offsets[0]:offsets[-1]]
    offsets = offsets - offsets[0]
    return data, offsets


def _class_counts(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row count of True bytes: one cumsum + a gather at row bounds."""
    cs = np.concatenate(([0], np.cumsum(mask, dtype=np.int64)))
    return cs[offsets[1:]] - cs[offsets[:-1]]


def _run_counts(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row count of maximal True-byte runs (== regex ``[class]+`` match
    count): a run starts where mask is True and the previous byte (within
    the same row) is not."""
    if len(mask) == 0:
        return np.zeros(len(offsets) - 1, dtype=np.int64)
    prev = np.empty_like(mask)
    prev[0] = False
    prev[1:] = mask[:-1]
    prev[offsets[:-1][offsets[:-1] < len(mask)]] = False  # row boundaries
    return _class_counts(mask & ~prev, offsets)


def _is_alpha(b: np.ndarray) -> np.ndarray:
    lo = b | np.uint8(0x20)
    return (lo >= 97) & (lo <= 122)


def _is_digit(b: np.ndarray) -> np.ndarray:
    return (b >= 48) & (b <= 57)


def _is_pyspace(b: np.ndarray) -> np.ndarray:
    # Python re \s ASCII part: [ \t\n\r\f\v].  The synthetic corpus has no
    # Unicode whitespace, where Python \s and RE2/DuckDB \s (ASCII-only)
    # would diverge — the pinned-equality test is the tripwire.
    return (b == 32) | ((b >= 9) & (b <= 13))


def token_stats_arrow(tbl, *, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Arrow twin of :func:`token_stats` (pinned equal by
    ``tests/test_text_arrow.py``): counts run over the zero-copy UTF-8
    buffer with numpy byte-class kernels — no object-dtype strings, no
    per-row regex engine.  Byte-level run counting of ASCII classes equals
    codepoint-level counting because multibyte UTF-8 sequences never
    contain ASCII bytes (every byte of them is >= 0x80).  Only the BPE
    pretokenizer count still needs a real regex (RE2 C kernel).  The
    patterns were chosen so Python re, RE2 and DuckDB agree (module
    docstring), so the engine swap preserves the SQL-oracle contract."""
    import pyarrow as pa
    import pyarrow.compute as pc

    text = tbl.column(text_col)
    data, offsets = _utf8_view(text)
    word = _is_alpha(data) | _is_digit(data)
    # codepoint length == count of non-continuation bytes
    n_chars = _class_counts((data & np.uint8(0xC0)) != 0x80, offsets)
    return pa.table({
        id_col: tbl.column(id_col),
        "n_tokens": pa.array(_run_counts(word, offsets)),
        "n_ws_tokens": pa.array(_run_counts(~_is_pyspace(data), offsets)),
        "n_bpe_tokens": pc.cast(pc.count_substring_regex(text, BPE_RE),
                                pa.int64()),
        "n_chars": pa.array(n_chars),
    })


def quality_scores_arrow(tbl, *, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Arrow twin of :func:`quality_scores` (pinned equal by test) — all
    six ratios from ONE pass of numpy byte-class kernels over the
    zero-copy UTF-8 buffer (see :func:`token_stats_arrow` for why byte
    classes are exact)."""
    import pyarrow as pa

    data, offsets = _utf8_view(tbl.column(text_col))
    alpha = _is_alpha(data)
    digit = _is_digit(data)
    n = _class_counts((data & np.uint8(0xC0)) != 0x80, offsets).astype(
        np.float64)
    nz = np.maximum(n, 1.0)
    n_alpha = _class_counts(alpha, offsets).astype(np.float64)
    n_tok = _run_counts(alpha | digit, offsets).astype(np.float64)
    punct = ((data == 46) | (data == 44) | (data == 59) | (data == 58)
             | (data == 33) | (data == 63))  # [.,;:!?]
    return pa.table({
        id_col: tbl.column(id_col),
        "n_chars": pa.array(n.astype(np.int64)),
        "alpha_ratio": pa.array(round_half_away(n_alpha / nz, 6)),
        "digit_ratio": pa.array(round_half_away(
            _class_counts(digit, offsets) / nz, 6)),
        "space_ratio": pa.array(round_half_away(
            _class_counts(data == 32, offsets) / nz, 6)),
        "punct_ratio": pa.array(round_half_away(
            _class_counts(punct, offsets) / nz, 6)),
        "mean_token_len": pa.array(round_half_away(
            n_alpha / np.maximum(n_tok, 1.0), 6)),
    })


class LangId:
    """Actor-pool stage: compiled marker regexes once per actor, batch
    scoring in ``__call__``.  Deterministic argmax with alphabetical
    tie-break; below ``min_hits`` total markers → 'und'."""

    def __init__(self, min_hits: int = 1, text_col: str = "text",
                 id_col: str = "doc_id") -> None:
        import re

        self.res = {lang: re.compile(
            r"\b(?:" + "|".join(words) + r")\b")
            for lang, words in sorted(LANG_MARKERS.items())}
        self.min_hits = min_hits
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df[self.text_col]
        scores = {lang: text.str.count(rx).to_numpy()
                  for lang, rx in self.res.items()}
        langs = sorted(scores)
        mat = np.stack([scores[lang] for lang in langs])  # (L, n)
        best = np.argmax(mat, axis=0)  # first max = alphabetical tiebreak
        total = mat.sum(axis=0)
        pred = np.where(total >= self.min_hits,
                        np.array(langs)[best], "und")
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "pred_lang": pred,
            "marker_hits": total.astype(np.int64),
        })


class LangIdArrow:
    """Arrow twin of :class:`LangId` (pinned equal by test): marker counts
    via RE2 ``count_substring_regex`` over the zero-copy string column.
    Same actor-pool shape; the per-batch RE2 compile of the four tiny
    marker patterns is noise next to the text scan they drive."""

    def __init__(self, min_hits: int = 1, text_col: str = "text",
                 id_col: str = "doc_id") -> None:
        self.patterns = {lang: r"\b(?:" + "|".join(words) + r")\b"
                         for lang, words in sorted(LANG_MARKERS.items())}
        self.min_hits = min_hits
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        text = tbl.column(self.text_col)
        langs = sorted(self.patterns)
        mat = np.stack([pc.count_substring_regex(
            text, self.patterns[lang]).to_numpy(zero_copy_only=False)
            for lang in langs])  # (L, n)
        best = np.argmax(mat, axis=0)  # first max = alphabetical tiebreak
        total = mat.sum(axis=0)
        pred = np.where(total >= self.min_hits, np.array(langs)[best], "und")
        return pa.table({
            self.id_col: tbl.column(self.id_col),
            "pred_lang": pa.array(pred),
            "marker_hits": pa.array(total.astype(np.int64)),
        })


_M61 = np.uint64(MERSENNE)
_P = np.uint64(1_000_003)


def _mersenne_fold(x: np.ndarray) -> np.ndarray:
    """uint64 → congruent value < 2^61 + ε (mod 2^61−1)."""
    return (x & _M61) + (x >> np.uint64(61))


def _mersenne_mul_p(h: np.ndarray) -> np.ndarray:
    """(h · 1000003) mod 2^61−1, vectorized without 128-bit arithmetic:
    split h into 32-bit halves; the high half's 2^32 weight reduces to a
    shift-fold because 2^61 ≡ 1 (mod M)."""
    lo = (h & np.uint64(0xFFFFFFFF)) * _P          # < 2^52
    hi = (h >> np.uint64(32)) * _P                 # < 2^49
    t = ((hi << np.uint64(32)) & _M61) + (hi >> np.uint64(29)) + lo
    return _mersenne_fold(t)


def fingerprint(df: pd.DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> pd.DataFrame:
    """Polynomial rolling-hash fingerprint (mod 2^61−1) of the normalized
    (lower-cased) token stream — stable content identity for exact-dup
    detection across formatting differences.

    Vectorized: md5 runs ONCE PER UNIQUE TOKEN in the batch (the vocab is
    tiny next to the occurrence count; factorize fans the digests out), and
    the Horner chain advances one *token position* per numpy step across
    every document at once.  Bit-identical to the per-token-md5 reference
    loop (tested), and SQL-checkable via DuckDB's ``md5_number_upper``
    (DuckDB's naming is flipped: _upper returns the FIRST 8 digest
    bytes little-endian — see the docs_fingerprints oracle)."""
    from .dedup import _batch_cols, _is_all_ascii, unique_tokens

    n_docs, texts_col, ids_col = _batch_cols(df, text_col, id_col)
    # fast path: for a pure-ASCII batch (the shipped corpora), lowercasing
    # commutes with [A-Za-z0-9]+ tokenization (case folding never moves a
    # token boundary), so tokens come from the byte-run tokenizer and only
    # the vocab-sized unique set is lowercased + case-merged.  Non-ASCII
    # batches (where e.g. U+212A KELVIN SIGN lowercases INTO ASCII 'k')
    # take the exact str.lower() path.
    if _is_all_ascii(texts_col):
        uniq, codes, lens = unique_tokens(texts_col)
        lcodes, luniq = pd.factorize(
            np.asarray([t.lower() for t in uniq], dtype=object))
        codes = (lcodes[codes] if len(codes) else codes)
        uniq = luniq
    else:
        import itertools

        texts_pd = (texts_col if isinstance(texts_col, pd.Series)
                    else texts_col.to_pandas())
        tok_lists = texts_pd.str.lower().str.findall(WORD_RE)
        lens = tok_lists.str.len().to_numpy().astype(np.int64)
        flat = list(itertools.chain.from_iterable(tok_lists))
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    h = np.zeros(n_docs, dtype=np.uint64)
    if lens.sum():
        # little-endian FIRST 8 digest bytes == DuckDB
        # md5_number_upper(tok) (flipped naming), which is what makes
        # the SQL oracle for this operator expressible
        uh = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
             for t in uniq), dtype=np.uint64, count=len(uniq))
        uh_m = _mersenne_fold(uh)          # pre-reduce the 64-bit digests
        tok_h = uh_m[codes]
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        max_len = int(lens.max())
        for j in range(max_len):
            active = lens > j
            idx = starts[active] + j
            ha = _mersenne_mul_p(h[active]) + tok_h[idx]
            h[active] = _mersenne_fold(ha)
        # exact residue in [0, M) to match the reference modulo chain
        h = _mersenne_fold(h)
        h = np.where(h >= _M61, h - _M61, h)
    return pd.DataFrame({id_col: ids_col.to_numpy(),
                         "fingerprint": h.astype(np.int64)})


def sentence_stats_arrow(tbl, *, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Readability/structure audit over the zero-copy UTF-8 buffer:
    sentence count (maximal ``[^.!?]+[.!?]+`` matches — one per
    non-terminator→terminator byte edge, row starts excluded; exact
    under UTF-8 because ``.!?`` are ASCII and multibyte sequences never
    contain ASCII bytes), exclamation/question byte counts, and tokens
    whose first byte is an ASCII uppercase letter."""
    import pyarrow as pa

    text = tbl.column(text_col)
    data, offsets = _utf8_view(text)
    term = (data == 0x2E) | (data == 0x21) | (data == 0x3F)
    prevterm = np.empty_like(term)
    if len(term):
        prevterm[0] = True
        prevterm[1:] = term[:-1]
        prevterm[offsets[:-1][offsets[:-1] < len(term)]] = True
    edge = term & ~prevterm
    word = _is_alpha(data) | _is_digit(data)
    prevword = np.empty_like(word)
    if len(word):
        prevword[0] = False
        prevword[1:] = word[:-1]
        prevword[offsets[:-1][offsets[:-1] < len(word)]] = False
    tok_start = word & ~prevword
    upper_start = tok_start & (data >= 0x41) & (data <= 0x5A)
    return pa.table({
        id_col: tbl.column(id_col),
        "n_sentences": pa.array(_class_counts(edge, offsets)),
        "n_exclaim": pa.array(_class_counts(data == 0x21, offsets)),
        "n_question": pa.array(_class_counts(data == 0x3F, offsets)),
        "n_upper_tokens": pa.array(_class_counts(upper_start, offsets)),
    })
