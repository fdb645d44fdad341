"""Text-analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Everything is vectorized pandas/regex per batch; regexes use character
classes with identical semantics in Python ``re`` and DuckDB RE2 so the
token/quality metrics are SQL-oracle-checkable.
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
    import itertools

    texts = df[text_col].str.lower()
    tok_lists = texts.str.findall(WORD_RE)
    lens = tok_lists.str.len().to_numpy().astype(np.int64)
    n_docs = len(df)
    h = np.zeros(n_docs, dtype=np.uint64)
    if lens.sum():
        flat = list(itertools.chain.from_iterable(tok_lists))
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
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
    return pd.DataFrame({id_col: df[id_col].to_numpy(),
                         "fingerprint": h.astype(np.int64)})
