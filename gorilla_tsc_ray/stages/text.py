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


def token_stats(df: pd.DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> pd.DataFrame:
    """Token count (``[A-Za-z0-9]+`` matches) + whitespace-split count."""
    text = df[text_col]
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(),
        "n_tokens": text.str.count(WORD_RE).to_numpy().astype(np.int64),
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
        scores = {lang: text.str.count(rx.pattern).to_numpy()
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


def fingerprint(df: pd.DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> pd.DataFrame:
    """Polynomial rolling-hash fingerprint (mod 2^61-1) of the normalized
    token stream — stable content identity for exact-dup detection across
    formatting differences."""
    out_fp = np.empty(len(df), dtype=np.uint64)
    for i, t in enumerate(df[text_col]):
        h = 0
        for tok in pd.Series([t]).str.findall(WORD_RE)[0]:
            hw = int.from_bytes(hashlib.md5(tok.lower().encode()).digest()[:8],
                                "big")
            h = (h * 1_000_003 + hw) % MERSENNE
        out_fp[i] = h
    return pd.DataFrame({id_col: df[id_col].to_numpy(),
                         "fingerprint": out_fp.astype(np.int64)})
