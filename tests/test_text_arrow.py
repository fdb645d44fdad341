"""Arrow text kernels pinned equal to the pandas twins on the real
documents corpus (sf0.001) plus adversarial strings — the regex counts
must agree between Python re (pandas path), RE2 (Arrow path) and DuckDB
(the oracle), which the module's pattern choices guarantee; this test is
the tripwire if a pattern ever stops satisfying that."""
import numpy as np
import pandas as pd
import pyarrow as pa

from gorilla_tsc_ray.stages import text as tx

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    extra = pd.DataFrame({
        "doc_id": np.arange(6) + 10_000_000,
        "text": ["", "it's the fox's den, isn't it?  'tis 42nd",
                 "  l'école—déjà vu… 3.14 ¡hola!  ", "a" * 5000,
                 "\t tab\nnewline\x0bvtab\x0cff\r cr end\t",
                 "a1b2 ..!? ;;: x"],
    })
    return pd.concat([df, extra], ignore_index=True)


def _cmp(out_pd: pd.DataFrame, out_ar) -> None:
    out_ar = out_ar.to_pandas()
    pd.testing.assert_frame_equal(out_pd.reset_index(drop=True), out_ar,
                                  check_dtype=False)
    for c in out_pd.columns:
        assert out_pd[c].dtype == out_ar[c].dtype, c


def test_token_stats_arrow_matches():
    df = _docs()
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    _cmp(tx.token_stats(df), tx.token_stats_arrow(tbl))


def test_quality_scores_arrow_matches():
    df = _docs()
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    _cmp(tx.quality_scores(df), tx.quality_scores_arrow(tbl))


def test_lang_id_arrow_matches():
    df = _docs()
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    _cmp(tx.LangId()(df), tx.LangIdArrow()(tbl))


def test_fingerprint_fast_path_matches_reference_loop():
    """The ASCII fast path (byte-run tokens + vocab-sized lowercase merge)
    and the non-ASCII str.lower() fallback must both equal the per-doc
    reference modulo chain — including U+212A KELVIN SIGN, which
    lowercases INTO ASCII 'k' and so must route to the fallback."""
    import hashlib
    import re

    from gorilla_tsc_ray.stages import text as tx

    M = (1 << 61) - 1

    def ref_fp(t):
        h = 0
        for tok in re.findall(tx.WORD_RE, t.lower()):
            d = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                               "little")
            h = (h * 1_000_003 + d) % M
        return h

    df = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    adv = pd.DataFrame({"doc_id": np.arange(6) + 10_000_000, "text": [
        "The THE the", "temKperature 300K", "café Lait", "",
        "Mixed CASE mixed case", "K"]})
    for frame in (df, adv):
        got = tx.fingerprint(frame)["fingerprint"].to_numpy()
        want = frame["text"].map(ref_fp).astype(np.int64).to_numpy()
        assert np.array_equal(got, want)
