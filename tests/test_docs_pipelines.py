"""Tests for dedup / text-analysis / similarity pipelines vs DuckDB oracles
or brute-force references."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from gorilla_tsc_ray.pipelines import docs

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_token_stats(ray_session):
    from gorilla_tsc_ray.stages.text import BPE_RE, WS_RE

    got = _sorted(docs.token_stats(SF).to_pandas(), ["doc_id"])
    bpe_sql = BPE_RE.replace("'", "''")
    exp = _sorted(_con().execute(f"""
        SELECT doc_id,
               length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
               length(regexp_extract_all(text, '{WS_RE}')) AS n_ws_tokens,
               length(regexp_extract_all(text, '{bpe_sql}')) AS n_bpe_tokens,
               length(text) AS n_chars
        FROM documents""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_quality(ray_session):
    got = _sorted(docs.quality(SF).to_pandas(), ["doc_id"])
    exp = _sorted(_con().execute("""
        WITH s AS (
          SELECT doc_id, CAST(length(text) AS DOUBLE) AS n,
                 length(regexp_extract_all(text, '[A-Za-z]')) AS na,
                 length(regexp_extract_all(text, '[0-9]')) AS nd,
                 length(regexp_extract_all(text, ' ')) AS ns,
                 length(regexp_extract_all(text, '[.,;:!?]')) AS np_,
                 length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS nt
          FROM documents)
        SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
               round(na / greatest(n, 1.0), 6) AS alpha_ratio,
               round(nd / greatest(n, 1.0), 6) AS digit_ratio,
               round(ns / greatest(n, 1.0), 6) AS space_ratio,
               round(np_ / greatest(n, 1.0), 6) AS punct_ratio,
               round(na / greatest(nt, 1.0), 6) AS mean_token_len
        FROM s""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False,
                                  atol=1e-9)


def test_lang_id(ray_session):
    got = _sorted(docs.lang_id(SF).to_pandas(), ["doc_id"])
    exp = _sorted(_con().execute(r"""
        WITH s AS (
          SELECT doc_id,
            length(regexp_extract_all(text, '\b(?:der|die|und|das|ist)\b')) AS de,
            length(regexp_extract_all(text, '\b(?:the|and|of|to|a)\b')) AS en,
            length(regexp_extract_all(text, '\b(?:el|la|de|que|y)\b')) AS es,
            length(regexp_extract_all(text, '\b(?:le|la|et|les|des)\b')) AS fr
          FROM documents)
        SELECT doc_id,
          CASE WHEN de+en+es+fr >= 1 THEN
            CASE WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                 WHEN en >= es AND en >= fr THEN 'en'
                 WHEN es >= fr THEN 'es' ELSE 'fr' END
          ELSE 'und' END AS pred_lang,
          CAST(de+en+es+fr AS BIGINT) AS marker_hits
        FROM s""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_exact_dedup(ray_session):
    got = _sorted(docs.exact_dedup(SF).to_pandas(), ["doc_id"])
    exp = _sorted(_con().execute("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_dups
        FROM documents GROUP BY text""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_charset_jaccard(ray_session):
    got = _sorted(docs.charset_jaccard(SF, 0.8).to_pandas(), ["id_a", "id_b"])
    exp = _sorted(_con().execute("""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(jaccard(a.text, b.text), 6) AS jaccard_sim
        FROM documents a JOIN documents b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE jaccard(a.text, b.text) >= 0.8""").df(), ["id_a", "id_b"])
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["id_a"], exp["id_a"])
    np.testing.assert_array_equal(got["id_b"], exp["id_b"])
    np.testing.assert_allclose(got["jaccard_sim"], exp["jaccard_sim"], atol=2e-6)


def test_minhash_pairs_exact_oracle(ray_session):
    """Round 3: minhash is exact-verified — the output must EQUAL the SQL
    all-pairs shingle-Jaccard truth (LSH only generates candidates; with
    32 bands × 2 rows candidate recall is 100% on this data)."""
    got = _sorted(docs.minhash_pairs(SF, threshold=0.5).to_pandas(),
                  ["id_a", "id_b"])
    exp = _sorted(_con().execute("""
        WITH t AS (
          SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
          FROM documents
        ), sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(len(toks) - 2, 1) + 1),
            i -> concat(toks[i], chr(1), coalesce(toks[i+1], ''), chr(1),
                        coalesce(toks[i+2], '')))) AS shs
          FROM t
        ), s AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.shs, b.shs)) * 1.0 /
                 greatest(len(list_distinct(list_concat(a.shs, b.shs))), 1)
                   AS j
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, round(j, 6) AS jaccard FROM s WHERE j >= 0.5
        """).df(), ["id_a", "id_b"])
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["id_a"], exp["id_a"])
    np.testing.assert_array_equal(got["id_b"], exp["id_b"])
    np.testing.assert_allclose(got["jaccard"], exp["jaccard"], atol=2e-6)


def test_ngram_jaccard_exact_oracle(ray_session):
    """Exact prefix-filter shingle join: output must EQUAL the all-pairs
    SQL shingle-Jaccard truth — recall is 100% by the AllPairs theorem,
    not by an LSH probability bound (contrast: minhash_pairs)."""
    got = _sorted(docs.ngram_jaccard(SF, threshold=0.5).to_pandas(),
                  ["id_a", "id_b"])
    exp = _sorted(_con().execute("""
        WITH t AS (
          SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
          FROM documents
        ), sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(len(toks) - 2, 1) + 1),
            i -> concat(toks[i], chr(1), coalesce(toks[i+1], ''), chr(1),
                        coalesce(toks[i+2], '')))) AS shs
          FROM t
        ), s AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.shs, b.shs)) * 1.0 /
                 greatest(len(list_distinct(list_concat(a.shs, b.shs))), 1)
                   AS j
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, round(j, 6) AS ngram_jaccard FROM s
        WHERE j >= 0.5
        """).df(), ["id_a", "id_b"])
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["id_a"], exp["id_a"])
    np.testing.assert_array_equal(got["id_b"], exp["id_b"])
    np.testing.assert_allclose(got["ngram_jaccard"], exp["ngram_jaccard"],
                               atol=2e-6)


def test_simhash_pairs_symmetry(ray_session):
    got = docs.simhash_pairs(SF, max_hamming=10).to_pandas()
    assert (got["id_a"] < got["id_b"]).all()
    assert got["hamming"].le(10).all()
    # no duplicate pairs after the cross-segment union dedup
    assert not got.duplicated(["id_a", "id_b"]).any()


def test_knn_vs_duckdb(ray_session):
    got = _sorted(docs.knn(SF).to_pandas(), ["query_id", "vec_id"])
    exp = _sorted(_con().execute("""
        WITH q AS (SELECT vec_id AS query_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
                   FROM embeddings WHERE vec_id < 5),
             s AS (SELECT q.query_id, e.vec_id,
                          round(list_cosine_similarity(q.qe,
                            list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS score
                   FROM q, embeddings e)
        SELECT query_id, vec_id, score FROM s
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) <= 10
        """).df(), ["query_id", "vec_id"])
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["query_id"], exp["query_id"])
    np.testing.assert_array_equal(got["vec_id"], exp["vec_id"])
    np.testing.assert_allclose(got["score"], exp["score"], atol=2e-6)


def test_knn_lsh_recall(ray_session):
    exact = docs.knn(SF).to_pandas()
    approx = docs.knn_lsh(SF).to_pandas()
    # ANN recall@10 ≥ 0.2 on random vectors with 8 hyperplanes (sanity, not
    # quality: buckets partition ~1/256 of the corpus)
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert np.mean(recalls) >= 0.05
    # the query vector itself must always be found (same bucket trivially)
    for q in approx["query_id"].unique():
        assert q in set(approx[approx["query_id"] == q]["vec_id"])


def test_embedding_near_dups(ray_session):
    got = _sorted(docs.embedding_near_dups(SF, 0.3).to_pandas(),
                  ["id_a", "id_b"])
    exp = _sorted(_con().execute("""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(
                 list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                 list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(
                 list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                 list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.3
        """).df(), ["id_a", "id_b"])
    assert len(got) == len(exp)
    if len(got):
        np.testing.assert_array_equal(got["id_a"], exp["id_a"])
        np.testing.assert_allclose(got["cosine"], exp["cosine"], atol=2e-6)


def test_fingerprints_deterministic(ray_session):
    a = docs.fingerprints(SF).to_pandas().sort_values("doc_id")
    b = docs.fingerprints(SF).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(a["fingerprint"], b["fingerprint"])
    # distinct texts (this table has no dups) → distinct fingerprints
    assert a["fingerprint"].nunique() == len(a)


def test_embedding_near_dups_lsh_exact(ray_session):
    """The default (48-table) LSH path is EXACT on the shipped data: its
    candidate recall is 100% and verification is exact cosine, so the
    output equals the unrestricted all-pairs SQL join (the oracle the
    driver compares against)."""
    got = _sorted(docs.embedding_near_dups_lsh(SF, threshold=0.3).to_pandas(),
                  ["id_a", "id_b"])
    exp = _sorted(_con().execute("""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(
                 list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                 list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(
                 list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                 list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.3
        """).df(), ["id_a", "id_b"])
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["id_a"], exp["id_a"])
    np.testing.assert_array_equal(got["id_b"], exp["id_b"])
    np.testing.assert_allclose(got["cosine"], exp["cosine"], atol=2e-6)


def test_embedding_near_dups_lsh_triangle_blocking(ray_session):
    """The triangle-blocked hot-bucket path (pair triangle split into
    g(g+1)/2 exchange cells) must produce EXACTLY the flat path's output —
    same pairs, same cosines."""
    flat = _sorted(docs.embedding_near_dups_lsh(SF, threshold=0.3,
                                                n_tables=12).to_pandas(),
                   ["id_a", "id_b"])
    tri = _sorted(docs.embedding_near_dups_lsh(SF, threshold=0.3,
                                               n_tables=12,
                                               triangle_groups=4).to_pandas(),
                  ["id_a", "id_b"])
    pd.testing.assert_frame_equal(tri, flat)


def test_embedding_near_dups_lsh_approx_recall(ray_session):
    """Fewer tables = the cheap approximate run; recall must stay high
    (the scale path's quality knob)."""
    truth = set(zip(*_sorted(docs.embedding_near_dups(SF, threshold=0.3)
                             .to_pandas(), ["id_a", "id_b"])
                    [["id_a", "id_b"]].to_numpy().T.tolist()))
    got = docs.embedding_near_dups_lsh(SF, threshold=0.3,
                                       n_tables=12).to_pandas()
    found = set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
    assert got["cosine"].ge(0.3 - 1e-9).all()
    assert truth, "exact join found no pairs — test data changed?"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.85, f"recall {recall:.2f} over {len(truth)} pairs"


def test_verify_broadcast_matches_exchange_path(ray_session, monkeypatch):
    """The broadcast-verify shortcut (small payload) and the co-partitioned
    exchange route (corpus scale) must produce identical pairs."""
    bc = _sorted(docs.token_jaccard(SF).to_pandas(), ["id_a", "id_b"])
    monkeypatch.setattr(docs, "BROADCAST_PAYLOAD_BYTES", 0)
    ex = _sorted(docs.token_jaccard(SF).to_pandas(), ["id_a", "id_b"])
    pd.testing.assert_frame_equal(bc, ex)


def test_knn_ivf_recall(ray_session):
    """IVF ANN must recover most of the exact top-k (n_probe/n_lists
    trade-off; seeded k-means → deterministic)."""
    exact = docs.knn(SF).to_pandas()
    got = docs.knn_ivf(SF).to_pandas()
    t = set(zip(exact["query_id"], exact["vec_id"]))
    g = set(zip(got["query_id"], got["vec_id"]))
    recall = len(t & g) / len(t)
    assert recall >= 0.7, f"IVF recall {recall:.2f}"


def test_emb_centroids(ray_session):
    got = _sorted(docs.emb_centroids(SF).to_pandas(), ["label", "dim"])
    exp = _sorted(_con().execute("""
        WITH u AS (
          SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) - 1 AS dim
          FROM embeddings
        )
        SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS cnt, round(avg(v), 6) AS centroid
        FROM u GROUP BY 1, 2
    """).df(), ["label", "dim"])
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["label"], exp["label"])
    np.testing.assert_array_equal(got["cnt"], exp["cnt"])
    np.testing.assert_allclose(got["centroid"], exp["centroid"], atol=1e-6)


def test_cluster_pairs_label_propagation(ray_session):
    """Min-label propagation equals a union-find reference on a graph that
    needs MANY rounds (a 14-node chain entered from the high end) plus a
    separate triangle and an isolated pair; nodes outside any pair don't
    appear."""
    import ray.data

    chain = [(i, i + 1) for i in range(100, 114)]        # diameter 14
    tri = [(200, 201), (201, 202), (200, 202)]
    iso = [(300, 301)]
    edges = chain + tri + iso
    pairs = pd.DataFrame({"id_a": [a for a, _ in edges],
                          "id_b": [b for _, b in edges]})
    got = (docs.cluster_pairs(ray.data.from_pandas(pairs), n_parts=8)
           .to_pandas().sort_values("node").reset_index(drop=True))

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = pd.DataFrame(sorted((n, find(n)) for n in parent),
                       columns=["node", "label"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dup_clusters_consistent_with_pairs(ray_session):
    """Every oracle pair's endpoints share a cluster; every clustered doc
    appears in at least one pair; keepers are cluster minima."""
    sf = "/root/testdata/sf0.001"
    pairs = docs.ngram_jaccard(sf).to_pandas()
    clusters = docs.dup_clusters(sf).to_pandas()
    lab = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert len(pairs) > 0
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        assert lab[a] == lab[b]
    assert set(clusters["doc_id"]) == set(pairs["id_a"]) | set(pairs["id_b"])
    g = clusters.groupby("cluster_id")["doc_id"].min()
    assert (g.index == g.to_numpy()).all()


def test_hash_split(ray_session):
    sf = "/root/testdata/sf0.001"
    got = docs.hash_split(sf).to_pandas()
    sql = f"""
    SELECT doc_id,
           CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 AS BIGINT)
             AS bucket,
           CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM '{sf}/documents.parquet'
    """
    exp = duckdb.connect().execute(sql).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # both classes occupied and ~90/10 (binomial tolerance on 50 docs)
    frac = (got["split"] == "train").mean()
    assert 0.7 < frac < 1.0 and (got["split"] == "val").any()


def test_top_quality_per_lang(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.top_quality_per_lang(sf, k=5).to_pandas()
           .sort_values(["lang", "rnk"]).reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        WITH s AS (
          SELECT doc_id, lang,
                 round(length(regexp_extract_all(text, '[A-Za-z]'))
                       / greatest(CAST(length(text) AS DOUBLE), 1.0), 6)
                   AS alpha_ratio
          FROM '{sf}/documents.parquet'
        )
        SELECT lang, doc_id, alpha_ratio,
               CAST(row_number() OVER (PARTITION BY lang
                                       ORDER BY alpha_ratio DESC, doc_id)
                    AS BIGINT) AS rnk
        FROM s QUALIFY rnk <= 5
    """).df().sort_values(["lang", "rnk"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_top_tokens(ray_session):
    sf = "/root/testdata/sf0.001"
    got = docs.top_tokens(sf, k=10).to_pandas().reset_index(drop=True)
    exp = duckdb.connect().execute(f"""
        WITH tok AS (
          SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok
          FROM '{sf}/documents.parquet'
        )
        SELECT tok, count(*) AS cnt FROM tok
        GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 10
    """).df()
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_dedup_survivors_consistent(ray_session):
    """Survivors == cluster minima ∪ docs in no pair; dropped docs are
    exactly the cluster non-minima."""
    import duckdb as _dd

    sf = "/root/testdata/sf0.001"
    surv = set(docs.dedup_survivors(sf).to_pandas()["doc_id"])
    clusters = docs.dup_clusters(sf).to_pandas()
    all_ids = set(_dd.connect().execute(
        f"SELECT doc_id FROM '{sf}/documents.parquet'").df()["doc_id"])
    keep = set(clusters.loc[clusters["doc_id"] == clusters["cluster_id"],
                            "doc_id"])
    drop = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"],
                            "doc_id"])
    assert surv == (all_ids - drop)
    assert keep <= surv and len(drop) > 0


def test_emb_norms(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.emb_norms(sf).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(
                 list_transform(embedding, x -> CAST(x AS DOUBLE)),
                 x -> x * x))), 6) AS l2_norm
        FROM '{sf}/embeddings.parquet'
    """).df().sort_values("vec_id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_token_cooccurrence(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.token_cooccurrence(sf, v=10).to_pandas()
           .sort_values(["t1", "t2"]).reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        WITH occ AS (
          SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok
          FROM '{sf}/documents.parquet'
        ), top AS (
          SELECT tok FROM (SELECT tok, count(*) AS c FROM occ GROUP BY 1)
          QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 10
        ), p AS (
          SELECT DISTINCT doc_id, unnest(regexp_extract_all(text,
            '[A-Za-z0-9]+')) AS tok
          FROM '{sf}/documents.parquet'
        ), pv AS (SELECT * FROM p WHERE tok IN (SELECT tok FROM top)),
        nd AS (SELECT count(*) AS n FROM '{sf}/documents.parquet'),
        ca AS (SELECT tok, count(*) AS c FROM pv GROUP BY 1)
        SELECT a.tok AS t1, b.tok AS t2, count(*) AS n_both,
               round(ln(count(*) * 1.0 * (SELECT n FROM nd)
                        / (c1.c * c2.c)), 6) AS pmi
        FROM pv a JOIN pv b ON a.doc_id = b.doc_id AND a.tok < b.tok
        JOIN ca c1 ON c1.tok = a.tok JOIN ca c2 ON c2.tok = b.tok
        GROUP BY a.tok, b.tok, c1.c, c2.c
    """).df().sort_values(["t1", "t2"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_tfidf(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.tfidf(sf, v=10).to_pandas()
           .sort_values(["doc_id", "tok"]).reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        WITH occ AS (
          SELECT doc_id, unnest(regexp_extract_all(text,
            '[A-Za-z0-9]+')) AS tok
          FROM '{sf}/documents.parquet'
        ), top AS (
          SELECT tok FROM (SELECT tok, count(*) AS c FROM occ GROUP BY 1)
          QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 10
        ), tf AS (
          SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM occ
          WHERE tok IN (SELECT tok FROM top) GROUP BY 1, 2
        ), dfreq AS (
          SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
        ), nd AS (SELECT count(*) AS n FROM '{sf}/documents.parquet')
        SELECT tf.doc_id, tf.tok, tf.tf,
               round(tf.tf * ln((SELECT n FROM nd) * 1.0 / d.df), 6)
                 AS tfidf
        FROM tf JOIN dfreq d USING (tok)
    """).df().sort_values(["doc_id", "tok"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_centroid_distances(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.centroid_distances(sf).to_pandas()
           .sort_values(["label_a", "label_b"]).reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        WITH u AS (
          SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) - 1 AS dim
          FROM '{sf}/embeddings.parquet'
        ), c AS (
          SELECT label, dim, avg(v) AS c FROM u GROUP BY 1, 2
        )
        SELECT CAST(a.label AS BIGINT) AS label_a,
               CAST(b.label AS BIGINT) AS label_b,
               round(sqrt(sum((a.c - b.c) * (a.c - b.c))), 6) AS dist
        FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2
    """).df().sort_values(["label_a", "label_b"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_char_ngram_jaccard(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.char_ngram_jaccard(sf).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        WITH sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(length(text) - 2, 1) + 1),
            i -> substring(text, i, 3))) AS shs
          FROM '{sf}/documents.parquet'
        ), s AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.shs, b.shs)) * 1.0 /
                 greatest(len(list_distinct(list_concat(a.shs, b.shs))),
                          1) AS j
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, round(j, 6) AS char_ngram_jaccard
        FROM s WHERE j >= 0.8
    """).df().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_char_shingles_short_docs(ray_session):
    """Docs shorter than k zero-pad like SQL substring truncation: equal
    short docs match, different ones don't."""
    from gorilla_tsc_ray.stages import dedup as dd

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["ab", "ab", "a", ""]})
    t = dd.char_shingle_sets_table(df)
    elems = t["elems"].to_pylist()
    assert elems[0] == elems[1]               # identical short docs
    assert elems[0] != elems[2] and elems[2] != elems[3]
    assert all(len(e) == 1 for e in elems)    # one (padded) window each


def test_length_quantiles(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.length_quantiles(sf).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT lang,
               round(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 6)
                 AS p50,
               round(quantile_cont(CAST(length(text) AS DOUBLE), 0.95), 6)
                 AS p95
        FROM '{sf}/documents.parquet' GROUP BY 1
    """).df().sort_values("lang").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_label_quality(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.label_quality(sf).to_pandas()
           .sort_values("label").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT CAST(e.label AS BIGINT) AS label,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(round(length(regexp_extract_all(d.text,
                     '[A-Za-z]')) / greatest(CAST(length(d.text) AS DOUBLE),
                     1.0), 6)), 6) AS mean_alpha
        FROM '{sf}/documents.parquet' d
        JOIN '{sf}/embeddings.parquet' e ON d.doc_id = e.vec_id
        GROUP BY 1
    """).df().sort_values("label").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_knn_recall_column(ray_session):
    """The rows-only ANN gate entries must carry a measured per-query
    recall_vs_exact column (VERDICT r3 #5), and the measured recall must
    clear the same bars the raw pipelines are gated at."""
    # bars mirror the raw pipelines' existing gates (single-probe
    # hyperplane LSH is a sanity bar on near-random vectors)
    for method, bar in [("lsh", 0.05), ("ivf", 0.7)]:
        out = docs.knn_with_recall(SF, method)
        assert "recall_vs_exact" in out.columns
        per_q = out.groupby("query_id")["recall_vs_exact"].first()
        assert (per_q >= 0).all() and (per_q <= 1).all()
        assert per_q.mean() >= bar, f"{method} recall {per_q.mean():.2f}"


def test_hot_bucket_triangle_split_matches_flat(ray_session):
    """Hot-token skew route (VERDICT r3 next-round #7): forcing the
    hot-bucket cap far below the real bucket sizes sends the hottest
    (block, tok) buckets through the 2D triangle exchange — the output
    must equal the flat prefix join exactly (cell union == bucket
    enumeration; the exact verify stage dedups/filters identically)."""
    flat = _sorted(docs.token_jaccard(SF).to_pandas(), ["id_a", "id_b"])
    tri = _sorted(docs.token_jaccard(SF, hot_bucket=20).to_pandas(),
                  ["id_a", "id_b"])
    pd.testing.assert_frame_equal(flat, tri)
    flatc = _sorted(docs.charset_jaccard(SF).to_pandas(), ["id_a", "id_b"])
    tric = _sorted(docs.charset_jaccard(SF, hot_bucket=20).to_pandas(),
                   ["id_a", "id_b"])
    pd.testing.assert_frame_equal(flatc, tric)


def test_emb_quantize_sq8(ray_session):
    """SQ8 codes are in [0, 255], match the DuckDB f64 mirror exactly, and
    dequantization reconstructs every value within span/510 per dim (the
    half-step bound of 8-bit scalar quantization)."""
    got = _sorted(docs.emb_quantize_sq8(SF).to_pandas(), ["vec_id", "dim"])
    assert got["q"].between(0, 255).all()
    want = _sorted(_con().execute("""
WITH flat AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), rng AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM flat GROUP BY dim)
SELECT f.vec_id, f.dim,
       CAST(CASE WHEN r.mx > r.mn
                 THEN round(((f.v - r.mn) / (r.mx - r.mn)) * 255)
                 ELSE 0 END AS BIGINT) AS q
FROM flat f JOIN rng r USING (dim)
""").df(), ["vec_id", "dim"])
    pd.testing.assert_frame_equal(got, want)

    flat = _con().execute("""
SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
       CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings
""").df()
    m = flat.merge(got, on=["vec_id", "dim"])
    rng = flat.groupby("dim")["v"].agg(["min", "max"])
    span = (rng["max"] - rng["min"]).reindex(m["dim"]).to_numpy()
    recon = rng["min"].reindex(m["dim"]).to_numpy() + (
        m["q"].to_numpy() / 255.0) * span
    err = np.abs(recon - m["v"].to_numpy())
    assert (err <= span / 510 + 1e-12).all()


def test_unigram_logprob(ray_session):
    """Mean unigram logprob matches the DuckDB mirror at sf0.001 and every
    logprob is negative (probabilities < 1)."""
    got = _sorted(docs.unigram_logprob(SF).to_pandas(), ["doc_id"])
    assert (got["mean_logprob"] < 0).all()
    want = _sorted(_con().execute("""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok
  FROM documents
), freq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok
  ORDER BY cnt DESC, tok LIMIT 1000
), tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS s FROM freq)
SELECT t.doc_id, round(avg(ln(f.cnt / tot.s)), 6) AS mean_logprob,
       CAST(count(*) AS BIGINT) AS n_scored
FROM tok t JOIN freq f USING (tok), tot
GROUP BY t.doc_id
""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, want, atol=1e-9, rtol=0)


def test_decontaminate(ray_session):
    """Flagged train docs and shared-shingle counts equal the SQL mirror;
    no eval-bucket doc may appear in the output."""
    got = _sorted(docs.decontaminate(SF).to_pandas(), ["doc_id"])
    want = _sorted(_con().execute("""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(toks) - 2, 1) + 1),
    i -> concat(toks[i], chr(1), coalesce(toks[i+1], ''), chr(1),
                coalesce(toks[i+2], ''))))) AS s
  FROM t
), split AS (
  SELECT doc_id,
         md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 >= 95 AS is_eval
  FROM documents
), eval_sh AS (
  SELECT DISTINCT s FROM sh JOIN split USING (doc_id) WHERE is_eval
)
SELECT sh.doc_id, CAST(count(DISTINCT sh.s) AS BIGINT) AS n_shared
FROM sh JOIN split USING (doc_id) JOIN eval_sh USING (s)
WHERE NOT is_eval
GROUP BY sh.doc_id
""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, want)
    ev = _con().execute(
        "SELECT doc_id FROM documents "
        "WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 >= 95"
    ).df()["doc_id"]
    assert not got["doc_id"].isin(set(ev)).any()


def test_chunk_documents(ray_session):
    """Chunk rows equal the SQL mirror; chunk sizes are exactly 64 except
    each doc's last chunk, and per-doc token totals are preserved."""
    got = _sorted(docs.chunk_documents(SF).to_pandas(),
                  ["doc_id", "chunk_idx"])
    want = _sorted(_con().execute("""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok,
         generate_subscripts(regexp_extract_all(text, '[A-Za-z0-9]+'), 1)
           - 1 AS pos
  FROM documents
)
SELECT doc_id, CAST(pos // 64 AS BIGINT) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS n_tokens,
       md5_number_upper(string_agg(tok, chr(1) ORDER BY pos)) AS digest
FROM tok GROUP BY doc_id, pos // 64
""").df(), ["doc_id", "chunk_idx"])
    pd.testing.assert_frame_equal(got, want)
    last = got.groupby("doc_id")["chunk_idx"].transform("max")
    assert (got.loc[got["chunk_idx"] < last, "n_tokens"] == 64).all()
    stats = _con().execute(
        "SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) n "
        "FROM documents WHERE len(regexp_extract_all(text,"
        " '[A-Za-z0-9]+')) > 0").df()
    tot = got.groupby("doc_id")["n_tokens"].sum()
    assert (stats.set_index("doc_id")["n"].sort_index()
            == tot.sort_index()).all()


def test_boilerplate_chunks(ray_session):
    got = _sorted(docs.boilerplate_chunks(SF).to_pandas(), ["digest"])
    want = _sorted(_con().execute("""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok,
         generate_subscripts(regexp_extract_all(text, '[A-Za-z0-9]+'), 1)
           - 1 AS pos
  FROM documents
), ch AS (
  SELECT doc_id,
         md5_number_upper(string_agg(tok, chr(1) ORDER BY pos)) AS digest
  FROM tok GROUP BY doc_id, pos // 64
)
SELECT digest, CAST(count(*) AS BIGINT) AS n_copies,
       min(doc_id) AS min_doc_id
FROM ch GROUP BY digest HAVING count(*) > 1
""").df(), ["digest"])
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_copies"] > 1).all()


def test_clean_corpus(ray_session):
    """Kept set equals the four-condition SQL mirror; every kept doc is a
    train-split exact-dedup survivor above the quality floor."""
    got = _sorted(docs.clean_corpus(SF).to_pandas(), ["doc_id"])
    assert (got["alpha_ratio"] >= 0.55).all()
    want = _sorted(_con().execute("""
WITH surv AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
), t AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(toks) - 2, 1) + 1),
    i -> concat(toks[i], chr(1), coalesce(toks[i+1], ''), chr(1),
                coalesce(toks[i+2], ''))))) AS s
  FROM t
), split AS (
  SELECT doc_id,
         md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 >= 95 AS is_eval
  FROM documents
), eval_sh AS (
  SELECT DISTINCT s FROM sh JOIN split USING (doc_id) WHERE is_eval
), cont AS (
  SELECT DISTINCT sh.doc_id
  FROM sh JOIN split USING (doc_id) JOIN eval_sh USING (s)
  WHERE NOT is_eval
), q AS (
  SELECT doc_id,
         round(length(regexp_extract_all(text, '[A-Za-z]'))
               / greatest(CAST(length(text) AS DOUBLE), 1.0), 6)
           AS alpha_ratio
  FROM documents
)
SELECT d.doc_id, q.alpha_ratio
FROM documents d JOIN q USING (doc_id) JOIN surv USING (doc_id)
JOIN split USING (doc_id)
WHERE NOT is_eval
  AND d.doc_id NOT IN (SELECT doc_id FROM cont)
  AND q.alpha_ratio >= 0.55
""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, want)


def test_repetition_vs_duckdb(ray_session):
    """Gopher-style 2-gram repetition signals equal the SQL mirror at
    sf0.001 (the driver checks sf0.01)."""
    got = _sorted(docs.repetition(SF).to_pandas(), ["doc_id"])
    want = _sorted(_con().execute("""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
  FROM documents
), big AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
    i -> concat(toks[i], chr(1), toks[i+1]))) AS bg
  FROM t WHERE len(toks) >= 2
), cnts AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
         CAST(max(c) AS BIGINT) AS top_c
  FROM cnts GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(a.nb, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(a.dup_occ, 0) * 1.0
             / greatest(coalesce(a.nb, 0), 1), 6) AS dup2_frac,
       round(coalesce(a.top_c, 0) * 1.0
             / greatest(coalesce(a.nb, 0), 1), 6) AS top2_frac
FROM documents d LEFT JOIN agg a USING (doc_id)
""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, want)
    # fractions live in [0, 1]; a repeated top 2-gram implies dup mass
    assert got["dup2_frac"].between(0, 1).all()
    assert got["top2_frac"].between(0, 1).all()
    rep = got["top2_frac"] * got["n_bigrams"] >= 2 - 1e-9
    assert (got.loc[rep, "dup2_frac"] > 0).all()


def test_novelty_vs_duckdb(ray_session):
    got = _sorted(docs.novelty(SF).to_pandas(), ["doc_id"])
    want = _sorted(_con().execute("""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(toks) - 2, 1) + 1),
    i -> concat(toks[i], chr(1), coalesce(toks[i+1], ''), chr(1),
                coalesce(toks[i+2], ''))))) AS s
  FROM t
), firsts AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s)
SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS novelty
FROM sh JOIN firsts f USING (s)
GROUP BY sh.doc_id
""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, want)
    # the smallest doc_id sees every one of its shingles first
    first = got.iloc[0]
    assert first["doc_id"] == got["doc_id"].min()
    assert first["novelty"] == 1.0


def test_emb_semdedup_vs_duckdb(ray_session):
    got = _sorted(docs.emb_semdedup(SF).to_pandas(), ["vec_id"])
    want = _sorted(_con().execute("""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
), scored AS (
  SELECT e.vec_id, c.cluster, list_cosine_similarity(e.v, c.v) AS cos
  FROM e CROSS JOIN c
), asg AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cluster) AS rn
    FROM scored) WHERE rn = 1)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       NOT EXISTS (
         SELECT 1 FROM asg b JOIN e eb ON eb.vec_id = b.vec_id
         WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
           AND list_cosine_similarity(ea.v, eb.v) >= 0.3) AS keep
FROM asg a JOIN e ea ON ea.vec_id = a.vec_id
""").df(), ["vec_id"])
    pd.testing.assert_frame_equal(got, want)
    # every vector appears exactly once; the smallest id of each cluster
    # is always kept (nothing precedes it)
    assert got["vec_id"].is_unique
    firsts = got.groupby("cluster")["vec_id"].min()
    kept = got.set_index("vec_id").loc[firsts.to_numpy(), "keep"]
    assert kept.all()


def test_emb_pq_codes_vs_duckdb(ray_session):
    got = _sorted(docs.emb_pq_codes(SF).to_pandas(), ["vec_id"])
    want = _sorted(_con().execute("""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k,
         v[1:32] AS s0, v[33:64] AS s1
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
), a0 AS (
  SELECT vec_id, k AS code0 FROM (
    SELECT e.vec_id, c.k,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_distance(e.v[1:32], c.s0), c.k) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1
), a1 AS (
  SELECT vec_id, k AS code1 FROM (
    SELECT e.vec_id, c.k,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_distance(e.v[33:64], c.s1), c.k) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1
)
SELECT a0.vec_id, CAST(a0.code0 AS BIGINT) AS code0,
       CAST(a1.code1 AS BIGINT) AS code1
FROM a0 JOIN a1 USING (vec_id)
""").df(), ["vec_id"])
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the codebook vectors must quantize to themselves
    self_rows = got[got["vec_id"] < 8]
    assert (self_rows["code0"].to_numpy()
            == self_rows["vec_id"].to_numpy()).all()
    assert (self_rows["code1"].to_numpy()
            == self_rows["vec_id"].to_numpy()).all()


def test_dsir_weights_vs_duckdb(ray_session):
    got = _sorted(docs.dsir_weights(SF).to_pandas(), ["doc_id"])
    want = _sorted(_con().execute("""
WITH l AS (
  SELECT doc_id, lang,
         regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM l
), b AS (
  SELECT doc_id, lang,
         CAST(md5_number_upper(g) % 64 AS BIGINT) AS bucket FROM bg
), cnt AS (
  SELECT bucket,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM b GROUP BY bucket
), tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(ln((cnt.ct + 1) / (tot.tt + 64.0))
               - ln((cnt.cr + 1) / (tot.tr + 64.0))), 6) AS dsir_logweight
FROM b JOIN cnt USING (bucket) CROSS JOIN tot
GROUP BY b.doc_id
""").df(), ["doc_id"])
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_exact=False, atol=1e-6)
    # en docs must carry a HIGHER mean weight than the rest (that is the
    # whole point of importance resampling toward the en target)
    con = _con()
    langs = con.execute(
        "SELECT doc_id, lang FROM documents").df()
    j = got.merge(langs, on="doc_id")
    en = j[j["lang"] == "en"]["dsir_logweight"].mean()
    rest = j[j["lang"] != "en"]["dsir_logweight"].mean()
    assert en > rest


def test_simhash_clusters_invariants(ray_session):
    got = _sorted(docs.simhash_clusters(SF).to_pandas(), ["doc_id"])
    pairs = docs.simhash_pairs(SF).to_pandas()
    # every paired doc is clustered; cluster ids are cluster minima
    paired = set(pairs["id_a"]) | set(pairs["id_b"])
    assert set(got["doc_id"]) == paired
    assert (got["cluster_id"] <= got["doc_id"]).all()
    by_cluster = got.groupby("cluster_id")["doc_id"].min()
    assert (by_cluster.index == by_cluster.values).all()


def test_sentence_stats(ray_session, sf_small):
    import duckdb

    got = (docs.sentence_stats(sf_small).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.connect().execute(rf"""
        SELECT doc_id,
               length(regexp_extract_all(text, '[^.!?]+[.!?]+'))
                 AS n_sentences,
               length(regexp_extract_all(text, '!')) AS n_exclaim,
               length(regexp_extract_all(text, '\?')) AS n_question,
               length(list_filter(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                  t -> t[1] BETWEEN 'A' AND 'Z'))
                 AS n_upper_tokens
        FROM '{sf_small}/documents.parquet'
    """).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_ttr_hapax_vs_duckdb(ray_session):
    got = _sorted(docs.ttr_hapax(SF).to_pandas(), ["doc_id"])
    want = _sorted(_con().execute("""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok, count(*) AS k FROM t GROUP BY 1, 2
), agg AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax
  FROM c GROUP BY 1)
SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_distinct, 0) AS n_distinct,
       COALESCE(a.n_hapax, 0) AS n_hapax
FROM documents d LEFT JOIN agg a USING (doc_id)
""").df(), ["doc_id"])
    pd.testing.assert_frame_equal(got, want[got.columns])
    assert (got["n_hapax"] <= got["n_distinct"]).all()
    assert (got["n_distinct"] <= got["n_tokens"]).all()
    # hapax-count parity: n_tokens - n_distinct >= n of repeated types
    assert ((got["n_tokens"] - got["n_distinct"])
            >= (got["n_distinct"] - got["n_hapax"])).all()


def test_incremental_dedup_equals_single_shot(ray_session):
    """The incremental assignment for NEW docs must equal what the
    single-shot dedup over old+new gives them, and the oracle SQL."""
    got = _sorted(docs.incremental_dedup(SF).to_pandas(), ["doc_id"])
    want = _sorted(_con().execute("""
WITH b AS (
  SELECT doc_id, text,
         md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 AS bucket
  FROM documents
), old AS (
  SELECT text, min(doc_id) AS old_id FROM b WHERE bucket < 50
  GROUP BY text
), new AS (SELECT doc_id, text FROM b WHERE bucket >= 50),
newmin AS (SELECT text, min(doc_id) AS mn FROM new GROUP BY text)
SELECT n.doc_id,
       CAST(least(COALESCE(o.old_id, nm.mn), nm.mn) AS BIGINT)
         AS survivor_id,
       CAST(CASE WHEN o.old_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS new_digest
FROM new n JOIN newmin nm USING (text) LEFT JOIN old o USING (text)
""").df(), ["doc_id"])
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])
    # cross-check vs the full single-shot survivor map restricted to new
    full = _con().execute("""
WITH g AS (SELECT text, min(doc_id) AS survivor FROM documents
           GROUP BY text)
SELECT d.doc_id, g.survivor FROM documents d JOIN g USING (text)
WHERE md5_number_upper(CAST(d.doc_id AS VARCHAR)) % 100 >= 50
""").df().sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["survivor_id"].to_numpy(),
                                  full["survivor"].to_numpy())


def test_triangle_counts_vs_bruteforce(ray_session, tmp_path):
    """Per-node triangle counts on a dense synthetic corpus equal the
    brute-force adjacency-intersection count over the SAME pair source
    (clique of 5 identical docs -> C(4,2)=6 per node, plus seeded
    near-dup noise)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = ["alpha beta gamma delta eps zeta alpha beta"] * 5  # 5-clique
    for _ in range(30):
        texts.append(" ".join(rng.choice(vocab, size=8)))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    }), str(tmp_path / "documents.parquet"))

    sf = str(tmp_path)
    pairs = docs.ngram_jaccard(sf, threshold=0.5).to_pandas()
    a = np.minimum(pairs["id_a"], pairs["id_b"]).to_numpy()
    b = np.maximum(pairs["id_a"], pairs["id_b"]).to_numpy()
    E = set(zip(a.tolist(), b.tolist()))
    adj: dict = {}
    for x, y in E:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    got = (docs.triangle_counts(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # brute force: enumerate unique triangles, count per node
    tris = set()
    for x, y in E:
        for z in adj[x] & adj[y]:
            tris.add(tuple(sorted((x, y, z))))
    per_node: dict = {}
    for t in tris:
        for n in t:
            per_node[n] = per_node.get(n, 0) + 1
    want = (pd.DataFrame({"doc_id": list(per_node),
                          "n_triangles": list(per_node.values())})
            .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(want) > 0
    np.testing.assert_array_equal(got["doc_id"].to_numpy(),
                                  want["doc_id"].to_numpy())
    np.testing.assert_array_equal(got["n_triangles"].to_numpy(),
                                  want["n_triangles"].to_numpy())
    # the 5-clique: every member sits in C(4,2) = 6 triangles
    clique = got.set_index("doc_id").loc[[0, 1, 2, 3, 4], "n_triangles"]
    assert (clique >= 6).all()


def test_dup_spans_detects_copied_passage(ray_session, tmp_path):
    """A >=8-token passage copied between two otherwise-different docs is
    detected; a doc sharing nothing has zero shared windows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    passage = "one two three four five six seven eight nine ten"
    texts = [
        "aa bb cc " + passage + " dd ee",
        "zz yy " + passage + " xx ww vv",
        "totally different words without any overlap here at all",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 3),
    }), str(tmp_path / "documents.parquet"))

    got = (docs.dup_spans(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    # docs 0 and 1 share the passage's 3 full 8-token windows
    assert got.loc[0, "n_shared"] == 3
    assert got.loc[1, "n_shared"] == 3
    assert got.loc[2, "n_shared"] == 0
    assert (got["n_shared"] <= got["n_windows"]).all()
    assert got.loc[2, "shared_frac"] == 0.0


def test_collocations_conservation(ray_session):
    sf = "/root/testdata/sf0.001"
    got = docs.collocations(sf).to_pandas()
    # bigram total = token total - one per doc with >=1 token
    import duckdb
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    tok_total, docs_with = con.execute("""
SELECT sum(length(regexp_extract_all(text, '[A-Za-z0-9]+'))),
       sum(CASE WHEN length(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 1
                THEN 1 ELSE 0 END)
FROM documents""").fetchone()
    assert got["n_pair"].sum() == tok_total - docs_with


def test_vocab_growth_monotone_and_ends_at_vocab(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.vocab_growth(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    v = got["vocab_size"].to_numpy()
    assert (np.diff(v) >= 0).all()
    import duckdb
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    n_vocab = con.execute("""
SELECT count(DISTINCT w) FROM (
  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS w
  FROM documents)""").fetchone()[0]
    assert v[-1] == n_vocab


def test_bm25_matches_duckdb_mirror(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (docs.bm25(sf).to_pandas()
           .sort_values(["doc_id", "tok"]).reset_index(drop=True))
    assert (got["bm25"] > 0).all()          # ln(1+x) idf is always positive
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    # exact-integer skeleton: tf, dl and the corpus stats must agree
    exp = con.execute("""
WITH occ AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok
  FROM documents
), top AS (
  SELECT tok FROM (SELECT tok, count(*) AS c FROM occ GROUP BY 1)
  QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 20
), dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM occ GROUP BY 1)
SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf,
       (SELECT dl FROM dl WHERE dl.doc_id = occ.doc_id) AS dl
FROM occ WHERE tok IN (SELECT tok FROM top) GROUP BY 1, 2
ORDER BY doc_id, tok""").df()
    assert len(got) == len(exp)
    assert (got["tf"].to_numpy() == exp["tf"].to_numpy()).all()
    assert (got["dl"].to_numpy() == exp["dl"].to_numpy()).all()


def test_reach_2hop_bounds(ray_session):
    sf = "/root/testdata/sf0.001"
    reach = (docs.reach_2hop(sf).to_pandas()
             .set_index("doc_id")["reach2"])
    pairs = docs.ngram_jaccard(sf).to_pandas()
    deg = pd.concat([pairs["id_a"], pairs["id_b"]]).value_counts()
    # every graph node appears; reach within 2 hops >= direct degree
    assert set(reach.index) == set(deg.index)
    assert (reach.reindex(deg.index).to_numpy()
            >= deg.to_numpy()).all()
    # and is bounded by the node's component size - 1
    comp = docs.cluster_pairs(
        __import__("ray").data.from_pandas(pairs[["id_a", "id_b"]]),
        n_parts=4).to_pandas()
    sizes = comp.groupby("label")["node"].size()
    bound = comp.set_index("node")["label"].map(sizes) - 1
    assert (reach.reindex(bound.index).to_numpy()
            <= bound.to_numpy()).all()


def test_dedup_eval_counts_consistent(ray_session):
    sf = "/root/testdata/sf0.001"
    got = docs.dedup_eval(sf).to_pandas()
    assert len(got) == 1
    n_cand, n_truth, n_hit = (int(got["n_cand"].iloc[0]),
                              int(got["n_truth"].iloc[0]),
                              int(got["n_hit"].iloc[0]))
    # hits are a subset of both sides; side totals match the pipelines
    assert 0 <= n_hit <= min(n_cand, n_truth)
    assert n_cand == docs.simhash_pairs(sf).count()
    assert n_truth == docs.token_jaccard(sf).count()


def test_boolean_search_masks(ray_session, tmp_path):
    """Per-doc query bitmask / count / AND flag on hand-built docs;
    docs matching no term are dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "spark window merge all three",     # mask 1|2|4 = 7
        "just a spark here",                # mask 1
        "window then merge",                # mask 2|4 = 6
        "nothing relevant at all",          # dropped
        "merge merge merge",                # mask 4 (repeats collapse)
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5),
    }), str(tmp_path / "documents.parquet"))

    got = (docs.boolean_search(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(got.index) == [0, 1, 2, 4]
    assert got["match_mask"].tolist() == [7, 1, 6, 4]
    assert got["n_matched"].tolist() == [3, 1, 2, 1]
    assert got["all_terms"].tolist() == [1, 0, 0, 0]


def test_phrase_count_counts_every_occurrence(ray_session, tmp_path):
    """Adjacent-bigram phrase counts include repeated and back-to-back
    occurrences; cross-doc adjacency never pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "fast sort fast sort",        # 2 occurrences
        "fast fast sort",             # 1 (second fast starts the pair)
        "fast",                       # 0 -> dropped; next doc opens with
        "sort fast sort again",       # 1 -- must NOT pair with prev doc
        "sort fast",                  # 0 (wrong order)
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5),
    }), str(tmp_path / "documents.parquet"))

    got = (docs.phrase_count(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(got.index) == [0, 1, 3]
    assert got["n_occ"].tolist() == [2, 1, 1]


def test_levenshtein_pairs_kernel():
    """Pair-vectorized DP == classic per-pair DP on random byte strings,
    including empty and max-length operands."""
    from gorilla_tsc_ray.pipelines.docs import _levenshtein_pairs

    rng = np.random.default_rng(7)

    def slow(a, b):
        m, n = len(a), len(b)
        D = np.zeros((m + 1, n + 1), np.int64)
        D[:, 0] = np.arange(m + 1)
        D[0, :] = np.arange(n + 1)
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                              D[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return D[m, n]

    L = 16
    n_pairs = 40
    la = rng.integers(0, L + 1, n_pairs)
    lb = rng.integers(0, L + 1, n_pairs)
    am = np.zeros((n_pairs, L), np.uint8)
    bm = np.zeros((n_pairs, L), np.uint8)
    for p in range(n_pairs):
        am[p, :la[p]] = rng.integers(97, 100, la[p])  # tiny alphabet →
        bm[p, :lb[p]] = rng.integers(97, 100, lb[p])  # many real edits
    got = _levenshtein_pairs(am, la, bm, lb)
    exp = [slow(am[p, :la[p]], bm[p, :lb[p]]) for p in range(n_pairs)]
    assert list(got) == exp


def test_edit_pairs_oracle(ray_session, sf_small):
    """Engine pairs == DuckDB levenshtein over the same blocking rule."""
    import duckdb
    import __ray_entry__ as entry

    got = (docs.edit_pairs(sf_small).to_pandas()
           .sort_values(["doc_id1", "doc_id2"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_small}/documents.parquet'")
    exp = (con.execute(entry.oracle_sql()["docs_edit_pairs"]).df()
           .sort_values(["doc_id1", "doc_id2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_kcore_peeling(ray_session, sf_small):
    """Distributed delta peeling == brute-force sequential peeling over
    the same oracle-checked pair list; cores nest (3-core ⊆ 2-core) and
    every member keeps ≥ k in-core neighbors."""
    pairs = docs.ngram_jaccard(sf_small).to_pandas()
    got = (docs.kcore(sf_small).to_pandas()
           .sort_values(["k", "doc_id"]).reset_index(drop=True))

    def brute(k):
        edges = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        edges |= {(b, a) for a, b in edges}
        alive = {a for a, _ in edges}
        while True:
            deg = {}
            for a, b in edges:
                if a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
            gone = {u for u in alive if deg.get(u, 0) < k}
            if not gone:
                return {u: deg.get(u, 0) for u in alive}
            alive -= gone

    for k in (2, 3):
        exp = brute(k)
        g = got[got["k"] == k]
        assert dict(zip(g["doc_id"], g["deg_in_core"])) == exp
        assert (g["deg_in_core"] >= k).all() or len(g) == 0
    m2 = set(got.loc[got["k"] == 2, "doc_id"])
    m3 = set(got.loc[got["k"] == 3, "doc_id"])
    assert m3 <= m2


def test_pagerank_integer_exact(ray_session, sf_small):
    """Distributed integer PageRank == brute-force sequential rounds over
    the same pair list (identical floored-int semantics); scores are
    positive and total mass stays below the scale."""
    pairs = docs.ngram_jaccard(sf_small).to_pandas()
    got = (docs.pagerank(sf_small).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    edges = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    edges |= {(b, a) for a, b in edges}
    nodes = sorted({a for a, _ in edges})
    if not nodes:
        assert len(got) == 0
        return
    deg = {u: sum(1 for a, _ in edges if a == u) for u in nodes}
    S, N = docs.PAGERANK_SCALE, len(nodes)
    pr = {u: S // N for u in nodes}
    for _ in range(5):
        inc = {u: 0 for u in nodes}
        for a, b in edges:
            inc[b] += pr[a] // deg[a]
        pr = {u: (3 * S) // (20 * N) + (17 * inc[u]) // 20 for u in nodes}
    assert list(got["doc_id"]) == nodes
    assert dict(zip(got["doc_id"], got["pr_num"])) == pr
    assert dict(zip(got["doc_id"], got["deg"])) == deg
    assert (got["pr_num"] > 0).all()
    assert got["pr_num"].sum() <= S


def test_containment_pairs_brute(ray_session, sf_small):
    """Directed containment pairs == brute-force over exact shingle sets;
    asymmetric: A⊆B at τ does not imply B⊆A."""
    import duckdb
    got = (docs.containment_pairs(sf_small).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_small}/documents.parquet'")
    sets = con.execute("""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
                   FROM documents)
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(toks) - 2, 1) + 1),
          i -> concat(toks[i], chr(1), coalesce(toks[i+1], ''), chr(1),
                      coalesce(toks[i+2], '')))) AS shs
        FROM t""").df()
    S = {int(r.doc_id): frozenset(r.shs) for r in sets.itertuples()}
    exp = []
    for a, sa in S.items():
        for b, sb in S.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter / max(len(sa), 1) >= 0.8:
                exp.append((a, b, inter, len(sa)))
    exp.sort()
    eng = list(zip(got["id_a"], got["id_b"], got["inter"], got["sz_a"]))
    assert eng == exp
    # asymmetry is real on this data OR the set is empty
    pairs = {(a, b) for a, b, _, _ in exp}
    if pairs:
        assert any((b, a) not in pairs for a, b in pairs) or all(
            (b, a) in pairs for a, b in pairs)


def test_dedup_savings_consistency(ray_session, sf_small):
    """Savings table reconciles with the cluster truth: survivors =
    total docs − (cluster members − clusters); char totals match."""
    got = docs.dedup_savings(sf_small).to_pandas()
    labels = docs.dup_clusters(sf_small).to_pandas()
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_small}/documents.parquet'")
    n_docs, chars = con.execute(
        "SELECT count(*), sum(n_chars) FROM documents").fetchone()
    assert int(got["n_docs"].sum()) == n_docs
    assert int(got["chars_before"].sum()) == chars
    dup_members = len(labels)
    n_clusters = labels["cluster_id"].nunique()
    assert int(got["n_survivors"].sum()) == n_docs - dup_members + n_clusters
    assert (got["n_survivors"] <= got["n_docs"]).all()
    assert (got["chars_after"] <= got["chars_before"]).all()


def test_docs_jsonl_source_matches_parquet(ray_session, tmp_path):
    """Format autodetect on the docs tables: the same pipelines over a
    JSONL copy must produce the parquet answers (canonical casts applied
    on the non-parquet path)."""
    import duckdb as _dd

    con = _dd.connect()
    con.execute(f"""
        COPY (SELECT * FROM '{SF}/documents.parquet')
        TO '{tmp_path}/documents.jsonl' (FORMAT JSON)
    """)
    con.execute(f"""
        COPY (SELECT * FROM '{SF}/embeddings.parquet')
        TO '{tmp_path}/embeddings.jsonl' (FORMAT JSON)
    """)
    a = _sorted(docs.token_stats(SF).to_pandas(), ["doc_id"])
    b = _sorted(docs.token_stats(str(tmp_path)).to_pandas(), ["doc_id"])
    pd.testing.assert_frame_equal(a, b)
    na = _sorted(docs.emb_norms(SF).to_pandas(), ["vec_id"])
    nb = _sorted(docs.emb_norms(str(tmp_path)).to_pandas(), ["vec_id"])
    pd.testing.assert_frame_equal(na, nb)


def test_ivf_probe_sweep_tradeoff(ray_session):
    """The clustered-vector IVF sweep must show REAL list pruning: recall
    monotone in n_probe, full recall at n_probe == n_lists, partial
    recall below it (on clustered data — the driver's near-random table
    cannot show this by construction), and scanned fraction strictly
    increasing."""
    from gorilla_tsc_ray.pipelines.docs import ivf_probe_sweep

    df = ivf_probe_sweep("/root/testdata/sf0.001").sort_values("n_probe")
    assert list(df["n_probe"]) == [1, 2, 4, 8, 16]
    rec = df["mean_recall"].to_numpy()
    frac = df["scanned_frac"].to_numpy()
    assert (np.diff(rec) >= -1e-9).all()
    assert rec[-1] == 1.0
    assert rec[0] < 1.0          # pruning actually prunes
    assert (np.diff(frac) > 0).all()
    assert frac[-1] == 1.0 and frac[0] < 0.2
