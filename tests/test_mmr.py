"""MMR diversified retrieval (x229): pure-Python reference equality,
run-to-run determinism, and the diversity property that justifies the
operator (the MMR set is no MORE redundant than the relevance-only
top-k)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.simfns import cosine_topk, mmr_diversified_topk

LAM = 0.7


def _reference_mmr(cands, k_final):
    """Sequential-greedy reference on one query's candidate list:
    [(neighbor_id, rel, vec)] -> [(rank, neighbor_id, score)]."""
    cands = sorted(cands, key=lambda c: c[0])
    ids = [c[0] for c in cands]
    rel = np.array([c[1] for c in cands])
    mat = np.array([c[2] for c in cands], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = 1.0
    sims = np.round((mat @ mat.T) / np.outer(norms, norms), 9)
    out, chosen, avail = [], [], set(range(len(ids)))
    for rank in range(1, min(k_final, len(ids)) + 1):
        best_i, best_sc = None, None
        for i in sorted(avail):
            if chosen:
                red = max(sims[i][j] for j in chosen)
                sc = round(LAM * rel[i] - (1 - LAM) * red, 9)
            else:
                sc = round(rel[i], 9)
            if best_sc is None or sc > best_sc:
                best_i, best_sc = i, sc
        out.append((rank, ids[best_i], best_sc))
        chosen.append(best_i)
        avail.discard(best_i)
    return out


def _run(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 100)
    queries = e.filter(F.col("vec_id") < 10)
    return corpus, queries, mmr_diversified_topk(corpus, queries, 20, 5, LAM)


def test_mmr_matches_reference(spark, sf_dir):
    corpus, queries, out = _run(spark, sf_dir)
    got = out.toPandas()
    cands = cosine_topk(corpus, queries, k=20).toPandas()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in corpus.select("vec_id", "embedding").collect()
    }
    for qid, grp in got.groupby("query_id"):
        cl = [
            (r.neighbor_id, r.cos_sim, emb[r.neighbor_id])
            for r in cands[cands.query_id == qid].itertuples()
        ]
        want = _reference_mmr(cl, 5)
        have = [
            (int(r.mmr_rank), int(r.neighbor_id), float(r.mmr_score))
            for r in grp.sort_values("mmr_rank").itertuples()
        ]
        assert [w[:2] for w in want] == [h[:2] for h in have], (qid, want, have)
        for w, h in zip(want, have):
            assert abs(w[2] - h[2]) < 1e-9, (qid, w, h)


def test_mmr_deterministic(spark, sf_dir):
    _, _, out1 = _run(spark, sf_dir)
    _, _, out2 = _run(spark, sf_dir)
    a = [tuple(r) for r in out1.collect()]
    b = [tuple(r) for r in out2.collect()]
    assert a == b


def test_mmr_diversity_property(spark, sf_dir):
    """Mean pairwise cosine within the MMR-5 must not exceed the
    relevance-only top-5's (that's the whole point of the re-rank)."""
    corpus, queries, out = _run(spark, sf_dir)
    got = out.toPandas()
    top5 = cosine_topk(corpus, queries, k=5).toPandas()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in corpus.select("vec_id", "embedding").collect()
    }

    def mean_pairwise(ids):
        mat = np.array([emb[i] for i in ids])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        s = (mat @ mat.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(ids), 1)
        return float(s[iu].mean())

    worse = 0
    for qid in got.query_id.unique():
        m_ids = list(got[got.query_id == qid].neighbor_id)
        t_ids = list(top5[top5.query_id == qid].neighbor_id)
        if mean_pairwise(m_ids) > mean_pairwise(t_ids) + 1e-9:
            worse += 1
    assert worse == 0, f"{worse} queries got MORE redundant after MMR"
