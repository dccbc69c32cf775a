"""trec_eval / ndeval replication (`Homeworks/HW6/test.py:24-77, 80-112`):
hand-computed fixtures pin every convention — tie order, division by k,
division by R, graded nDCG, alpha-nDCG greedy ideal, P-IA averaging."""

import math

import pytest

from searchengine_ray.evalmetrics import (
    ndeval_run,
    read_diversity_qrels,
    read_trec_run,
    trec_eval_run,
)


def test_p_at_k_and_map_hand_computed():
    # ranked (score desc): d1 d2 d3 d4 d5; relevant: d1 (rank1), d4 (rank4),
    # plus unretrieved d9 -> R=3
    run = {"1": [("d1", 5.0), ("d2", 4.0), ("d3", 3.0), ("d4", 2.0), ("d5", 1.0)]}
    qrels = {"1": {"d1": 1, "d4": 2, "d9": 1, "d2": 0}}
    m = trec_eval_run(run, qrels, ks=(2, 5))
    q = m["per_query"]["1"]
    assert q["P@2"] == 1 / 2
    assert q["P@5"] == 2 / 5
    # AP = (1/1 + 2/4) / R=3
    assert q["MAP"] == pytest.approx((1.0 + 0.5) / 3)
    assert m["MAP"] == q["MAP"]  # single topic


def test_tie_break_docno_descending():
    # equal scores: trec_eval ranks docno DESCENDING -> dZ before dA
    run = {"1": [("dA", 1.0), ("dZ", 1.0)]}
    qrels = {"1": {"dZ": 1}}
    m = trec_eval_run(run, qrels, ks=(1,))
    assert m["per_query"]["1"]["P@1"] == 1.0  # dZ ranked first


def test_ndcg_graded_hand_computed():
    # ranked: d1(rel 3), d2(rel 0), d3(rel 2); ideal gains [3, 2]
    run = {"1": [("d1", 3.0), ("d2", 2.0), ("d3", 1.0)]}
    qrels = {"1": {"d1": 3, "d3": 2}}
    m = trec_eval_run(run, qrels, ks=(3,))
    dcg = 3 / math.log2(2) + 2 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3)
    assert m["per_query"]["1"]["ndcg_cut_3"] == pytest.approx(dcg / idcg)


def test_mean_over_qrels_topics_unjudged_run_topics_ignored():
    run = {
        "1": [("d1", 1.0)],
        "99": [("dX", 1.0)],  # not in qrels -> ignored entirely
    }
    qrels = {"1": {"d1": 1}, "2": {"d2": 1}}  # topic 2 has no run -> zeros
    m = trec_eval_run(run, qrels, ks=(1,))
    assert set(m["per_query"]) == {"1", "2"}
    assert m["P@1"] == pytest.approx((1.0 + 0.0) / 2)


def test_alpha_ndcg_hand_computed():
    # two subtopics; d1 covers s1, d2 covers s1 again (decayed) + s2
    run = {"1": [("d1", 2.0), ("d2", 1.0)]}
    div = {"1": {"s1": {"d1": 1, "d2": 1}, "s2": {"d2": 1}}}
    m = ndeval_run(run, div, alpha=0.5, pia_ks=(2,), andcg_k=2)
    # dcg: rank1 gain=1 (s1 fresh); rank2 gain=0.5 (s1 decayed) + 1 (s2)
    dcg = 1.0 / math.log2(2) + 1.5 / math.log2(3)
    # ideal greedy: d2 first (gain 2), then d1 (s1 decayed -> 0.5)
    idcg = 2.0 / math.log2(2) + 0.5 / math.log2(3)
    assert m["per_query"]["1"]["aNDCG@2"] == pytest.approx(dcg / idcg)
    # P-IA@2: s1 has both in top2 (2/2), s2 has d2 (1/2) -> mean 0.75
    assert m["per_query"]["1"]["P-IA@2"] == pytest.approx(0.75)


def test_readers_and_dummy_rows(tmp_path):
    runf = tmp_path / "run.trec"
    runf.write_text(
        "1 Q0 d1 1 5.0 run\n"
        "1 Q0 d2 2 4.0 run\n"
        "2 Q0 dummy 1 0.0 run\n"  # writer's empty-topic placeholder
    )
    r = read_trec_run(str(runf))
    assert r == {"1": [("d1", 5.0), ("d2", 4.0)]}
    qf = tmp_path / "div.qrel"
    qf.write_text("1 s1 d1 1\n1 s2 d2 1\n")
    d = read_diversity_qrels(str(qf))
    assert d == {"1": {"s1": {"d1": 1}, "s2": {"d2": 1}}}


def test_runner_prints_metric_row(tmp_path, ray_session, capsys):
    """End-to-end: a real run over the sf0.001 index scored against a
    synthetic qrels via the runner param."""
    from searchengine_ray.gate import index_for
    from searchengine_ray.runner import run

    idx = index_for("/root/testdata/sf0.001")
    qfile = tmp_path / "q.txt"
    qfile.write_text("1:dup\n")
    out = tmp_path / "out.trec"
    # build a qrels from nothing: just judge two arbitrary externals; the
    # metric VALUES don't matter here, only that the row prints and parses
    qrels = tmp_path / "q.qrel"
    run_params = {
        "indexPath": idx,
        "queryFilePath": str(qfile),
        "trecEvalOutputPath": str(out),
        "retrievalAlgorithm": "BM25",
    }
    p = run(run_params)
    lines = [ln.split() for ln in open(p) if ln.split()[2] != "dummy"]
    top2 = [ln[2] for ln in lines[:2]]
    qrels.write_text(f"1 0 {top2[0]} 1\n1 0 {top2[1]} 0\n")
    run_params["trecEvalQrels"] = str(qrels)
    run(run_params)
    cap = capsys.readouterr().out
    assert "trec_eval [" in cap and "P@10=" in cap and "MAP=1.0000" in cap


def test_recip_rank_and_rprec_hand_computed():
    # first relevant at rank 3; R = 2, top-2 holds 1 relevant
    run = {"1": [("d5", 5.0), ("d4", 4.0), ("d3", 3.0), ("d2", 2.0)]}
    qrels = {"1": {"d3": 1, "d4": 0, "d9": 1}}
    q = trec_eval_run(run, qrels, ks=(2,))["per_query"]["1"]
    assert q["recip_rank"] == pytest.approx(1 / 3)
    # R=2: top-2 = d5, d4 -> 0 relevant... d4 judged 0 -> Rprec = 0/2
    assert q["Rprec"] == 0.0
    # no relevant retrieved at all -> both zero
    q0 = trec_eval_run({"1": [("dx", 1.0)]}, {"1": {"d9": 1}}, ks=(1,))[
        "per_query"
    ]["1"]
    assert q0["recip_rank"] == 0.0 and q0["Rprec"] == 0.0


def test_rprec_counts_only_top_R():
    run = {"1": [("d1", 3.0), ("d2", 2.0), ("d3", 1.0)]}
    qrels = {"1": {"d1": 1, "d3": 1}}  # R = 2; d1 in top-2, d3 at rank 3
    q = trec_eval_run(run, qrels, ks=(2,))["per_query"]["1"]
    assert q["Rprec"] == 1 / 2
    assert q["recip_rank"] == 1.0


def test_err_ia_hand_computed():
    # subtopic a: d1, d3 relevant; subtopic b: d2. ranked d1 d2 d3, k=3.
    # ERR_a = 0.5/1 + 0.5*0.5/3 = 7/12 ; ERR_b = 0.5/2 = 1/4
    run = {"1": [("d1", 3.0), ("d2", 2.0), ("d3", 1.0)]}
    dq = {"1": {"a": {"d1": 1, "d3": 1}, "b": {"d2": 1}}}
    m = ndeval_run(run, dq, andcg_k=3)
    q = m["per_query"]["1"]
    assert q["ERR-IA@3"] == pytest.approx((7 / 12 + 1 / 4) / 2)
    # normalized: ideal covers both subtopics in the first two ranks.
    # greedy ideal (alpha-gain, doc-id tie-break): d1 then d2 then d3
    # ERR_a(ideal) = 0.5/1 + 0.25/3 = 7/12 ; ERR_b(ideal) = 0.5/2 = 1/4
    assert q["nERR-IA@3"] == pytest.approx(1.0)


def test_nerr_ia_penalizes_redundancy():
    # two docs of subtopic a before the only subtopic-b doc: nERR-IA < 1
    run = {"1": [("d1", 3.0), ("d3", 2.0), ("d2", 1.0)]}
    dq = {"1": {"a": {"d1": 1, "d3": 1}, "b": {"d2": 1}}}
    q = ndeval_run(run, dq, andcg_k=3)["per_query"]["1"]
    assert 0.0 < q["nERR-IA@3"] < 1.0
    assert q["ERR-IA@3"] < (7 / 12 + 1 / 4) / 2


def test_rank_eval_brute_parity(ray_session):
    """The four rank_eval metrics recomputed scalar-by-scalar from the
    engine's own ranking + derived qrels."""
    from searchengine_ray.gate import engine_for, eval_rank_eval

    sf = "/root/testdata/sf0.001"
    got = {m: v for m, v in zip(
        *[eval_rank_eval(sf).column(c).to_pylist()
          for c in ("metric", "value_r")])}
    eng = engine_for(sf, "bm25")
    t = eng.search("1", "dup spark")
    ext = eng.index.external_ids(
        t.column("doc_id").to_numpy()).astype(str)
    ub = engine_for(sf, "unrankedboolean")

    def mset(q):
        return set(ub.index.external_ids(
            ub.search("q", q).column("doc_id").to_numpy()).astype(str))

    spark, dup = mset("spark"), mset("dup")
    qrels = {e: (e in spark) + (e in dup) for e in spark | dup}
    top = [qrels.get(e, 0) for e in ext[:10]]
    nrel = sum(1 for g in top if g >= 1)
    assert got["precision@10"] == round(nrel / 10, 6)
    assert got["recall@10"] == round(
        nrel / sum(1 for g in qrels.values() if g >= 1), 6)
    first = next((r for r, g in enumerate(top, 1) if g >= 1), None)
    assert got["mrr@10"] == (round(1 / first, 6) if first else 0.0)
    acc, prod = 0.0, 1.0
    for r, g in enumerate(top, 1):
        R = (2.0 ** g - 1.0) / 4.0
        acc, prod = acc + (prod * R) / r, prod * (1.0 - R)
    assert got["err@10"] == round(acc, 6)
    # cascade sanity: err <= mrr (diminishing returns below first rel)
    assert got["err@10"] <= got["mrr@10"] + 1e-9
