"""Retrieval-effectiveness metrics: the trec_eval / ndeval subset the
reference's experiment loop scores runs with
(`Homeworks/HW6/test.py:24-77` extracts P_10/P_20/P_30, map,
ndcg_cut_{10,20,30} from CMU's trec_eval CGI; `test.py:80-112` extracts
P-IA@{10,20} and alpha-nDCG@20 from the ndeval CGI). The reference never
computes these locally — runs went to a course-hosted grader — so this
module closes the loop: score any trec-format run against a qrels file
offline, replicating the published trec_eval / ndeval conventions:

- Ranking: documents re-sort by (score DESC, docno DESC) — trec_eval
  ignores the run's own rank column and breaks score ties by document id
  in REVERSE lexicographic order.
- Relevant = rel > 0 (graded levels feed nDCG gains; negative judgments
  count as non-relevant).
- P@k: relevant in top k, divided by k (not by retrieved count).
- MAP: mean over relevant-retrieved of precision at each relevant rank,
  divided by R = total judged-relevant (not by retrieved-relevant).
- ndcg_cut_k: DCG_k = sum gain_i / log2(i + 1) over ranks i = 1..k with
  gain = the graded relevance level; normalized by the ideal DCG from the
  qrels' own sorted gains (trec_eval m_ndcg_cut.c).
- Per-query scores average ARITHMETICALLY over the topics present in the
  QRELS (trec_eval -c convention, what leaderboard graders use); topics
  with no judged-relevant documents contribute 0.
- alpha-nDCG@k (ndeval, alpha = 0.5): the gain of a doc at rank i for
  subtopic s is (1 - alpha)^(times s was already covered above); the
  ideal ranking is the standard greedy approximation (ndeval.c).
- P-IA@k: mean over the topic's subtopics of subtopic-precision@k.
"""

from __future__ import annotations

import math

__all__ = [
    "read_trec_run",
    "read_diversity_qrels",
    "trec_eval_run",
    "ndeval_run",
]


def read_trec_run(path: str) -> dict[str, list[tuple[str, float]]]:
    """trec-format file -> {qid: [(external_id, score)] in file order}."""
    out: dict[str, list[tuple[str, float]]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 5 and parts[2] != "dummy":
                out.setdefault(parts[0], []).append((parts[2], float(parts[4])))
    return out


def _ranked(docs: list[tuple[str, float]]) -> list[str]:
    """trec_eval's ranking: score desc, docno DESC (reverse lexicographic)
    on ties — the run's own rank column is ignored."""
    return [d for d, _ in sorted(docs, key=lambda x: (x[1], x[0]), reverse=True)]


def _query_metrics(
    ranked: list[str], rels: dict[str, int], ks: tuple[int, ...]
) -> dict[str, float]:
    rel_ranks = [
        i + 1 for i, d in enumerate(ranked) if rels.get(d, 0) > 0
    ]
    R = sum(1 for v in rels.values() if v > 0)
    out: dict[str, float] = {}
    for k in ks:
        out[f"P@{k}"] = sum(1 for r in rel_ranks if r <= k) / k
    ap = 0.0
    for j, r in enumerate(rel_ranks, start=1):
        ap += j / r
    out["MAP"] = ap / R if R else 0.0
    # trec_eval m_recip_rank.c: 1/rank of the first relevant, else 0
    out["recip_rank"] = 1.0 / rel_ranks[0] if rel_ranks else 0.0
    # trec_eval m_Rprec.c: relevant found in the top R, divided by R
    out["Rprec"] = (
        sum(1 for r in rel_ranks if r <= R) / R if R else 0.0
    )
    # graded nDCG at each cut
    gains = [rels.get(d, 0) for d in ranked]
    ideal = sorted((v for v in rels.values() if v > 0), reverse=True)
    for k in ks:
        dcg = sum(
            g / math.log2(i + 2) for i, g in enumerate(gains[:k]) if g > 0
        )
        idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal[:k]))
        out[f"ndcg_cut_{k}"] = dcg / idcg if idcg > 0 else 0.0
    return out


def trec_eval_run(
    run: dict[str, list[tuple[str, float]]],
    qrels: dict[str, dict[str, int]],
    ks: tuple[int, ...] = (10, 20, 30),
) -> dict[str, dict[str, float] | float]:
    """Score a run against adhoc qrels; returns
    {"per_query": {qid: {...}}, "<metric>": mean, ...} with means over the
    qrels' topics (trec_eval -c)."""
    per_query: dict[str, dict[str, float]] = {}
    for qid in sorted(qrels):
        ranked = _ranked(run.get(qid, []))
        per_query[qid] = _query_metrics(ranked, qrels[qid], ks)
    n = len(per_query)
    summary: dict[str, dict[str, float] | float] = {"per_query": per_query}
    if n:
        for m in next(iter(per_query.values())):
            summary[m] = sum(q[m] for q in per_query.values()) / n
    return summary


def _alpha_ndcg_at(
    ranked: list[str],
    sub_rels: dict[str, dict[str, int]],
    k: int,
    alpha: float,
) -> float:
    subs = sorted(sub_rels)
    seen = {s: 0 for s in subs}

    def gain_of(doc: str, seen_counts: dict[str, int]) -> float:
        g = 0.0
        for s in subs:
            if sub_rels[s].get(doc, 0) > 0:
                g += (1.0 - alpha) ** seen_counts[s]
        return g

    dcg = 0.0
    for i, d in enumerate(ranked[:k]):
        g = gain_of(d, seen)
        if g > 0:
            dcg += g / math.log2(i + 2)
            for s in subs:
                if sub_rels[s].get(d, 0) > 0:
                    seen[s] += 1

    # ideal: greedy over all judged docs (the ndeval approximation)
    pool = {d for s in subs for d, v in sub_rels[s].items() if v > 0}
    iseen = {s: 0 for s in subs}
    idcg = 0.0
    for i in range(min(k, len(pool))):
        best_doc, best_gain = None, -1.0
        for d in sorted(pool):  # deterministic tie-break
            g = gain_of(d, iseen)
            if g > best_gain:
                best_doc, best_gain = d, g
        if best_doc is None or best_gain <= 0:
            break
        idcg += best_gain / math.log2(i + 2)
        for s in subs:
            if sub_rels[s].get(best_doc, 0) > 0:
                iseen[s] += 1
        pool.discard(best_doc)
    return dcg / idcg if idcg > 0 else 0.0


def _err_ia_at(
    ranked: list[str],
    sub_rels: dict[str, dict[str, int]],
    k: int,
) -> float:
    """ERR-IA@k (ndeval.c / Chapelle et al. 2009): per subtopic the
    cascade expected reciprocal rank with binary stop probability
    R_i = 1/2 for a relevant doc (ndeval judges subtopics binary:
    (2^1 - 1)/2^1), averaged over the topic's subtopics."""
    subs = sorted(sub_rels)
    if not subs:
        return 0.0
    total = 0.0
    for s in subs:
        not_stopped = 1.0
        err = 0.0
        for i, d in enumerate(ranked[:k], start=1):
            if sub_rels[s].get(d, 0) > 0:
                err += not_stopped * 0.5 / i
                not_stopped *= 0.5
        total += err
    return total / len(subs)


def _ideal_greedy_ranking(
    sub_rels: dict[str, dict[str, int]], k: int, alpha: float
) -> list[str]:
    """The ndeval ideal: greedy by marginal alpha-gain over the judged
    pool (the SAME ideal ordering ndeval.c evaluates every normalized
    diversity metric against)."""
    subs = sorted(sub_rels)
    pool = {d for s in subs for d, v in sub_rels[s].items() if v > 0}
    seen = {s: 0 for s in subs}
    out: list[str] = []
    for _ in range(min(k, len(pool))):
        best_doc, best_gain = None, -1.0
        for d in sorted(pool):
            g = sum(
                (1.0 - alpha) ** seen[s]
                for s in subs
                if sub_rels[s].get(d, 0) > 0
            )
            if g > best_gain:
                best_doc, best_gain = d, g
        if best_doc is None or best_gain <= 0:
            break
        out.append(best_doc)
        for s in subs:
            if sub_rels[s].get(best_doc, 0) > 0:
                seen[s] += 1
        pool.discard(best_doc)
    return out


def ndeval_run(
    run: dict[str, list[tuple[str, float]]],
    div_qrels: dict[str, dict[str, dict[str, int]]],
    alpha: float = 0.5,
    pia_ks: tuple[int, ...] = (10, 20),
    andcg_k: int = 20,
) -> dict[str, dict[str, float] | float]:
    """Diversity metrics against subtopic qrels
    {qid: {subtopic: {doc: rel}}}: P-IA@k and alpha-nDCG@k, means over the
    qrels' topics."""
    per_query: dict[str, dict[str, float]] = {}
    for qid in sorted(div_qrels):
        ranked = _ranked(run.get(qid, []))
        subs = sorted(div_qrels[qid])
        q: dict[str, float] = {}
        for k in pia_ks:
            if subs:
                q[f"P-IA@{k}"] = sum(
                    sum(
                        1
                        for d in ranked[:k]
                        if div_qrels[qid][s].get(d, 0) > 0
                    )
                    / k
                    for s in subs
                ) / len(subs)
            else:
                q[f"P-IA@{k}"] = 0.0
        q[f"aNDCG@{andcg_k}"] = _alpha_ndcg_at(
            ranked, div_qrels[qid], andcg_k, alpha
        )
        q[f"ERR-IA@{andcg_k}"] = _err_ia_at(ranked, div_qrels[qid], andcg_k)
        ideal = _ideal_greedy_ranking(div_qrels[qid], andcg_k, alpha)
        ierr = _err_ia_at(ideal, div_qrels[qid], andcg_k)
        q[f"nERR-IA@{andcg_k}"] = (
            q[f"ERR-IA@{andcg_k}"] / ierr if ierr > 0 else 0.0
        )
        per_query[qid] = q
    n = len(per_query)
    summary: dict[str, dict[str, float] | float] = {"per_query": per_query}
    if n:
        for m in next(iter(per_query.values())):
            summary[m] = sum(q[m] for q in per_query.values()) / n
    return summary


def read_diversity_qrels(path: str) -> dict[str, dict[str, dict[str, int]]]:
    """``qid subtopic docno rel`` -> {qid: {subtopic: {doc: rel}}} (the
    TREC diversity qrels layout ndeval consumes)."""
    out: dict[str, dict[str, dict[str, int]]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                out.setdefault(parts[0], {}).setdefault(parts[1], {})[
                    parts[2]
                ] = int(parts[3])
    return out
