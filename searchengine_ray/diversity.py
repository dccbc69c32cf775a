"""Search-result diversification: xQuAD and PM2 (reference HW5
``QryDiversity``, `Homeworks/HW5/QryEval/QryDiversity.java` — HW6 copy does
not exist; HW5 cited).

Ported exactly (`QryDiversity.java:98-246`):

- score normalization: every (doc, query/intent) score divided by
  ``base = max(sum_orig, max_i sum_intent_i restricted to orig's top docs)``
  clamped to >= 1.0 (lines 100-133);
- xQuAD greedy: pick argmax of
  ``(1-lambda)*rel_q(d) + lambda/N * sum_i rel_i(d) * prod_selected (1-rel_i(s))``
  scanning candidates in original rank order with a STRICT > (first doc wins
  ties), lines 161-188;
- PM2: quotient ``qt_i = v/(2 s_i + 1)``, pick intent with max quotient,
  score ``lambda*qt_max*rel_max(d) + (1-lambda)*sum_other qt_i*rel_i(d)``,
  update ``s_i += rel_i(d*)/sum_j rel_j(d*)`` unless the chosen score is 0,
  lines 192-246.

Deliberate determinization (flagged): the reference iterates intents in
``HashSet`` order (JVM hash order — affects PM2's max-quotient ties and
float accumulation order); we iterate intents sorted ascending.

All state is per-query and tiny (<= maxInputRankingsLength docs), so this is
a driver-side function over rankings the distributed engine produced —
matching the reference's post-retrieval design.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class DiversityConfig:
    algorithm: str = "xquad"  # 'xquad' | 'pm2'
    lam: float = 0.5
    max_input_rankings_length: int = 100
    max_result_ranking_length: int = 50


def normalize_scores(
    orig: list[tuple[int, float]],
    intents: dict[str, list[tuple[int, float]]],
    cfg: DiversityConfig,
) -> tuple[dict[int, dict[str, float]], list[int]]:
    """(doc -> {query/intent -> normalized score}, original rank order)."""
    m = cfg.max_input_rankings_length
    orig = orig[:m]
    rank_order = [d for d, _ in orig]
    doc_scores: dict[int, dict[str, float]] = {d: {} for d in rank_order}
    base = sum(s for _, s in orig)
    for iid in sorted(intents):
        tmp = sum(
            s for d, s in intents[iid][:m] if d in doc_scores
        )
        base = max(base, tmp)
    if base < 1.0:
        base = 1.0
    for d, s in orig:
        doc_scores[d]["__orig__"] = s / base
    for iid in sorted(intents):
        for d, s in intents[iid][:m]:
            if d in doc_scores:
                doc_scores[d][iid] = s / base
    return doc_scores, rank_order


def xquad(
    orig: list[tuple[int, float]],
    intents: dict[str, list[tuple[int, float]]],
    cfg: DiversityConfig | None = None,
) -> list[tuple[int, float]]:
    cfg = cfg or DiversityConfig(algorithm="xquad")
    doc_scores, remaining = normalize_scores(orig, intents, cfg)
    iids = sorted(intents)
    n = len(iids) or 1
    selected: list[tuple[int, float]] = []
    while remaining and len(selected) < cfg.max_result_ranking_length:
        # the selected-set novelty product depends only on (intent,
        # selected), never on the candidate — hoisting it out of the
        # candidate loop drops an O(|remaining|) redundant factor per
        # iteration with bit-identical arithmetic (same *= sequence)
        already = {}
        for iid in iids:
            a = 1.0
            for sd, _ in selected:
                a *= 1 - doc_scores[sd].get(iid, 0.0)
            already[iid] = a
        best_doc, best_score = -1, -float("inf")
        for d in remaining:
            s = (1 - cfg.lam) * doc_scores[d].get("__orig__", 0.0)
            for iid in iids:
                s += cfg.lam / n * doc_scores[d].get(iid, 0.0) * already[iid]
            if s > best_score:
                best_doc, best_score = d, s
        selected.append((best_doc, best_score))
        remaining.remove(best_doc)
    selected.sort(key=lambda x: -x[1])
    return selected


def pm2(
    orig: list[tuple[int, float]],
    intents: dict[str, list[tuple[int, float]]],
    cfg: DiversityConfig | None = None,
) -> list[tuple[int, float]]:
    cfg = cfg or DiversityConfig(algorithm="pm2")
    doc_scores, remaining = normalize_scores(orig, intents, cfg)
    iids = sorted(intents)
    if not iids:
        # no intents for this query: PM2 scores ONLY quotient-weighted
        # intent coverage, so every doc scores 0 — emit the original rank
        # order truncated (stable sort keeps it), instead of the former
        # KeyError on the undefined max-quotient intent
        return [
            (d, 0.0) for d in remaining[: cfg.max_result_ranking_length]
        ]
    n = len(iids)
    v = cfg.max_result_ranking_length / n
    s_state = {iid: 0.0 for iid in iids}
    selected: list[tuple[int, float]] = []
    while remaining and len(selected) < cfg.max_result_ranking_length:
        q = {iid: v / (2 * s_state[iid] + 1) for iid in iids}
        max_qid, max_q = None, -float("inf")
        for iid in iids:
            if q[iid] > max_q:
                max_qid, max_q = iid, q[iid]
        best_doc, best_score, best_sum = -1, -float("inf"), -float("inf")
        for d in remaining:
            score = cfg.lam * q[max_qid] * doc_scores[d].get(max_qid, 0.0)
            tot = doc_scores[d].get(max_qid, 0.0)
            for iid in iids:
                if iid != max_qid:
                    score += (1 - cfg.lam) * q[iid] * doc_scores[d].get(iid, 0.0)
                    tot += doc_scores[d].get(iid, 0.0)
            if score > best_score:
                best_doc, best_score, best_sum = d, score, tot
        selected.append((best_doc, best_score))
        if best_score != 0.0:
            for iid in iids:
                s_state[iid] += doc_scores[best_doc].get(iid, 0.0) / best_sum
        remaining.remove(best_doc)
    selected.sort(key=lambda x: -x[1])
    return selected


def read_intents_file(path: str) -> dict[str, dict[str, str]]:
    """``qid.i:intent query`` lines -> {qid: {intent_id: query}}
    (`QryDiversity.java:77-89`)."""
    out: dict[str, dict[str, str]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if ":" not in line or "." not in line.split(":", 1)[0]:
                continue  # comment/header/malformed — skip, like the
                # length-checked trec_run/qrels readers in evalmetrics
            head, q = line.split(":", 1)
            qid, iid = head.split(".", 1)
            out.setdefault(qid.strip(), {})[iid.strip()] = q.strip()
    return out
