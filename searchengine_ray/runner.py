"""Top-level run driver: the reference's ``java QryEval file.param``
re-expressed (`Homeworks/HW6/QryEval/QryEval.java:31-59, 152-195`).

Pipeline (parameter-gated exactly like the reference, `QryEval.java:46-55`;
`QryExpand.java:17-27`; `QryDiversity.java:15-33`):

  read params -> open/build index -> per query:
    [fb=...]        PRF-expand the query line
    [diversity=...] diversify over intents
    evaluate (actor pool when queries are many, inline otherwise)
  -> trec_eval output file

CLI: ``python -m searchengine_ray.runner file.param`` (owns no Ray session
when one exists; initializes local Ray otherwise).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .config import DEFAULT_OP, ModelParams, read_param_file
from .diversity import DiversityConfig, pm2, read_intents_file, xquad
from .engine import (
    RESULT_SCHEMA,
    SearchEngine,
    read_queries_file,
    run_queries,
    write_trec,
)
from .expand import ExpandConfig, expand


def read_trec_rankings(path: str) -> dict[str, list[tuple[str, float]]]:
    """trec-format file -> {qid: [(external_id, score)]} in file order
    (`QryExpand.java:45-66`, `QryDiversity.java:38-76`)."""
    out: dict[str, list[tuple[str, float]]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            out.setdefault(parts[0], []).append((parts[2], float(parts[4])))
    return out


def read_qrels(path: str) -> dict[str, dict[str, int]]:
    """``qid 0 externalId rel`` -> {qid: {external_id: rel}}
    (`RetrievalModelLeToR.java:285-315`)."""
    out: dict[str, dict[str, int]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                out.setdefault(parts[0], {})[parts[2]] = int(parts[3])
    return out


def run(params: dict[str, str]) -> str:
    """Execute one parameter file; returns the trec output path."""
    index_dir = params["indexPath"]
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        corpus = params.get("corpusPath")
        if corpus is None:
            raise FileNotFoundError(
                f"no index at {index_dir} and no corpusPath to build from"
            )
        from .build import build_index
        from .config import BuildConfig

        # stemmer=porter selects the stemmed analyzer profile (HW1-5,
        # `Homeworks/HW1/QryEval/QryParser.java:48`); default HW6 no-stem
        build_index(
            corpus,
            index_dir,
            BuildConfig(stemmer=params.get("stemmer", "none")),
        )

    mp = ModelParams.from_params(params)
    queries = read_queries_file(params["queryFilePath"])
    out_path = params["trecEvalOutputPath"]

    engine = SearchEngine(index_dir, mp)

    # PRF expansion (fb=bm25|indri)
    fb = params.get("fb", "false").lower()
    if fb not in ("false", ""):
        cfg = ExpandConfig(
            fb=fb,
            fb_docs=int(params.get("fbDocs", 10)),
            fb_terms=int(params.get("fbTerms", 10)),
            fb_mu=float(params.get("fbMu", 0)),
            fb_orig_weight=float(params.get("fbOrigWeight", 0.5)),
        )
        sf_dir = params.get("corpusPath")
        if not sf_dir:
            raise ValueError(
                "fb expansion requires corpusPath (the expansion stage reads "
                "candidate docs' terms from the corpus parquet)"
            )
        initial = None
        if params.get("fbInitialRankingFile"):
            initial = read_trec_rankings(params["fbInitialRankingFile"])
        fb_model = ModelParams.from_params(params)
        fb_model.model = "bm25" if fb == "bm25" else "indri"
        fb_engine = SearchEngine(index_dir, fb_model)
        ext2id = {
            e: int(d)
            for d, e in zip(
                fb_engine.index.all_doc_ids(),
                fb_engine.index.external_ids(fb_engine.index.all_doc_ids()),
            )
        }
        expanded, fb_lines = [], []
        for qid, q in queries:
            if initial and qid in initial:
                ranking = [
                    (ext2id[e], s) for e, s in initial[qid] if e in ext2id
                ]
            else:
                t = fb_engine.search(qid, q).to_pandas()
                ranking = list(zip(t["doc_id"], t["score"]))
            line, terms = expand(
                fb_engine.index, sf_dir, qid, q, ranking, cfg, mp.model
            )
            fb_lines.append(f"{qid}: " + " ".join(
                f"{w:.4f} {t}" for t, w in terms
            ))
            expanded.append((qid, line.split(":", 1)[1].strip()))
        queries = expanded
        if params.get("fbExpansionQueryFile"):
            with open(params["fbExpansionQueryFile"], "w") as f:
                f.write("\n".join(fb_lines) + "\n")

    # Diversification (diversity=true, diversity:algorithm=xquad|pm2)
    if params.get("diversity", "false").lower() == "true":
        dcfg = DiversityConfig(
            algorithm=params.get("diversity:algorithm", "xquad").lower(),
            lam=float(params.get("diversity:lambda", 0.5)),
            max_input_rankings_length=int(
                params.get("diversity:maxInputRankingsLength", 100)
            ),
            max_result_ranking_length=int(
                params.get("diversity:maxResultRankingLength", 50)
            ),
        )
        intents = read_intents_file(params["diversity:intentsFile"])
        tables = []
        for qid, q in queries:
            orig_t = engine.search(qid, q).to_pandas()
            orig = list(zip(orig_t["doc_id"], orig_t["score"]))
            ir = {}
            for iid, iq in intents.get(qid, {}).items():
                it = engine.search(f"{qid}.{iid}", iq).to_pandas()
                ir[iid] = list(zip(it["doc_id"], it["score"]))
            fn = xquad if dcfg.algorithm == "xquad" else pm2
            sel = fn(orig, ir, dcfg)
            docs = np.array([d for d, _ in sel], dtype=np.int64)
            ext = engine.index.external_ids(docs) if len(docs) else np.empty(0, object)
            tables.append(
                pa.table(
                    {
                        "qid": pa.array([qid] * len(sel), type=pa.string()),
                        "doc_id": pa.array(docs, type=pa.int64()),
                        "external_id": pa.array(ext.astype(str), type=pa.string()),
                        "score": pa.array([s for _, s in sel], type=pa.float64()),
                        "rank": pa.array(
                            np.arange(1, len(sel) + 1, dtype=np.int32)
                        ),
                    }
                )
            )
        results = (
            pa.concat_tables(tables)
            if tables
            else pa.table({f.name: pa.array([], type=f.type) for f in RESULT_SCHEMA})
        )
    elif len(queries) >= 8:
        results = run_queries(index_dir, queries, mp, concurrency=4)
    else:
        results = engine.search_many(queries)

    # trecEvalOutputStyle=hw1 selects the HW1 profile's writer (tab-
    # separated, %f, rank-from-0, `Homeworks/HW1/QryEval/QryEval.java:231`);
    # default is the HW6 format
    write_trec(
        results,
        out_path,
        all_qids=[q for q, _ in queries],
        style=params.get("trecEvalOutputStyle", "hw6"),
    )

    # Offline effectiveness scoring (the reference POSTed runs to CMU's
    # trec_eval/ndeval CGIs, `Homeworks/HW6/test.py:24-77`; evalmetrics
    # replicates those conventions locally). Param: trecEvalQrels=<path>
    # (adhoc qrels) and/or ndevalQrels=<path> (diversity qrels).
    if params.get("trecEvalQrels") or params.get("ndevalQrels"):
        from . import evalmetrics as em

        run_dict = em.read_trec_run(out_path)
        if params.get("trecEvalQrels"):
            m = em.trec_eval_run(run_dict, read_qrels(params["trecEvalQrels"]))
            row = "  ".join(
                f"{k}={m[k]:.4f}" for k in sorted(m) if k != "per_query"
            )
            print(f"trec_eval [{out_path}]: {row}")
        if params.get("ndevalQrels"):
            m = em.ndeval_run(
                run_dict, em.read_diversity_qrels(params["ndevalQrels"])
            )
            row = "  ".join(
                f"{k}={m[k]:.4f}" for k in sorted(m) if k != "per_query"
            )
            print(f"ndeval [{out_path}]: {row}")
    return out_path


def main(argv: list[str]) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        out = run(read_param_file(argv[0]))
        print(out)
    finally:
        import ray as _r

        _r.shutdown()


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
