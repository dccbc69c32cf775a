"""Index inspector CLI — the reference's ``InspectIndex`` debug tool
(`Homeworks/HW6/QryEval/InspectIndex.java:23-40, 286-334`) over our Parquet
index.

Usage:
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-stats
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-postings TERM FIELD [N]
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-vocab FIELD [N]
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-doc DOC_ID
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-metadata
"""

from __future__ import annotations

import json
import sys

import numpy as np

from .indexio import InvertedIndex


def list_stats(idx: InvertedIndex) -> None:
    print(f"numDocs: {idx.num_docs}")
    for field, st in idx.stats["fields"].items():
        ave = st["sum_len"] / max(1, st["doc_count"])
        print(
            f"field {field!r}: docCount={st['doc_count']} "
            f"sumFieldLen={st['sum_len']} avgLen={ave:.2f}"
        )


def list_postings(idx: InvertedIndex, term: str, field: str, n: int) -> None:
    p = idx.postings(field, term)
    print(f"{term}.{field}: df={p.df} ctf={p.ctf}")
    for i in range(min(n, p.df)):
        d = int(p.doc_ids[i])
        ext = idx.external_ids(np.array([d]))[0]
        print(f"  doc {d} ({ext}) tf={int(p.tfs[i])} pos={p.positions_for(i).tolist()}")


def list_vocab(idx: InvertedIndex, field: str, n: int) -> None:
    vocab = sorted(t for f, t in idx.vocabulary(field))
    print(f"{field}: {len(vocab)} terms")
    for t in vocab[:n]:
        p = idx.postings(field, t)
        print(f"  {t}: df={p.df} ctf={p.ctf}")


def list_doc(idx: InvertedIndex, doc_id: int) -> None:
    d = np.array([doc_id])
    print(f"doc {doc_id}: external_id={idx.external_ids(d)[0]}")
    for field in idx.stats["fields"]:
        print(f"  len_{field}={int(idx.doclen(field, d)[0])}")


def list_metadata(index_dir: str) -> None:
    with open(f"{index_dir}/manifest.json") as f:
        print(json.dumps(json.load(f), indent=1))


def main(argv: list[str]) -> None:
    index_dir, cmd = argv[0], argv[1]
    if cmd == "-list-metadata":
        list_metadata(index_dir)
        return
    idx = InvertedIndex(index_dir)
    if cmd == "-list-stats":
        list_stats(idx)
    elif cmd == "-list-postings":
        list_postings(idx, argv[2], argv[3], int(argv[4]) if len(argv) > 4 else 10)
    elif cmd == "-list-vocab":
        list_vocab(idx, argv[2], int(argv[3]) if len(argv) > 3 else 20)
    elif cmd == "-list-doc":
        list_doc(idx, int(argv[2]))
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main(sys.argv[1:])
