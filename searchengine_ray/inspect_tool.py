"""Index inspector CLI — the reference's ``InspectIndex`` debug tool
(`Homeworks/HW6/QryEval/InspectIndex.java:23-57, 185-250, 286-334,
568-668`) over our Parquet index.

Usage:
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-stats
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-postings TERM FIELD [N]
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-vocab FIELD [N]
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-doc DOC_ID
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-metadata
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-docids
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-edocid IDOCID
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-idocid EDOCID
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-fields
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-termvector IDOCID
  python -m searchengine_ray.inspect_tool INDEX_DIR -list-termvector-field IDOCID FIELD
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


def list_docids(idx: InvertedIndex) -> None:
    """`-list-docids` (`InspectIndex.java:228-236`): every internal ->
    external docid mapping."""
    print("-list-docids:")
    ids = idx.all_doc_ids()
    exts = idx.external_ids(ids)
    for d, e in zip(ids, exts):
        print(f"Internal --> external docid: {int(d)} --> {e}")


def list_edocid(idx: InvertedIndex, doc_id: int) -> None:
    """`-list-edocid IDOCID` (`InspectIndex.java:190-204`)."""
    print("-list-edocid:")
    ext = idx.external_ids(np.array([doc_id]))[0]
    print(f"Internal docid --> External docid: {doc_id} --> {ext}")


def list_idocid(idx: InvertedIndex, ext: str) -> None:
    """`-list-idocid EDOCID` (`InspectIndex.java:205-216`): reverse lookup
    over the docmap (vectorized scan; the docmap is columnar, no per-row
    Python in the library — this is a debug CLI)."""
    print("-list-idocid:")
    ids = idx.all_doc_ids()
    exts = idx.external_ids(ids)
    hit = np.flatnonzero(exts.astype(str) == ext)
    if len(hit):
        print(f"External docid --> Internal docid: {ext} --> {int(ids[hit[0]])}")
    else:
        print(f"ERROR:  {ext} is a bad external document id.")


def list_fields(idx: InvertedIndex) -> None:
    """`-list-fields` (`InspectIndex.java:237-252`): merged field names —
    the indexed fields plus the stored externalId metadata field."""
    names = list(idx.stats["fields"]) + ["externalId"]
    print(f"\nNumber of fields:  {len(names)}")
    for n in names:
        print(f"\t{n}")


def _termvector_display(idx: InvertedIndex, doc_id: int, field: str) -> None:
    """One field's term vector (`InspectIndex.java:601-668`): stored
    length, vocabulary size, then (ord, term, tf, positions) per term in
    term order. Derived by probing the doc in each vocabulary term's
    postings — O(vocab * log df) per field, a debug-tool cost by design
    (the serving path never materializes per-doc vectors)."""
    print(f"    Stored length: {int(idx.doclen(field, np.array([doc_id]))[0])}")
    rows = []
    for f, t in sorted(idx.vocabulary(field)):
        p = idx.postings(f, t)
        if not p.df:
            continue
        i = int(np.searchsorted(p.doc_ids, doc_id))
        if i < p.df and p.doc_ids[i] == doc_id:
            rows.append((t, int(p.tfs[i]), p.positions_for(i).tolist()))
    print(f"    Vocabulary size: {len(rows)} terms")
    print(f"      {' ':10} {'term':<19} tf positions")
    for ord_, (t, tf, pos) in enumerate(rows):
        print(f"      {ord_:10d} {t:<20} {tf} {' '.join(str(x) for x in pos)}")


def list_termvector(idx: InvertedIndex, doc_id: int, field: "str | None" = None) -> None:
    """`-list-termvector IDOCID` / `-list-termvector-field IDOCID FIELD`
    (`InspectIndex.java:568-629`)."""
    if doc_id < 0 or doc_id not in set(idx.all_doc_ids().tolist()):
        print(f"ERROR:  {doc_id} is a bad document id.")
        return
    if field is not None:
        print(f"\nTermVector:  docid {doc_id}, field {field}")
        _termvector_display(idx, doc_id, field)
        return
    print(f"\nTermVector:  docid {doc_id}")
    for f in idx.stats["fields"]:
        print(f"  Field: {f}")
        _termvector_display(idx, doc_id, f)


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
    elif cmd == "-list-postings-sample":
        # reference flag (`InspectIndex.java:45-47`): first few entries only
        list_postings(idx, argv[2], argv[3], 5)
    elif cmd in ("-list-vocab", "-list-terms"):
        # -list-terms is the reference's name (`InspectIndex.java:50`)
        list_vocab(idx, argv[2], int(argv[3]) if len(argv) > 3 else 20)
    elif cmd == "-list-doc":
        list_doc(idx, int(argv[2]))
    elif cmd == "-list-docids":
        list_docids(idx)
    elif cmd == "-list-edocid":
        list_edocid(idx, int(argv[2]))
    elif cmd == "-list-idocid":
        list_idocid(idx, argv[2])
    elif cmd == "-list-fields":
        list_fields(idx)
    elif cmd == "-list-termvector":
        list_termvector(idx, int(argv[2]))
    elif cmd == "-list-termvector-field":
        list_termvector(idx, int(argv[2]), argv[3])
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    try:
        main(sys.argv[1:])
    except BrokenPipeError:
        # `inspect_tool ... | head` closing the pipe is normal CLI usage
        sys.exit(0)
