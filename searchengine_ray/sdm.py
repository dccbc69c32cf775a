"""Sequential/full dependence model query generator (Metzler & Croft,
"A Markov Random Field Model for Term Dependencies", SIGIR 2005).

Reproduces the reference's HW4 query generator
(`Homeworks/HW4/DonMetzler.pl:108-170`, Metzler's public script as adapted
by the course to the #and/#near/#wand/#window dialect) byte-for-byte —
the HW4 experiment files (`Homeworks/HW4/QryEval/HW4-Exp-1c.qry`) were
produced by it, so exact string parity lets those runs replay:

- f_T: all query terms under one ``#and``.
- f_O (ordered): each CONTIGUOUS term run (adjacent pairs only in "sd";
  every contiguous subset in "fd") as ``#near/1``; subsets emit in the
  generator's bitmask order, which for "sd" walks adjacent pairs from the
  LAST pair backwards.
- f_U (unordered): the same subsets (every subset >= 2 terms in "fd") as
  ``#window/<4*len>``.
- The three feature groups combine under ``#wand`` with the given weights;
  zero-weight groups are omitted, and single-term queries (or w_O=w_U=0)
  collapse to the plain ``#and``.
"""

from __future__ import annotations


def _fmt_w(w) -> str:
    """Weights render exactly as given (the perl passed argv strings)."""
    if isinstance(w, str):
        return w
    s = f"{w:g}"
    return s


def formulate_query(
    query: str,
    qtype: str = "sd",
    wt: tuple = (0.8, 0.1, 0.1),
) -> str:
    """Flat query string -> SDM structured query (reference-identical)."""
    terms = query.strip().split()
    n = len(terms)
    if n == 0:
        return ""
    query_t = "#and( " + "".join(f"{t} " for t in terms)
    if (float(wt[1]) == 0.0 and float(wt[2]) == 0.0) or n == 1:
        return query_t + ")"

    query_o = "#and("
    query_u = "#and("

    def subset_bits(i: int) -> list[int]:
        # term j is 'on' when bit (n-1-j) of i is set (the perl reads the
        # 32-bit string right-aligned)
        return [j for j in range(n) if (i >> (n - 1 - j)) & 1]

    def contiguous(on: list[int]) -> bool:
        return len(on) >= 2 and on[-1] - on[0] == len(on) - 1

    if qtype == "sd":
        # the perl's `i = i*2 - 1; i++` walk: 3, 6, 12, 24, ... = adjacent
        # pairs from the LAST pair backwards
        seq = [3 * (1 << s) for s in range(n - 1)]
    else:
        seq = [i for i in range(1, 1 << n) if bin(i).count("1") >= 2]

    for i in seq:
        on = subset_bits(i)
        extracted = "".join(f"{terms[j]} " for j in on)
        if contiguous(on):
            query_o += f" #near/1( {extracted}) "
        query_u += f" #window/{4 * len(on)}( {extracted}) "

    out = "#wand("
    if float(wt[0]) != 0.0:
        out += f" {_fmt_w(wt[0])} {query_t})"
    if float(wt[1]) != 0.0 and query_o != "#and(":
        out += f" {_fmt_w(wt[1])} {query_o})"
    if float(wt[2]) != 0.0 and query_u != "#and(":
        out += f" {_fmt_w(wt[2])} {query_u})"
    if out == "#wand(":
        return ""
    return out + " )"


def formulate_query_file(
    queries: list[tuple[str, str]],
    qtype: str = "sd",
    wt: tuple = (0.8, 0.1, 0.1),
) -> list[tuple[str, str]]:
    """(qid, flat) pairs -> (qid, sdm) pairs, the HW4 batch shape."""
    return [(qid, formulate_query(q, qtype, wt)) for qid, q in queries]
