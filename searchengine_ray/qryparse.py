"""Query-language parser: Indri-style prefix queries -> typed query tree.

A pure-Python re-expression of the reference parser with identical
semantics (`Homeworks/HW6/QryEval/QryParser.java`):

- prefix operators ``#AND #OR #SYN #NEAR/n #WINDOW/n #SUM #WAND #WSUM``
  (case-insensitive, ``/n`` distance split, `QryParser.java:78-135`);
- terms may carry a ``.field`` suffix split at the FIRST dot against a field
  whitelist (`QryParser.java:144-182`); default field ``body``;
- any numeric token before an argument is consumed as a weight
  (`QryParser.java:346-350`) — only #WAND/#WSUM keep weights
  (`Qry.java:184-187`, `QrySopWAnd.java:17-19`); a multi-term token
  replicates its weight per produced term;
- well-formedness on append (`Qry.java:111-182`): implied #SCORE inserted
  between a score operator and an inverted-list argument; inverted-list
  operators require same-field inverted-list args (field propagates up);
- the optimizer deletes empty operators (stopword-only) and collapses
  single-argument non-SCORE operators (`QryParser.java:233-275`).

Deliberate deviation (flagged quirk): when the optimizer deletes an argument
of a weighted operator we delete its weight too; the reference leaves the
weight list misaligned in that case (Qry.removeArg never touches weights).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

FIELD_WHITELIST = ("url", "keywords", "title", "body", "inlink")

# Operator registry — the extension surface the reference documents as "add
# a case to QryParser.createOperator" (`QryParser.java:22-30, 99-130`,
# `ReadMe.txt:20-31`). register_operator() adds a new name; the evaluator
# dispatches on the same metadata.
SOP_NAMES = {"#and", "#or", "#sum", "#wand", "#wsum", "#score", "#andnot",
             "#filreq", "#filrej", "#range", "#dismax", "#boosting",
             "#constscore"}
IOP_NAMES = {"#syn", "#near", "#window", "#fuzzy", "#dfuzzy", "#prefix", "#wildcard",
             "#regexp", "#spanfirst", "#spannot", "#ordered", "#unordered"}
WEIGHTED = {"#wand", "#wsum"}
#: dictionary-expansion operators (Lucene MultiTermQuery analogs): their
#: single argument rewrites against the indexed vocabulary, so the optimizer
#: must not collapse them to the bare term
EXPANSION_OPS = {"#fuzzy", "#dfuzzy", "#prefix", "#wildcard", "#regexp"}
#: expansion operators whose argument is a raw PATTERN, not analyzable text:
#: `*?` wildcards / regex metacharacters would be destroyed by the analyzer's
#: [a-z0-9_]+ tokenization, so the parser lowercases the token (preserving
#: backslash escape sequences — see _lower_outside_escapes; vocabulary
#: terms are lowercase by construction) and only honours a trailing
#: ``.field`` suffix when it names a whitelisted field — a dot inside a
#: regexp stays part of the pattern. KNOWN LIMITATION: parse_string's
#: balanced-paren pre-check counts every ``(``/``)`` including escaped ones
#: and those inside character classes, so patterns containing ``\\(`` or
#: ``[(]`` are rejected up front; use ``.`` or a class without parens.
RAW_PATTERN_OPS = {"#wildcard", "#regexp"}
#: user-registered operators: lowercase name -> {"kind": "sop"|"iop",
#: "weighted": bool, "alias_of": canonical name the evaluator understands}
OPERATOR_REGISTRY: dict[str, dict] = {}


def register_operator(
    name: str,
    kind: str,
    weighted: bool = False,
    alias_of: str | None = None,
) -> None:
    """Register a query-language operator (e.g. ``#uw`` as an alias of
    ``#window``). ``alias_of`` maps the parsed node onto an operator the
    evaluator implements; fully custom evaluation plugs in by extending
    ``operators.eval_iop`` / ``Evaluator.sop`` on the aliased name."""
    low = name.lower()
    if not low.startswith("#"):
        low = "#" + low
    OPERATOR_REGISTRY[low] = {
        "kind": kind,
        "weighted": weighted,
        "alias_of": (alias_of or low).lower(),
    }
    if kind == "iop":
        IOP_NAMES.add(low)
    else:
        SOP_NAMES.add(low)
    if weighted:
        WEIGHTED.add(low)


class QuerySyntaxError(ValueError):
    pass


@dataclass
class Term:
    """Inverted-list leaf: one (term, field) posting lookup."""

    term: str
    field: str = "body"

    is_iop = True

    def __repr__(self):
        return f"{self.term}.{self.field}"


@dataclass
class Op:
    name: str  # '#and', '#near', ... (lowercase, no distance)
    args: list = dc_field(default_factory=list)
    weights: list = dc_field(default_factory=list)
    dist: int = 0
    field: str | None = None  # propagated for iops

    @property
    def is_iop(self) -> bool:
        return self.name in IOP_NAMES

    def __repr__(self):
        d = (
            f"/{self.dist}"
            if self.name in ("#near", "#window", "#dismax", "#boosting",
                             "#constscore")
            else ""
        )
        if self.name in WEIGHTED:
            inner = " ".join(f"{w} {a!r}" for w, a in zip(self.weights, self.args))
        else:
            inner = " ".join(repr(a) for a in self.args)
        return f"{self.name}{d}({inner})"


def _is_numeric(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _create_operator(name: str) -> Op:
    low = name.lower()
    dist = 0
    if "/" in low:
        parts = low.split("/")
        if len(parts) != 2:
            raise QuerySyntaxError(f"Wrong query operator format {name}")
        low = parts[0]
        try:
            dist = int(parts[1])
        except ValueError as e:
            raise QuerySyntaxError(f"Bad distance in {name}") from e
    if low not in SOP_NAMES | IOP_NAMES or low == "#score":
        raise QuerySyntaxError(f"Unknown query operator {name}")
    reg = OPERATOR_REGISTRY.get(low)
    if reg is not None:
        low = reg["alias_of"]  # registered alias resolves to its evaluator
    return Op(low, dist=dist)


def _lower_outside_escapes(pattern: str) -> str:
    """Lowercase a raw pattern EXCEPT the character following a backslash:
    the index dictionary is all-lowercase so literal letters must lower to
    match it, but blind .lower() would invert case-sensitive regex escapes
    (#regexp( \\D ) is NOT #regexp( \\d ); same for \\W/\\S/\\B)."""
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(c)
            out.append(pattern[i + 1])
            i += 2
            continue
        out.append(c.lower())
        i += 1
    return "".join(out)


def _create_raw_pattern_term(token: str) -> Term:
    """Raw-pattern leaf for RAW_PATTERN_OPS: no analysis; lowercased except
    escape sequences (see _lower_outside_escapes). A ``.field`` suffix is
    honoured only when the text after the LAST dot is exactly a whitelisted
    field name (so regexp dots survive)."""
    dot = token.rfind(".")
    if dot > 0 and token[dot + 1 :].lower() in FIELD_WHITELIST:
        return Term(_lower_outside_escapes(token[:dot]), token[dot + 1 :].lower())
    return Term(_lower_outside_escapes(token))


def _create_terms(token: str, analyze) -> list[Term]:
    dot = token.find(".")
    if dot < 0:
        fieldname, raw = "body", token
    else:
        fieldname, raw = token[dot + 1 :].lower(), token[:dot]
    if fieldname not in FIELD_WHITELIST:
        raise QuerySyntaxError(f"Unknown field {token}")
    return [Term(t, fieldname) for t in analyze(raw)]


def _append_arg(parent: Op, child, weight: float | None) -> None:
    """Well-formedness rules of `Qry.java:111-182` + weight bookkeeping."""
    child_is_iop = getattr(child, "is_iop", False)
    if parent.name == "#score":
        if parent.args or not child_is_iop:
            raise QuerySyntaxError("#SCORE takes exactly one inverted-list arg")
        parent.args.append(child)
        return
    if parent.is_iop:
        if not child_is_iop:
            raise QuerySyntaxError(
                f"{parent.name} arguments must be inverted-list operators"
            )
        cfield = child.field
        if not parent.args:
            parent.field = cfield
        elif parent.field != cfield:
            raise QuerySyntaxError(
                "Arguments to inverted-list operators must share one field"
            )
        parent.args.append(child)
        return
    # parent is a score operator
    if child_is_iop:
        wrapper = Op("#score")
        wrapper.args.append(child)
        child = wrapper
    parent.args.append(child)
    if parent.name in WEIGHTED:
        if weight is None:
            raise QuerySyntaxError(f"{parent.name} arguments need weights")
        parent.weights.append(weight)


def _index_of_balancing_paren(s: str) -> int:
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _pop_subquery(s: str) -> tuple[str, str]:
    end = _index_of_balancing_paren(s)
    if end < 0:
        raise QuerySyntaxError("Unbalanced parentheses in subquery")
    return s[: end + 1], s[end + 1 :]


def _pop_term(s: str) -> tuple[str, str]:
    parts = s.split(None, 1)
    return parts[0], (parts[1] if len(parts) > 1 else "")


def parse_string(query: str, analyze) -> Op:
    query = query.strip()
    n_open, n_close = query.count("("), query.count(")")
    if (
        n_open == 0
        or n_open != n_close
        or _index_of_balancing_paren(query) != len(query) - 1
    ):
        raise QuerySyntaxError("Missing, unbalanced, or misplaced parentheses")

    opname, rest = query.split("(", 1)
    tree = _create_operator(opname.strip())
    rest = rest[: rest.rfind(")")].strip()

    raw_pattern = tree.name in RAW_PATTERN_OPS
    # #range takes RAW string args (column lo hi): numeric tokens are
    # bounds, never weights, and the column name is not analyzed
    if tree.name == "#range":
        while rest:
            tok, rest = _pop_term(rest)
            tree.args.append(tok.lower())
            rest = rest.strip()
        return tree
    while rest:
        weight = None
        head = rest.split(None, 1)
        # inside a raw-pattern op a numeric-looking token IS the pattern
        # (e.g. #regexp( 123 )), never a weight
        if not raw_pattern and _is_numeric(head[0]):
            weight = float(head[0])
            rest = head[1].strip() if len(head) > 1 else ""
            if not rest:
                break
        if rest[0] == "#" and not raw_pattern:
            sub, rest = _pop_subquery(rest)
            args = [parse_string(sub, analyze)]
        else:
            tok, rest = _pop_term(rest)
            args = (
                [_create_raw_pattern_term(tok)]
                if raw_pattern
                else _create_terms(tok, analyze)
            )
        rest = rest.strip()
        for a in args:
            _append_arg(tree, a, weight)
    return tree


def optimize(node):
    """Delete empty operators, collapse single-arg non-SCORE operators."""
    if isinstance(node, Term):
        return node
    if node.name == "#range":
        # raw string args (column, lo, hi) — nothing to optimize, nothing
        # to descend into; arity checked here so a malformed node fails
        # at parse/optimize time like other syntax errors
        if len(node.args) != 3:
            raise QuerySyntaxError("#range takes exactly (column lo hi)")
        return node
    if node.name in ("#filreq", "#filrej"):
        # Indri filter operators, positional: args[0] is the FILTER leg,
        # args[1] the scored query (Indri's argument order). An empty
        # filter requires nothing (#filreq matches nothing) / rejects
        # nothing (#filrej IS its query); an empty query matches nothing.
        # NOTE: a BARE stopword filter leg is dropped by the ANALYZER at
        # parse time, before this node sees it — positional identity
        # can't survive term analysis, so that case raises the arity
        # error below; a STRUCTURED empty filter (e.g. #syn( the ))
        # keeps its node through parsing and gets the semantics above.
        if len(node.args) != 2:
            raise ValueError(f"{node.name} takes exactly (filter, query)")
        f = optimize(node.args[0])
        q = optimize(node.args[1])
        if q is None:
            return None
        if f is None:
            return q if node.name == "#filrej" else None
        node.args = [f, q]
        return node
    if node.name == "#boosting":
        # ES boosting query, positional: args[0] is the POSITIVE (scored)
        # leg, the rest are NEGATIVE (demotion) legs — same shape as
        # #andnot, except negatives demote instead of exclude. An empty
        # positive kills the node; with no negatives left the node IS its
        # positive (demoting nothing). The generic single-arg collapse
        # below would wrongly promote a lone surviving NEGATIVE.
        pos = optimize(node.args[0]) if node.args else None
        if pos is None:
            return None
        negs = [o for a in node.args[1:] if (o := optimize(a)) is not None]
        if not negs:
            return pos
        node.args = [pos] + negs
        return node
    if node.name == "#constscore":
        # ES constant_score: exactly one child whose match set survives
        # with a constant score — never collapses to the bare child (that
        # would restore the child's scores).
        if len(node.args) != 1:
            raise QuerySyntaxError("#constscore takes exactly one argument")
        child = optimize(node.args[0])
        if child is None:
            return None
        node.args = [child]
        return node
    if node.name == "#andnot":
        # positional semantics: args[0] is the MUST leg, the rest are
        # MUST_NOT — an empty positive kills the node (matches nothing),
        # an empty negative is a no-op filter, and with no negatives left
        # the node IS its positive. The generic single-arg collapse below
        # would wrongly promote a lone surviving NEGATIVE to the result.
        pos = optimize(node.args[0]) if node.args else None
        if pos is None:
            return None
        negs = [o for a in node.args[1:] if (o := optimize(a)) is not None]
        if not negs:
            return pos
        node.args = [pos] + negs
        return node
    for i in range(len(node.args) - 1, -1, -1):
        opt = optimize(node.args[i])
        if opt is None:
            node.args.pop(i)
            if node.name in WEIGHTED and i < len(node.weights):
                node.weights.pop(i)
        else:
            node.args[i] = opt
    if not node.args:
        return None
    # span operators keep positional semantics a collapse would destroy:
    # #spanfirst/n(x) restricts x's positions (never collapses); #spannot
    # is positional (include, excludes...) like #andnot — a lone surviving
    # arg is ambiguous (the analyzer may have dropped the INCLUDE leg as a
    # stopword at parse time, same caveat as #filreq above), so under-arity
    # is a loud error rather than a silent wrong collapse
    if node.name == "#spanfirst":
        if len(node.args) != 1:
            raise QuerySyntaxError("#spanfirst/n takes exactly one argument")
        if node.dist < 1:
            raise QuerySyntaxError("#spanfirst/n requires n >= 1")
        return node
    if node.name == "#spannot":
        if len(node.args) < 2:
            raise QuerySyntaxError(
                "#spannot/n takes (include, exclude...) — an argument may "
                "have been dropped by stopword analysis"
            )
        return node
    # expansion operators (#fuzzy/#prefix/#wildcard/#regexp) rewrite their
    # single term against the dictionary — collapsing them to the bare term
    # would change semantics, unlike #AND(x) -> x
    if (
        len(node.args) == 1
        and node.name != "#score"
        and node.name not in EXPANSION_OPS
    ):
        return node.args[0]
    return node


def parse_query(query: str, default_op: str, analyze) -> "Op | Term | None":
    """Full pipeline: wrap in the model's default operator
    (`QryEval.java:121-122`), exact parse, optimize."""
    tree = parse_string(f"{default_op}({query})", analyze)
    return optimize(tree)


def expand_synonyms(tree, synonyms: "dict[str, list[str]]"):
    """Query-time synonym expansion — the ES synonym filter in its
    query-time form (expand=true): every :class:`Term` leaf whose term
    has an entry becomes ``#SYN(term syn1 ...)`` on the same field. The
    rewrite composes under every operator because #SYN is an
    inverted-list operator — ``#NEAR/1(a b)`` over an expanded leaf keeps
    exact reference lock-step semantics over the fused posting list.

    ``synonyms`` must already be in INDEX-term space (analyzed/stemmed);
    :class:`~searchengine_ray.engine.SearchEngine` normalizes
    user-supplied surface forms through its own analyzer at construction
    so query-side and index-side analysis always agree (the ES rule that
    the synonym filter sits inside the analyzer chain)."""
    if isinstance(tree, Term):
        syns = synonyms.get(tree.term)
        if not syns:
            return tree
        return Op(
            "#syn",
            args=[tree] + [Term(s, tree.field) for s in syns],
            field=tree.field,
        )
    if isinstance(tree, Op) and tree.name not in EXPANSION_OPS:
        tree.args = [expand_synonyms(a, synonyms) for a in tree.args]
    return tree


# --- ES simple_query_string -------------------------------------------------

# AST nodes are plain tuples: ("and"|"or", [children]) / ("not", child) /
# ("leaf", clause_string) where clause_string is in THIS engine's
# structured query language (term, #near/n(...), #prefix(...)).


def parse_simple_query(
    s: str, default_operator: str = "and"
) -> tuple:
    """Parse the ES/Lucene ``simple_query_string`` syntax
    (SimpleQueryParser.java semantics) into a boolean AST over this
    engine's clause language:

    - ``+`` joins clauses with AND, ``|`` with OR, whitespace with
      ``default_operator``; precedence NOT > AND > OR, parens group.
    - ``-clause`` negates (valid only in a conjunction — an unbounded
      or top-level negation raises, the #ANDNOT rule).
    - ``"a b"~s`` is a phrase with slop ``s`` -> ``#near/{s+1}`` (slop 0,
      the default, means adjacent-in-order = #near/1).
    - ``term*`` is a prefix query -> ``#prefix( term )``.

    The flagged-feature subset ES disables via ``flags`` (fuzzy ~N on
    bare terms, whitespace escaping) is intentionally out of scope.
    """
    if default_operator not in ("and", "or"):
        raise QuerySyntaxError(
            f"default_operator must be and/or, got {default_operator!r}"
        )
    toks = _sqs_lex(s)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def take():
        t = toks[pos[0]]
        pos[0] += 1
        return t

    _CLAUSE_STARTS = ("term", "phrase", "lparen", "minus")

    def parse_or():
        # '|' always joins here; whitespace-adjacent clauses also land at
        # this level when default_operator="or" (parse_and defers them)
        left = [parse_and()]
        while True:
            nxt = peek()
            if nxt == ("op", "|"):
                take()
                left.append(parse_and())
            elif (default_operator == "or" and nxt is not None
                  and nxt[0] in _CLAUSE_STARTS):
                left.append(parse_and())
            else:
                break
        return left[0] if len(left) == 1 else ("or", left)

    def parse_and():
        left = [parse_unary()]
        while True:
            nxt = peek()
            if nxt == ("op", "+"):
                take()
                left.append(parse_unary())
            elif nxt is not None and nxt[0] in _CLAUSE_STARTS:
                if default_operator == "or":
                    break  # whitespace joins at the OR level
                left.append(parse_unary())
            else:
                break
        return left[0] if len(left) == 1 else ("and", left)

    def parse_unary():
        nxt = peek()
        if nxt is None:
            raise QuerySyntaxError("simple_query_string: dangling operator")
        if nxt[0] == "minus":
            take()
            return ("not", parse_unary())
        if nxt[0] == "lparen":
            take()
            node = parse_or()
            if peek() != ("rparen", ")"):
                raise QuerySyntaxError("simple_query_string: unbalanced (")
            take()
            return node
        kind, val = take()
        if kind == "phrase":
            words, slop = val
            if len(words) == 1:
                return ("leaf", words[0])
            return ("leaf", f"#near/{slop + 1}( " + " ".join(words) + " )")
        if kind == "term":
            if val.endswith("*") and len(val) > 1:
                return ("leaf", f"#prefix( {val[:-1]} )")
            return ("leaf", val)
        raise QuerySyntaxError(f"simple_query_string: unexpected {val!r}")

    root = parse_or()
    if peek() is not None:
        raise QuerySyntaxError(
            f"simple_query_string: trailing input at {peek()!r}"
        )
    return root


def _sqs_lex(s: str) -> list:
    """Tokenize simple_query_string input. Token kinds: term, phrase
    ((words, slop) payload), op (+ or |), minus, lparen, rparen."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c == "(":
            out.append(("lparen", "(")); i += 1
        elif c == ")":
            out.append(("rparen", ")")); i += 1
        elif c == "+":
            out.append(("op", "+")); i += 1
        elif c == "|":
            out.append(("op", "|")); i += 1
        elif c == "-":
            out.append(("minus", "-")); i += 1
        elif c == '"':
            j = s.find('"', i + 1)
            if j < 0:
                raise QuerySyntaxError("simple_query_string: unclosed quote")
            words = s[i + 1:j].split()
            if not words:
                raise QuerySyntaxError("simple_query_string: empty phrase")
            slop = 0
            i = j + 1
            if i < n and s[i] == "~":
                k = i + 1
                while k < n and s[k].isdigit():
                    k += 1
                if k == i + 1:
                    raise QuerySyntaxError(
                        "simple_query_string: ~ needs a slop number"
                    )
                slop = int(s[i + 1:k])
                i = k
            out.append(("phrase", (tuple(w.lower() for w in words), slop)))
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in '()+|-"':
                j += 1
            out.append(("term", s[i:j].lower()))
            i = j
    return out
