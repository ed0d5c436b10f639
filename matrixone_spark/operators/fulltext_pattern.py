"""MATCH...AGAINST boolean-mode pattern grammar + Column-expression evaluator.

Clean-room mirror of the reference's boolean search-string semantics
(pkg/fulltext/fulltext.go ParsePatternInBooleanMode/CreatePattern/ParsePhrase,
eval at Pattern.Eval fulltext.go:381-510, operators types.go:128-135):

  pattern  := '"' phrase '"'                (whole string only, as reference)
            | token (' ' token)*
  token    := [op] (word | word'*' | '(' pattern ')')
  op       := '+' (required) | '-' (forbidden) | '<' (weight 0.9)
            | '>' (weight 1.1) | '~' (rankless, weight -1.0)

Evaluation is SEQUENTIAL over the top-level token list with a running
(included, score) state per doc, exactly as Pattern.Eval threads `result`:

  - leaf TEXT/STAR: first token seeds the state; later tokens add score to
    already-included docs when any '+' exists anywhere (EvalPlusOR), else
    OR-merge docs (EvalOR — re-includes docs a '-' dropped).
  - '+' child: AND (EvalPlusPlus) — doc must match both sides, scores sum.
  - '-' child: drop docs matching the child; as the FIRST token it empties
    the result (Eval MINUS with nil result).
  - '<' / '>': child score scaled 0.9 / 1.1, ALWAYS OR-merged (Eval
    LESSTHAN/GREATERTHAN call EvalOR even under AnyPlus).
  - '~': child score scaled -1.0, PlusOR/OR like a leaf.
  - group '(...)': children evaluated independently and combined with MAX
    (Pattern.Combine); a non-first top-level group REPLACES the running
    state (Eval case GROUP shadows `result` — reference behavior).
  - phrase '"w1 w2"': all words present at positions p_i with
    p_i - p_1 equal to the word offsets inside the quoted string
    (SqlPhrase anchor grouping); boolean mode collapses to one row per doc.

Boolean mode ignores word occurrence counts: every leaf scores with tf=1
(sql.go: "in boolean mode, we ignore the word occurrence", GROUP BY doc_id),
idf = log10(N/df) squared as in natural mode.
"""

from __future__ import annotations

from dataclasses import dataclass, field

TEXT, STAR, PLUS, MINUS, LESSTHAN, GREATERTHAN, RANKLESS, GROUP, PHRASE = range(9)

_OPS = {"+": PLUS, "-": MINUS, "<": LESSTHAN, ">": GREATERTHAN, "~": RANKLESS}
_WEIGHT = {LESSTHAN: 0.9, GREATERTHAN: 1.1, RANKLESS: -1.0}


@dataclass
class Pattern:
    op: int
    text: str = ""
    children: "list[Pattern]" = field(default_factory=list)
    position: int = 0  # phrase children: char offset of the word in the body
    index: int = -1  # leaf slot in the score matrix


def parse_boolean(pattern: str) -> "list[Pattern]":
    """Parse a boolean-mode search string into top-level Pattern list."""
    pattern = pattern.strip()
    if not pattern:
        raise ValueError("fulltext search pattern must not be empty")
    if pattern.startswith('"') and pattern.endswith('"') and len(pattern) >= 2:
        body = pattern[1:-1].strip()
        if not body:
            raise ValueError("phrase is empty string")
        return [_parse_phrase(body)]
    ps = _parse_tokens(pattern)
    idx = 0
    for p in ps:
        idx = _assign_index(p, idx)
    for p in ps:
        _validate(p)
    return ps


def _parse_phrase(body: str) -> Pattern:
    import re

    children = [
        Pattern(op=TEXT, text=m.group(0), position=m.start())
        for m in re.finditer(r"\S+", body)
    ]
    ph = Pattern(op=PHRASE, text=body, children=children)
    for i, c in enumerate(children):
        c.index = i
    return ph


def _split_tokens(s: str) -> "list[str]":
    """Space-split at bracket depth 0; a '(' anywhere in a token enters
    bracket mode and the token ends right after the matching ')' (reference
    ParsePatternInBooleanMode scan loop)."""
    out, i, n = [], 0, len(s)
    while i < n:
        if s[i] == " ":
            i += 1
            continue
        start, depth = i, 0
        while i < n:
            ch = s[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            elif ch == " " and depth == 0:
                break
            i += 1
        out.append(s[start:i])
    return out


def _parse_tokens(pattern: str) -> "list[Pattern]":
    toks = _split_tokens(pattern)
    if any(t.count("(") != t.count(")") for t in toks):
        raise ValueError("no close bracket found")
    return [_create(t) for t in toks if t]


def _create(tok: str) -> Pattern:
    if tok.startswith("(") and tok.endswith(")"):
        inner = tok[1:-1].strip()
        children = _parse_tokens(inner)
        if not children:
            # reference parser rejects empty groups; without this, a pattern
            # of only empty groups reaches match_pattern with zero leaves
            # and crashes on frames[0] (r4 advisor, low)
            raise ValueError(f"empty group {tok!r} in boolean search string")
        return Pattern(op=GROUP, text=tok, children=children)
    op = _OPS.get(tok[0])
    if op is None:
        if tok.endswith("*") and len(tok) > 1:
            return Pattern(op=STAR, text=tok)
        return Pattern(op=TEXT, text=tok)
    rest = tok[1:]
    if not rest:
        raise ValueError(f"dangling operator {tok!r}")
    return Pattern(op=op, text=tok, children=_parse_tokens(rest))


def _assign_index(p: Pattern, idx: int) -> int:
    if p.op in (TEXT, STAR):
        p.index = idx
        return idx + 1
    for c in p.children:
        idx = _assign_index(c, idx)
    return idx


def _validate(p: Pattern) -> None:
    """Reference Validate (fulltext.go:540-577): single child under the
    weight ops; operator children must be GROUP/TEXT/STAR (no '+-+' chains)."""
    if p.op in (LESSTHAN, GREATERTHAN, RANKLESS) and len(p.children) != 1:
        raise ValueError("LESSTHAN, GREATERTHAN, RANKLESS must have single child only")
    if p.op in (PLUS, MINUS, LESSTHAN, GREATERTHAN, RANKLESS):
        for c in p.children:
            if c.op not in (GROUP, TEXT, STAR):
                raise ValueError("double operator")
    for c in p.children:
        _validate(c)


def leaves(ps: "list[Pattern]") -> "list[Pattern]":
    out: "list[Pattern]" = []

    def walk(p: Pattern) -> None:
        if p.op in (TEXT, STAR):
            out.append(p)
            return
        for c in p.children:
            walk(c)

    for p in ps:
        walk(p)
    return sorted(out, key=lambda p: p.index)


def eval_columns(ps: "list[Pattern]", matched, scores):
    """Fold the top-level pattern list into (included, score) Columns.

    ``matched[i]`` / ``scores[i]`` are the per-doc leaf Columns for leaf
    index i (matched: BooleanType; scores: unweighted DoubleType)."""
    from pyspark.sql import functions as F

    any_plus = any(p.op == PLUS for p in ps)

    def indep(p: Pattern, weight: float):
        """Pattern.Eval with result=nil → (matched, score) Columns."""
        if p.op in (TEXT, STAR):
            return matched[p.index], F.lit(float(weight)) * scores[p.index]
        if p.op == PLUS:
            return indep(p.children[0], weight)
        if p.op == MINUS:
            return F.lit(False), F.lit(0.0)
        if p.op in (LESSTHAN, GREATERTHAN, RANKLESS):
            return indep(p.children[0], weight * _WEIGHT[p.op])
        if p.op == GROUP:
            m_acc, s_acc = F.lit(False), F.lit(0.0)
            for c in p.children:
                cm, cs = indep(c, weight)
                s_acc = (
                    F.when(m_acc & cm, F.greatest(s_acc, cs))
                    .when(m_acc, s_acc)
                    .when(cm, cs)
                    .otherwise(F.lit(0.0))
                )
                m_acc = m_acc | cm
            return m_acc, s_acc
        raise ValueError(f"eval: unhandled op {p.op}")

    inc, score = None, None
    for p in ps:
        if p.op == MINUS:
            child_m, _ = indep(p.children[0], 1.0)
            if inc is None:  # leading '-' empties the result
                inc, score = F.lit(False), F.lit(0.0)
            else:
                inc = inc & ~child_m
            continue
        cm, cs = indep(p, 1.0)
        if inc is None or p.op == GROUP:
            # first pattern seeds; a later bare group REPLACES the running
            # state (reference Eval case GROUP shadows `result`)
            inc, score = cm, F.when(cm, cs).otherwise(F.lit(0.0))
            continue
        if p.op == PLUS:
            inc = inc & cm
            score = F.when(inc, score + cs).otherwise(F.lit(0.0))
        elif p.op in (LESSTHAN, GREATERTHAN) or not any_plus:
            # EvalOR: union; sum scores where both; re-include dropped docs
            score = (
                F.when(inc & cm, score + cs)
                .when(inc, score)
                .when(cm, cs)
                .otherwise(F.lit(0.0))
            )
            inc = inc | cm
        else:
            # EvalPlusOR: optional term adds score to still-included docs
            score = F.when(inc & cm, score + cs).otherwise(score)
    return inc, score
