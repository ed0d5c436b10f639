"""Mini-jq: recursive-descent parser + stream evaluator for the jq subset
the reference's jq/try_jq builtins exercise (func_builtin_jq.go delegates to
gojq; BVT cases test/distributed/cases/function/func_jq*.sql).

Supported grammar (jq precedence: pipe < comparison < addsub < muldiv):

    pipe   := expr ('|' expr)*
    expr   := sum (('=='|'!='|'<='|'>='|'<'|'>') sum)?
    sum    := prod (('+'|'-') prod)*
    prod   := unary (('*'|'/'|'%') unary)*
    unary  := '-' unary | primary
    primary:= number | string | 'true' | 'false' | 'null'
            | 'keys' | 'length' | 'add' | 'not' | 'floor' | 'abs'
            | 'select' '(' pipe ')' | 'map' '(' pipe ')'
            | 'if' pipe 'then' pipe ('else' pipe)? 'end'
            | '(' pipe ')'
            | path                       -- '.', '.a.b', '.a[0]', '.a[]'

Stream semantics follow jq: every expression maps one input value to a
stream of outputs; '[]' fans out, select() filters, binary operators take
the cartesian product (RHS outer, matching jq's generator order). Errors
(field access on a non-object, add on a non-array, unsupported syntax)
raise ValueError — the jq() UDF propagates, try_jq() yields NULL.

Divergence kept from round 1 (pytest-pinned): `length` on a scalar raises
(gojq returns |n| for numbers), `length` of null is 0.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""
    (?P<path>(?:\.[A-Za-z_][A-Za-z0-9_]*|\[\d+\]|\[\])+|\.)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|\||\+|-|\*|/|%|<|>|\(|\))
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)

_KEYWORDS = {"if", "then", "else", "end", "select", "map", "true", "false", "null",
             "keys", "length", "add", "not", "floor", "abs"}


def _tokenize(src: str) -> "list[tuple[str, str]]":
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(f"jq: unsupported expression at {src[pos:pos+12]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group(0)))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ValueError(f"jq: expected {val!r}, got {v!r}")

    # pipe := expr ('|' expr)*
    def pipe(self):
        stages = [self.expr()]
        while self.peek() == ("op", "|"):
            self.next()
            stages.append(self.expr())
        return ("pipe", stages) if len(stages) > 1 else stages[0]

    def expr(self):
        left = self.sum()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", ">", "<=", ">="):
            self.next()
            return ("cmp", v, left, self.sum())
        return left

    def sum(self):
        node = self.prod()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self.prod())
        return node

    def prod(self):
        node = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = ("arith", op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.next()
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        k, v = self.next()
        if k == "num":
            return ("lit", float(v) if "." in v else int(v))
        if k == "str":
            return ("lit", v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if k == "path":
            return ("path", v)
        if k == "op" and v == "(":
            node = self.pipe()
            self.expect(")")
            return node
        if k == "ident":
            if v == "true":
                return ("lit", True)
            if v == "false":
                return ("lit", False)
            if v == "null":
                return ("lit", None)
            if v in ("keys", "length", "add", "not", "floor", "abs"):
                return ("builtin", v)
            if v in ("select", "map"):
                self.expect("(")
                inner = self.pipe()
                self.expect(")")
                return (v, inner)
            if v == "if":
                cond = self.pipe()
                self.expect("then")
                then = self.pipe()
                els = ("path", ".")  # jq: missing else = identity
                if self.peek() == ("ident", "else"):
                    self.next()
                    els = self.pipe()
                self.expect("end")
                return ("if", cond, then, els)
        raise ValueError(f"jq: unsupported expression {v!r}")


def parse(src: str):
    p = _Parser(_tokenize(src))
    node = p.pipe()
    if p.i != len(p.toks):
        raise ValueError(f"jq: trailing tokens {p.toks[p.i:][:3]!r}")
    return node


_PATH_TOKEN = re.compile(r"\.[A-Za-z_][A-Za-z0-9_]*|\[\d+\]|\[\]")


def _eval_path(v, path: str) -> list:
    fanned = [v]
    for tok in _PATH_TOKEN.findall(path):
        nxt: list = []
        for c in fanned:
            if tok.startswith("."):
                if c is None:
                    nxt.append(None)
                elif isinstance(c, dict):
                    nxt.append(c.get(tok[1:]))
                else:
                    raise ValueError("jq: field access on non-object")
            elif tok == "[]":
                if not isinstance(c, list):
                    raise ValueError("jq: iterate non-array")
                nxt.extend(c)
            else:
                if c is None:
                    nxt.append(None)
                elif not isinstance(c, list):
                    raise ValueError("jq: index non-array")
                else:
                    i = int(tok[1:-1])
                    nxt.append(c[i] if i < len(c) else None)
        fanned = nxt
    return fanned


def _truthy(v) -> bool:
    return v is not None and v is not False


_NUM = (int, float)


def _arith(op: str, a, b):
    if op == "+":
        if a is None:
            return b
        if b is None:
            return a
        if isinstance(a, bool) or isinstance(b, bool):
            raise ValueError("jq: + on booleans")
        if isinstance(a, _NUM) and isinstance(b, _NUM):
            return a + b
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if isinstance(a, dict) and isinstance(b, dict):
            return {**a, **b}
        raise ValueError("jq: + type mismatch")
    if isinstance(a, bool) or isinstance(b, bool):
        raise ValueError(f"jq: {op} on booleans")
    if op == "-":
        if isinstance(a, list) and isinstance(b, list):
            return [x for x in a if x not in b]
        if isinstance(a, _NUM) and isinstance(b, _NUM):
            return a - b
    if op == "*" and isinstance(a, _NUM) and isinstance(b, _NUM):
        return a * b
    if op == "/" and isinstance(a, _NUM) and isinstance(b, _NUM):
        if b == 0:
            raise ValueError("jq: division by zero")
        r = a / b
        return int(r) if isinstance(a, int) and isinstance(b, int) and a % b == 0 else r
    if op == "%" and isinstance(a, _NUM) and isinstance(b, _NUM):
        if b == 0:
            raise ValueError("jq: division by zero")
        # jq %: truncated toward zero, like C
        return int(a) - int(b) * int(int(a) / int(b))
    raise ValueError(f"jq: {op} type mismatch")


_TYPE_ORDER = {type(None): 0, bool: 1, int: 2, float: 2, str: 3, list: 4, dict: 5}


def _cmp_key(v):
    """jq total order: null < false < true < numbers < strings < arrays < objects."""
    t = _TYPE_ORDER[type(v)]
    if t == 1:
        return (1, 1 if v else 0)
    if t == 2:
        return (2, v)
    if t == 3:
        return (3, v)
    if t == 4:
        return (4, [_cmp_key(x) for x in v])
    if t == 5:
        return (5, sorted((k, _cmp_key(x)) for k, x in v.items()))
    return (0, 0)


def _compare(op: str, a, b) -> bool:
    if op == "==":
        return a == b and isinstance(a, bool) == isinstance(b, bool)
    if op == "!=":
        return not _compare("==", a, b)
    ka, kb = _cmp_key(a), _cmp_key(b)
    if op == "<":
        return ka < kb
    if op == ">":
        return ka > kb
    if op == "<=":
        return ka <= kb
    return ka >= kb


def _eval(node, v) -> list:
    kind = node[0]
    if kind == "lit":
        return [node[1]]
    if kind == "path":
        return _eval_path(v, node[1])
    if kind == "pipe":
        values = [v]
        for stage in node[1]:
            nxt: list = []
            for x in values:
                nxt.extend(_eval(stage, x))
            values = nxt
        return values
    if kind == "neg":
        out = []
        for x in _eval(node[1], v):
            if not isinstance(x, _NUM) or isinstance(x, bool):
                raise ValueError("jq: negate non-number")
            out.append(-x)
        return out
    if kind == "cmp":
        _, op, ln, rn = node
        return [_compare(op, a, b) for b in _eval(rn, v) for a in _eval(ln, v)]
    if kind == "arith":
        _, op, ln, rn = node
        return [_arith(op, a, b) for b in _eval(rn, v) for a in _eval(ln, v)]
    if kind == "select":
        return [v for c in _eval(node[1], v) if _truthy(c)]
    if kind == "map":
        if not isinstance(v, list):
            raise ValueError("jq: map on non-array")
        out = []
        for x in v:
            out.extend(_eval(node[1], x))
        return [out]
    if kind == "if":
        _, cond, then, els = node
        out = []
        for c in _eval(cond, v):
            out.extend(_eval(then if _truthy(c) else els, v))
        return out
    if kind == "builtin":
        b = node[1]
        if b == "keys":
            if not isinstance(v, dict):
                raise ValueError("jq: keys on non-object")
            return [sorted(v.keys())]
        if b == "length":
            if isinstance(v, (dict, list, str)):
                return [len(v)]
            if v is None:
                return [0]
            raise ValueError("jq: length on scalar")
        if b == "add":
            if not isinstance(v, list):
                raise ValueError("jq: add on non-array")
            acc = None
            for x in v:
                acc = x if acc is None else _arith("+", acc, x)
            return [acc]
        if b == "not":
            return [not _truthy(v)]
        if b == "floor":
            if not isinstance(v, _NUM) or isinstance(v, bool):
                raise ValueError("jq: floor on non-number")
            import math

            return [math.floor(v)]
        if b == "abs":
            if not isinstance(v, _NUM) or isinstance(v, bool):
                raise ValueError("jq: abs on non-number")
            return [abs(v)]
    raise ValueError(f"jq: unsupported node {node!r}")


def run(value, program: str) -> list:
    """Evaluate a jq program against a parsed JSON value → output stream."""
    return _eval(parse(program), value)
