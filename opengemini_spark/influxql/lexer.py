"""InfluxQL tokenizer (subset of lib/util/lifted/influx/influxql/scanner.go).

Token kinds: IDENT, NUMBER, INTEGER, STRING ('…'), REGEX (/…/), DURATION
(1h30m…), operators, keywords. Hand-written like the reference's scanner.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "select", "from", "where", "group", "by", "fill", "order", "limit",
    "offset", "slimit", "soffset", "as", "and", "or", "not", "time", "desc",
    "asc", "show", "measurements", "tag", "field", "keys", "values", "with",
    "key", "in", "distinct", "null", "none", "previous", "linear", "on",
    "into", "tz", "graph", "node", "edge",
}

_DUR_RE = re.compile(r"(\d+)(ns|u|µ|ms|s|m|h|d|w)")

DUR_NS = {
    "ns": 1, "u": 1_000, "µ": 1_000, "ms": 1_000_000, "s": 1_000_000_000,
    "m": 60_000_000_000, "h": 3_600_000_000_000, "d": 86_400_000_000_000,
    "w": 604_800_000_000_000,
}


@dataclass
class Tok:
    kind: str          # IDENT KEYWORD NUMBER INTEGER STRING REGEX DURATION OP EOF
    text: str
    value: object = None


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<regex>/(?:[^/\\]|\\.)+/)
  | (?P<duration>\d+(?:ns|u|µ|ms|s|m|h|d|w)(?:\d+(?:ns|u|µ|ms|s|m|h|d|w))*)
  | (?P<number>\d+\.\d+([eE][-+]?\d+)?|\.\d+|\d+[eE][-+]?\d+)
  | (?P<integer>\d+)
  | (?P<quoted_ident>"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<op><=|>=|!=|<>|=~|!~|::|[-+*/%(),=<>!\[\];])
    """,
    re.VERBOSE,
)


def _regex_allowed(toks: list[Tok]) -> bool:
    """A ``/`` starts a regex literal only where influxql's scanner allows
    one: after ``=~``/``!~``, after FROM (regex measurement source), after
    a comma continuing a FROM list, or after a db/rp qualifier ident that
    ends with ``.`` (``FROM db0.rp0./cpu[13]/``) — everywhere else it's
    division (``value / 2 + cost / 4`` must not lex the middle as a
    regex)."""
    for i in range(len(toks) - 1, -1, -1):
        t = toks[i]
        if t.kind == "OP" and t.text in ("=~", "!~"):
            return True
        if t.kind == "KEYWORD" and t.text == "from":
            return True
        if t.kind == "OP" and t.text == ",":
            continue  # look through FROM-list commas
        if (
            t.kind == "IDENT"
            and t.text.endswith(".")
            and i > 0
            and toks[i - 1].kind == "KEYWORD"
            and toks[i - 1].text == "from"
        ):
            return True  # qualified regex source: FROM db.rp./re/
        return False
    return False


def lex(src: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    n = len(src)
    while pos < n:
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"InfluxQL: bad character {src[pos]!r} at {pos}")
        if m.lastgroup == "regex" and not _regex_allowed(toks):
            toks.append(Tok("OP", "/", "/"))
            pos += 1
            continue
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "string":
            toks.append(Tok("STRING", text, text[1:-1].replace("\\'", "'")))
        elif kind == "regex":
            toks.append(Tok("REGEX", text, text[1:-1]))
        elif kind == "duration":
            ns = sum(int(v) * DUR_NS[u] for v, u in _DUR_RE.findall(text))
            toks.append(Tok("DURATION", text, ns))
        elif kind == "number":
            toks.append(Tok("NUMBER", text, float(text)))
        elif kind == "integer":
            toks.append(Tok("INTEGER", text, int(text)))
        elif kind == "quoted_ident":
            # `cte1."tag"` — a dotted reference whose segment is quoted:
            # the preceding IDENT ends with '.', merge into one name
            # (influxql scanner treats `a."b"` as a single VarRef)
            if (
                toks
                and toks[-1].kind == "IDENT"
                and toks[-1].value.endswith(".")
            ):
                prev = toks.pop()
                merged = prev.value + text[1:-1]
                toks.append(Tok("IDENT", prev.text + text, merged))
            else:
                toks.append(Tok("IDENT", text, text[1:-1]))
        elif kind == "ident":
            low = text.lower()
            if low in KEYWORDS:
                toks.append(Tok("KEYWORD", low, low))
            else:
                toks.append(Tok("IDENT", text, text))
        else:
            toks.append(Tok("OP", text, text))
    toks.append(Tok("EOF", ""))
    return toks
