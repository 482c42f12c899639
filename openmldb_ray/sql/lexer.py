"""Tokenizer for the OpenMLDB SQL subset.

Notable lexical quirks carried over from the reference grammar
(hybridse/src/plan/planner.cc + zetasql fork):
- interval literals in frame bounds: ``10s``, ``3m``, ``2h``, ``30d``
  (seconds/minutes/hours/days; bare ints in ROWS_RANGE are ms)
- ``!=`` and ``<>`` are both "not equal"; ``==`` is accepted as ``=``
- identifiers may be backquoted
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    kind: str    # "ident" | "int" | "float" | "interval" | "string" | "op" | "placeholder"
    text: str
    value: object = None
    pos: int = 0


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*)
  | (?P<placeholder>\{\d+\})
  | (?P<interval>\d+[smhd]\b)
  | (?P<float>(\d+\.\d*|\.\d+)([eE][+-]?\d+)?[fF]?|\d+[eE][+-]?\d+[fF]?|\d+[fF])
  | (?P<int>\d+[lL]?)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*|`[^`]*`)
  | (?P<op><<|>>|<=|>=|!=|<>|==|\|\||[-+*/%=<>(),.;!\[\]&|~^])
    """,
    re.VERBOSE,
)

_INTERVAL_MS = {"s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


class SqlSyntaxError(ValueError):
    pass


def tokenize(sql: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            raise SqlSyntaxError(f"unexpected character {sql[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "interval":
            out.append(Token("interval", text,
                             int(text[:-1]) * _INTERVAL_MS[text[-1]], m.start()))
        elif kind == "int":
            out.append(Token("int", text, int(text.rstrip("lL")), m.start()))
        elif kind == "float":
            out.append(Token("float", text, float(text.rstrip("fF")), m.start()))
        elif kind == "string":
            body = text[1:-1]
            # recognized escapes collapse; anything else keeps the backslash
            # (MySQL-style: "\_" stays "\_" so LIKE patterns keep their
            # escape markers)
            body = re.sub(
                r"\\(.)",
                lambda mm: {"n": "\n", "t": "\t", "\\": "\\", "'": "'",
                            '"': '"', "0": "\0"}.get(mm.group(1),
                                                      "\\" + mm.group(1)),
                body)
            out.append(Token("string", text, body, m.start()))
        elif kind == "ident":
            t = text[1:-1] if text.startswith("`") else text
            out.append(Token("ident", t, t, m.start()))
        elif kind == "placeholder":
            # {0} table refs from the YAML corpus; resolved in a reserved
            # namespace so they never collide with real table names
            name = f"__tbl{text[1:-1]}__"
            out.append(Token("ident", name, name, m.start()))
        else:
            out.append(Token("op", text, text, m.start()))
    return out
