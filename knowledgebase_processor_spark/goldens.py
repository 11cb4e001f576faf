"""Tiny Turtle reader for the reference's golden TTL fixtures.

rdflib is not installable in this sandbox (SURVEY.md §5), so we parse the
golden files (`/root/reference/specs/test_cases/*/expected_output.ttl`,
`/root/reference/specs/reference_corpus/*.ttl`) with a purpose-built reader.
The goldens are rdflib-serialized Turtle: prefixed names, IRIs, quoted /
triple-quoted strings with standard escapes, bare integers and booleans,
``;``/``,`` continuation — no blank nodes, collections, or language tags.

Comparison protocol (mirrors reference tests/test_specifications.py:59-128):
triples normalize to ``(subj, pred, obj_lexical, objflag)`` where objflag is
``"uri"`` or the literal's datatype IRI; ``schema:dateCreated`` /
``schema:dateModified`` triples are dropped.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Iterator

from .uris import SCHEMA, XSD

Triple = tuple[str, str, str, str]   # (subj, pred, obj_lexical, "uri"|datatype)

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_TS_PREDS = {SCHEMA + "dateCreated", SCHEMA + "dateModified"}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
            "b": "\b", "f": "\f", "'": "'"}


class _Tokenizer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.n = len(text)

    def _skip_ws(self) -> None:
        while self.pos < self.n:
            c = self.text[self.pos]
            if c in " \t\r\n":
                self.pos += 1
            elif c == "#":
                nl = self.text.find("\n", self.pos)
                self.pos = self.n if nl == -1 else nl + 1
            else:
                return

    def _string(self) -> str:
        t, p = self.text, self.pos
        quote = '"""' if t.startswith('"""', p) else '"'
        p += len(quote)
        out: list[str] = []
        while p < self.n:
            if t.startswith(quote, p):
                self.pos = p + len(quote)
                return "".join(out)
            c = t[p]
            if c == "\\":
                esc = t[p + 1]
                if esc == "u":
                    out.append(chr(int(t[p + 2:p + 6], 16)))
                    p += 6
                elif esc == "U":
                    out.append(chr(int(t[p + 2:p + 10], 16)))
                    p += 10
                else:
                    out.append(_ESCAPES.get(esc, esc))
                    p += 2
            else:
                out.append(c)
                p += 1
        raise ValueError("unterminated string literal")

    def tokens(self) -> Iterator[tuple[str, str]]:
        while True:
            self._skip_ws()
            if self.pos >= self.n:
                return
            t, p = self.text, self.pos
            c = t[p]
            if c == "<":
                end = t.index(">", p)
                self.pos = end + 1
                yield ("iri", t[p + 1:end])
            elif c == '"':
                lex = self._string()
                if t.startswith("^^", self.pos):
                    self.pos += 2
                    self._skip_ws()
                    dt_kind, dt = next(self.tokens())
                    yield ("literal_typed", lex + "\x00" + dt)
                else:
                    yield ("literal", lex)
            elif c in ".;,":
                self.pos += 1
                yield ("punct", c)
            else:
                m = re.match(r"[^\s;,]+", t[p:])
                word = m.group(0)
                # a trailing '.' ends the statement unless inside a number
                if word.endswith(".") and not re.match(r"^[+-]?\d+\.\d+$", word):
                    word = word[:-1]
                self.pos = p + len(word)
                yield ("word", word)
                if m.group(0) != word:
                    yield ("punct", ".")


def parse_turtle(text: str) -> set[Triple]:
    prefixes: dict[str, str] = {}
    triples: set[Triple] = set()
    toks = list(_Tokenizer(text).tokens())
    i, n = 0, len(toks)

    def resolve(kind: str, val: str) -> tuple[str, str]:
        """-> (value, flag) where flag is 'uri' or a datatype IRI."""
        if kind == "iri":
            return val, "uri"
        if kind == "literal":
            return val, XSD + "string"
        if kind == "literal_typed":
            lex, dt = val.split("\x00", 1)
            if "://" not in dt:
                pre, _, local = dt.partition(":")
                dt = prefixes.get(pre, pre + ":") + local
            return lex, dt
        # word: prefixed name, boolean, or number
        if val == "a":
            return _RDF_TYPE, "uri"
        if val in ("true", "false"):
            return val, XSD + "boolean"
        if re.match(r"^[+-]?\d+$", val):
            return val, XSD + "integer"
        if re.match(r"^[+-]?\d*\.\d+(?:[eE][+-]?\d+)?$", val):
            return val, XSD + "decimal"
        pre, _, local = val.partition(":")
        if pre in prefixes:
            return prefixes[pre] + local, "uri"
        raise ValueError(f"unresolvable token {val!r}")

    while i < n:
        kind, val = toks[i]
        if kind == "word" and val in ("@prefix", "PREFIX"):
            pname = toks[i + 1][1].rstrip(":")
            prefixes[pname] = toks[i + 2][1]
            i += 3
            if i < n and toks[i] == ("punct", "."):
                i += 1
            continue
        subj, _ = resolve(kind, val)
        i += 1
        while i < n:
            pk, pv = toks[i]
            pred, _ = resolve(pk, pv)
            i += 1
            while i < n:
                ok, ov = toks[i]
                obj, flag = resolve(ok, ov)
                triples.add((subj, pred, obj, flag))
                i += 1
                if i < n and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < n and toks[i] == ("punct", ";"):
                i += 1
                # rdflib may emit "; ." — tolerate a statement end after ;
                if i < n and toks[i] == ("punct", "."):
                    i += 1
                    break
                continue
            if i < n and toks[i] == ("punct", "."):
                i += 1
            break
    return triples


def load_golden(path: str | Path, drop_timestamps: bool = True) -> set[Triple]:
    triples = parse_turtle(Path(path).read_text(encoding="utf-8"))
    if drop_timestamps:
        triples = {t for t in triples if t[1] not in _TS_PREDS}
    return triples


# ---------------------------------------------------------------------------
# fixture discovery (FIXTURES.md §3)
# ---------------------------------------------------------------------------
SPECS_DIR = Path("/root/reference/specs")


def spec_cases() -> list[tuple[str, Path, Path]]:
    """(doc_id, input.md, expected_output.ttl) for all unit cases + corpus."""
    cases = []
    tc = SPECS_DIR / "test_cases"
    if tc.is_dir():
        for d in sorted(p for p in tc.iterdir() if p.is_dir()):
            cases.append((f"test_cases/{d.name}", d / "input.md", d / "expected_output.ttl"))
    rc = SPECS_DIR / "reference_corpus"
    if rc.is_dir():
        for md in sorted(rc.glob("*.md")):
            clean = md.stem.replace(" ", "_").replace("-", "_").replace(":", "_")
            cases.append((f"test_corpus/{clean}", md, md.with_suffix(".ttl")))
    return [c for c in cases if c[1].exists() and c[2].exists()]
