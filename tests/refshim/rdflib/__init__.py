"""Minimal in-memory stand-in for the rdflib API surface the reference's
document->graph path touches (Graph/URIRef/Literal/Namespace + the RDF/
RDFS/XSD/SDO namespaces).  rdflib is not installed in this sandbox; this
shim lets the differential-test harness (tests/reference_runtime.py) run
the reference implementation at `/root/reference/src` in-process and
compare its emitted triple set against ours on ARBITRARY inputs, not
just the stored goldens.

Only the behaviors the reference's converter/processor actually exercise
are implemented (rdf_converter/converter.py, processor/rdf_processor.py):
triple-set add/union/iteration, namespace attribute access, and literal
lexical forms for str/bool/int/datetime.  Written against rdflib's
public, documented API semantics — no rdflib source was copied.
"""

from __future__ import annotations

import datetime as _dt


class URIRef(str):
    __slots__ = ()

    def __repr__(self) -> str:  # debugging aid only
        return f"URIRef({str.__repr__(self)})"


def _lexical(value) -> str:
    """rdflib's lexical form for the value types the reference emits."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    return str(value)


class Literal:
    __slots__ = ("value", "datatype", "lang", "_lex")

    def __init__(self, value, datatype=None, lang=None):
        self.value = value
        self.datatype = URIRef(datatype) if datatype is not None else None
        self.lang = lang
        self._lex = _lexical(value)

    def __str__(self) -> str:
        return self._lex

    def __eq__(self, other):
        return (isinstance(other, Literal) and self._lex == other._lex
                and self.datatype == other.datatype and self.lang == other.lang)

    def __hash__(self):
        return hash((self._lex, self.datatype, self.lang))

    def __repr__(self):
        return f"Literal({self._lex!r}, datatype={self.datatype!r})"


class BNode(str):
    __slots__ = ()
    _counter = [0]

    def __new__(cls, value=None):
        if value is None:
            cls._counter[0] += 1
            value = f"_:b{cls._counter[0]}"
        return str.__new__(cls, value)


class Namespace(str):
    """Plain namespace: attribute/key access mints URIRefs.  Mirrors the
    documented rdflib gotcha that attributes shadowed by str methods
    (e.g. ``NS.title``) resolve to the method — the reference only uses
    names that don't collide, so faithful either way."""
    __slots__ = ()

    def term(self, name: str) -> URIRef:
        return URIRef(str(self) + name)

    def __getitem__(self, key) -> URIRef:  # type: ignore[override]
        return URIRef(str(self) + key)

    def __getattr__(self, name: str) -> URIRef:
        if name.startswith("__"):
            raise AttributeError(name)
        return URIRef(str(self) + name)


class Graph:
    """A set of triples; exactly the subset of rdflib.Graph the reference
    uses: add / bind / += union / iteration / len."""

    def __init__(self, *args, **kwargs):
        self._triples: set[tuple] = set()
        self._ns: dict[str, str] = {}

    def add(self, triple):
        self._triples.add(tuple(triple))
        return self

    def bind(self, prefix, namespace, **kwargs):
        self._ns[prefix] = str(namespace)

    def namespaces(self):
        return iter(self._ns.items())

    def __iter__(self):
        return iter(self._triples)

    def __len__(self):
        return len(self._triples)

    def __contains__(self, triple):
        return tuple(triple) in self._triples

    def __iadd__(self, other: "Graph"):
        self._triples |= other._triples
        self._ns.update(other._ns)
        return self

    def __add__(self, other: "Graph"):
        g = Graph()
        g._triples = self._triples | other._triples
        g._ns = {**self._ns, **other._ns}
        return g

    def remove(self, triple):
        s, p, o = triple
        self._triples = {
            t for t in self._triples
            if not ((s is None or t[0] == s) and (p is None or t[1] == p)
                    and (o is None or t[2] == o))}

    def triples(self, pattern):
        s, p, o = pattern
        for t in self._triples:
            if ((s is None or t[0] == s) and (p is None or t[1] == p)
                    and (o is None or t[2] == o)):
                yield t

    def serialize(self, *args, **kwargs):
        raise NotImplementedError(
            "refshim Graph does not serialize; compare triple sets in memory")

    def parse(self, *args, **kwargs):
        raise NotImplementedError(
            "refshim Graph does not parse; load goldens via "
            "knowledgebase_processor_spark.goldens.load_golden")


from . import namespace  # noqa: E402  (re-export module for `rdflib.namespace`)
from .namespace import RDF, RDFS, XSD, SDO  # noqa: E402,F401
