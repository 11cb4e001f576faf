"""`rdflib.namespace` counterpart of the shim: the four well-known
namespaces the reference imports (RDF, RDFS, XSD, SDO-as-SCHEMA) plus
the Namespace class re-export."""

from __future__ import annotations


def _defined(base: str):
    class _NS:
        _base = base

        def __getattr__(self, name: str):
            if name.startswith("_"):
                raise AttributeError(name)
            from . import URIRef
            return URIRef(self._base + name)

        def __getitem__(self, key: str):
            from . import URIRef
            return URIRef(self._base + key)

        def __str__(self) -> str:
            return self._base

        def __repr__(self) -> str:
            return f"Namespace({self._base!r})"

    return _NS()


RDF = _defined("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
RDFS = _defined("http://www.w3.org/2000/01/rdf-schema#")
XSD = _defined("http://www.w3.org/2001/XMLSchema#")
SDO = _defined("https://schema.org/")

from . import Namespace  # noqa: E402,F401
