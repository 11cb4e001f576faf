"""Import-time stub: the reference package __init__ pulls its SPARQL HTTP
client, which the differential harness never calls (no endpoint in the
sandbox).  Names mirror SPARQLWrapper's public constants only."""

JSON, XML, TURTLE, N3, RDFXML, POST, GET, DIGEST, BASIC = (
    "json", "xml", "turtle", "n3", "rdf+xml", "POST", "GET", "DIGEST", "BASIC")


class SPARQLWrapper:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "refshim SPARQLWrapper is import-only; no HTTP in the sandbox")
