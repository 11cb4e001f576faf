"""Static entity-kind -> RDF emission rules.

Hand-derived from the reference's pydantic field metadata
(`/root/reference/src/knowledgebase_processor/models/kb_entities.py:11-712`)
and its converter semantics (`rdf_converter/converter.py:17-179`):

* ``rdf:type`` triples accumulate over the class MRO, so every entity gets
  its own class types plus ``kb:Entity`` (converter.py:67-85).
* every entity's ``kb_id`` maps to ``rdfs:seeAlso`` as an object property
  (kb_entities.py:15-23) — the self-link seen in every golden TTL.
* ``label`` maps to ``rdfs:label``; when the label field is unset/blank the
  most-specific class's ``rdfs_label_fallback_fields`` supplies it
  (converter.py:165-177).
* untyped string literals default to ``xsd:string`` (converter.py:153-156).
* ``schema:dateCreated``/``schema:dateModified`` exist in the reference
  output but are stripped by its own comparison protocol
  (tests/test_specifications.py:59-77), so we do not emit them.

This table is consumed by ``operators.triples`` to generate pure Spark SQL
column expressions — triple emission involves no Python UDF.
"""

from __future__ import annotations

from .uris import KB, RDF, RDFS, SCHEMA, XSD

XSD_STRING = XSD + "string"
XSD_INT = XSD + "integer"
XSD_BOOL = XSD + "boolean"
XSD_ANYURI = XSD + "anyURI"

RDF_TYPE = RDF + "type"
RDFS_LABEL = RDFS + "label"
RDFS_SEEALSO = RDFS + "seeAlso"
KB_SOURCE_DOC = KB + "sourceDocument"

# (column, predicate, datatype, is_object_property, is_list)
_POS = [
    ("position_start", KB + "positionStart", XSD_INT, False, False),
    ("position_end", KB + "positionEnd", XSD_INT, False, False),
]

KIND_RULES: dict[str, dict] = {
    # kb_entities.py:257-282
    "document": {
        "types": [KB + "Document", SCHEMA + "CreativeWork"],
        "fields": [
            ("original_path", KB + "originalPath", XSD_STRING, False, False),
            ("path_without_extension", KB + "pathWithoutExtension", XSD_STRING, False, False),
        ],
        "label_fallbacks": ["label", "original_path"],
    },
    # kb_entities.py:67-131
    "todo": {
        "types": [KB + "TodoItem", SCHEMA + "Action"],
        "fields": [
            ("description", SCHEMA + "description", XSD_STRING, False, False),
            ("is_completed", KB + "isCompleted", XSD_BOOL, False, False),
        ],
        "label_fallbacks": ["description"],
    },
    # kb_entities.py:285-327
    "wikilink": {
        "types": [KB + "WikiLink"],
        "fields": [
            ("original_text", KB + "originalText", XSD_STRING, False, False),
            ("target_path", KB + "targetPath", XSD_STRING, False, False),
            ("alias", KB + "alias", XSD_STRING, False, False),
            ("resolved_document_uri", KB + "resolvedDocument", XSD_ANYURI, True, False),
        ],
        "label_fallbacks": ["alias", "target_path"],
    },
    # kb_entities.py:379-429
    "heading": {
        "types": [KB + "Heading", SCHEMA + "Article"],
        "fields": [
            ("level", KB + "headingLevel", XSD_INT, False, False),
            ("text", SCHEMA + "headline", XSD_STRING, False, False),
        ] + _POS,
        "label_fallbacks": ["text"],
    },
    # kb_entities.py:432-466
    "section": {
        "types": [KB + "Section", SCHEMA + "Article"],
        "fields": [("heading_uri", KB + "hasHeading", XSD_ANYURI, True, False)] + _POS,
        "label_fallbacks": ["label"],
    },
    # kb_entities.py:469-519
    "list": {
        "types": [KB + "List", SCHEMA + "ItemList"],
        "fields": [
            ("ordered", KB + "isOrdered", XSD_BOOL, False, False),
            ("item_count", KB + "itemCount", XSD_INT, False, False),
            ("parent_list_uri", KB + "parentList", XSD_ANYURI, True, False),
        ] + _POS,
        "label_fallbacks": ["label"],
    },
    # kb_entities.py:522-564
    "list_item": {
        "types": [KB + "ListItem", SCHEMA + "ListItem"],
        "fields": [
            ("text", SCHEMA + "text", XSD_STRING, False, False),
            ("parent_list_uri", KB + "partOfList", XSD_ANYURI, True, False),
        ] + _POS,
        "label_fallbacks": ["text"],
    },
    # kb_entities.py:567-616
    "table": {
        "types": [KB + "Table", SCHEMA + "Table"],
        "fields": [
            ("row_count", KB + "rowCount", XSD_INT, False, False),
            ("column_count", KB + "columnCount", XSD_INT, False, False),
            ("headers", KB + "tableHeader", XSD_STRING, False, True),
        ] + _POS,
        "label_fallbacks": ["label"],
    },
    # kb_entities.py:619-668
    "code_block": {
        "types": [KB + "CodeBlock", SCHEMA + "SoftwareSourceCode"],
        "fields": [
            ("language", SCHEMA + "programmingLanguage", XSD_STRING, False, False),
            ("code", SCHEMA + "text", XSD_STRING, False, False),
            ("line_count", KB + "lineCount", XSD_INT, False, False),
        ] + _POS,
        "label_fallbacks": ["language", "label"],
    },
    # kb_entities.py:671-712
    "blockquote": {
        "types": [KB + "Blockquote", SCHEMA + "Quotation"],
        "fields": [
            ("level", KB + "nestingLevel", XSD_INT, False, False),
            ("text", SCHEMA + "text", XSD_STRING, False, False),
        ] + _POS,
        "label_fallbacks": ["text"],
    },
    # NER kinds (kb_entities.py:134-254) — populated by the dictionary
    # mention-detection operator (the reference's spaCy analyzer replacement).
    "person": {
        "types": [KB + "Person", SCHEMA + "Person"],
        "fields": [("text", KB + "fullName", XSD_STRING, False, False)],
        "label_fallbacks": ["text", "label"],
    },
    "organization": {
        "types": [KB + "Organization", SCHEMA + "Organization"],
        "fields": [("text", SCHEMA + "name", XSD_STRING, False, False)],
        "label_fallbacks": ["text", "label"],
    },
    "location": {
        "types": [KB + "Location", SCHEMA + "Place"],
        "fields": [("text", SCHEMA + "name", XSD_STRING, False, False)],
        "label_fallbacks": ["text", "label"],
    },
    "date_entity": {
        "types": [KB + "DateEntity", SCHEMA + "Date"],
        "fields": [("text", KB + "dateValue", XSD_STRING, False, False)],
        "label_fallbacks": ["text", "label"],
    },
}

# Integer / boolean columns (lexical form differs from plain strings).
INT_COLUMNS = {"level", "item_count", "row_count", "column_count",
               "line_count", "position_start", "position_end"}
BOOL_COLUMNS = {"is_completed", "ordered"}
