from .core import extract_entities, ENTITY_FIELDS  # noqa: F401
