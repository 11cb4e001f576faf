from knowledgebase_processor_spark import uris


def test_normalize_for_id():
    assert uris.normalize_for_id("Hello, World!") == "hello-world"
    assert uris.normalize_for_id("  --x--  ") == "x"
    assert uris.normalize_for_id("Café") == "cafe"
    assert uris.normalize_for_id("") == ""


def test_hash16_is_urlsafe_b64_sha256_prefix():
    h = uris.hash16("a", "b")
    assert len(h) == 16
    assert all(c.isalnum() or c in "-_" for c in h)
    # deterministic
    assert h == uris.hash16("ab")


def test_todo_uri_normalization():
    # id_generator.py:198-243 semantics
    assert uris.todo_uri("test_cases/x", "Todo item 1") == (
        "http://example.org/kb/documents/test_cases/x/todo/todo-item-1")
    assert uris.todo_uri("http://e.org/d/", "A  b!!").endswith("/d/todo/a-b")
    assert uris.todo_uri("d", "???").endswith("/todo/unnamed-todo")


def test_element_uri_patterns():
    u = uris.element_uri("heading", "h1-Test Document", "test_cases/t")
    assert u == "http://example.org/kb/documents/test_cases/t/heading/h1-test-document"
    long = uris.element_uri("section", "x" * 300, "d")
    assert len(long.rsplit("/", 1)[1]) == 100


def test_resolve_uri():
    assert uris.resolve_uri("test_cases/x") == "http://example.org/kb/vocab#/test_cases/x"
    assert uris.resolve_uri("http://a/b") == "http://a/b"
