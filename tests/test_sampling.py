"""Per-domain cap / downsample: exact selection vs a pure-Python md5
recompute, skew-immunity of the rate sampler's plan."""

import hashlib


def _h(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)


def _mkdocs(spark):
    # 3 domains: a.com (60 docs), b.com (10), c.com (3)
    rows = []
    for i in range(73):
        dom = "a.com" if i < 60 else ("b.com" if i < 70 else "c.com")
        rows.append((i, f"https://www.{dom}/p/{i}"))
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_cap_per_domain_exact_selection(spark):
    from knowledgebase_processor_spark.operators.sampling import cap_per_domain
    d = _mkdocs(spark)
    out = cap_per_domain(d, cap=5).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert sorted(by_dom) == ["a.com", "b.com", "c.com"]
    assert len(by_dom["a.com"]) == 5 and len(by_dom["b.com"]) == 5
    assert len(by_dom["c.com"]) == 3  # under cap: all kept
    # exact selection = 5 smallest md5 hashes among a.com's ids 0..59
    expect_a = sorted(range(60), key=lambda i: (_h(i), i))[:5]
    assert sorted(by_dom["a.com"]) == sorted(expect_a)


def test_downsample_per_domain_matches_recompute(spark):
    from knowledgebase_processor_spark.operators.sampling import (
        downsample_per_domain)
    d = _mkdocs(spark)
    out = downsample_per_domain(d, cap=5).collect()
    kept = sorted(r["doc_id"] for r in out)
    expect = []
    for i in range(73):
        n = 60 if i < 60 else (10 if i < 70 else 3)
        if float(_h(i)) < (5.0 / n) * float(1 << 60):
            expect.append(i)
    assert kept == sorted(expect)
    # under-cap domain keeps everything
    assert {70, 71, 72}.issubset(set(kept))


def test_downsample_plan_has_no_window(spark):
    """The rate sampler must stay window-free (a head domain would
    serialize in one window partition): aggregation + join + filter only."""
    from knowledgebase_processor_spark.operators.sampling import (
        downsample_per_domain)
    plan = downsample_per_domain(_mkdocs(spark), cap=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_cap_per_domain_salted_equals_unsalted(spark):
    """The two-level salted tournament must select EXACTLY the same rows
    as the single-window form (round 1 can never discard a winner)."""
    from knowledgebase_processor_spark.operators.sampling import cap_per_domain
    d = _mkdocs(spark)
    plain = sorted((r["domain"], r["doc_id"])
                   for r in cap_per_domain(d, cap=5).collect())
    for s in (2, 7, 64):
        salted = sorted((r["domain"], r["doc_id"])
                        for r in cap_per_domain(d, cap=5, salts=s).collect())
        assert salted == plain, s
