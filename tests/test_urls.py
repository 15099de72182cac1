"""URL canonicalization / domain filtering / per-domain caps vs explicit
expected values."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from yirgacheffe_spark.text import urls


CANON_CASES = [
    ("https://www.Example.COM/Path/", "example.com/Path"),
    ("http://example.com/", "example.com"),
    ("http://example.com", "example.com"),
    ("https://example.com:443/a", "example.com/a"),
    ("http://example.com:80/a?utm_source=x&id=7&fbclid=z", "example.com/a?id=7"),
    ("https://sub.www.example.com/a#frag", "sub.www.example.com/a"),
    ("https://example.com/a?ref=tw", "example.com/a"),
    ("https://example.com/a?x=1&y=2", "example.com/a?x=1&y=2"),
    ("not a url", None),
]


def test_canonicalize_cases(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "url": [c[0] for c in CANON_CASES]}))
    got = [r["c"] for r in
           df.select(urls.canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c[1] for c in CANON_CASES]


def test_dedup_by_canonical_url(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "url": [
            "https://www.example.com/a?utm_source=x",
            "http://example.com/a",          # same canonical as 1
            "https://example.com/b",
            "junk",                          # unparseable: kept
            "also junk",                     # unparseable: kept
        ]}))
    kept = sorted(r["doc_id"] for r in urls.dedup_by_canonical_url(df).collect())
    assert kept == [1, 3, 4, 5]


def test_domain_filter_block_and_allow(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "url": [
            "https://spam.bad.example/x",    # subdomain of bad.example
            "https://bad.example/y",         # exact
            "https://good.example/z",
            "https://notbad.example/w",      # NOT a subdomain of bad.example
        ]}))
    bl = spark.createDataFrame(pd.DataFrame({"domain": ["bad.example"]}))
    blocked = sorted(r["doc_id"] for r in urls.domain_filter(df, bl).collect())
    assert blocked == [3, 4]
    allowed = sorted(r["doc_id"] for r in
                     urls.domain_filter(df, bl, mode="allow").collect())
    assert allowed == [1, 2]
    with pytest.raises(ValueError, match="mode"):
        urls.domain_filter(df, bl, mode="deny")


def test_cap_per_domain(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "q": [0.1, 0.9, 0.5, 0.2, 0.8, 0.3],
        "url": ["https://a.example/%d" % i for i in range(3)]
               + ["https://b.example/%d" % i for i in range(2)] + ["junk"]}))
    # keep best-quality 1 per domain
    kept = sorted(r["doc_id"] for r in
                  urls.cap_per_domain(df, 1, order_col="q").collect())
    assert kept == [2, 5, 6]  # best of a.example, best of b.example, junk exempt
    # deterministic id order when no score given
    kept2 = sorted(r["doc_id"] for r in urls.cap_per_domain(df, 2).collect())
    assert kept2 == [1, 2, 4, 5, 6]


def test_pages_urls_roundtrip(spark):
    """The engine's own pages corpus parses cleanly: every host non-null."""
    from yirgacheffe_spark.spatial import pages as P

    df = P.generate_pages(spark, 500)
    n_null = df.where(urls.url_host(F.col("url")).isNull()).count()
    assert n_null == 0


def test_curate_corpus_url_and_decontam_stages(spark):
    from yirgacheffe_spark.text import pipeline

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "url": [
            "https://www.good.example/a?utm_source=x",
            "http://good.example/a",                  # canonical dup of 1
            "https://spam.bad.example/y",             # blocklisted
            "https://other.example/z",
        ],
        "text": [
            "alpha beta gamma delta epsilon",
            "totally different text here now",
            "blocked text never matters at all",
            "what is the capital of france people ask",  # contaminated
        ]}))
    bl = spark.createDataFrame(pd.DataFrame({"domain": ["bad.example"]}))
    evals = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100], "text": ["what is the capital of france"]}))
    cur, report = pipeline.curate_corpus(
        docs, url_col="url", url_blocklist=bl,
        boilerplate_min_docs=None, min_quality=None,
        near_dup_threshold=None, eval_docs=evals, decontam_ngram=4,
        lang_fractions=None)
    r = dict(report)
    assert r["url_domain_block"] == 3
    assert r["url_canonical_dedup"] == 2
    assert r["decontamination"] == 1
    assert [x["doc_id"] for x in cur.collect()] == [1]


def test_domain_filter_deep_host_cannot_bypass_blocklist(spark):
    """A host with more labels than the suffix cap must still match its
    short tail suffixes — prepending subdomain labels is the trivial
    blocklist-evasion move."""
    import pandas as pd

    deep = "a.b.c.d.e.f.g.h.i.j.k.l.evil.com"   # 14 labels
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "url": [f"https://{deep}/x", "https://fine.org/y"],
    }))
    bl = spark.createDataFrame(pd.DataFrame({"domain": ["evil.com"]}))
    kept = sorted(r["doc_id"] for r in urls.domain_filter(df, bl).collect())
    assert kept == [2]
    # exact full-host entry must also match for deep hosts
    bl2 = spark.createDataFrame(pd.DataFrame({"domain": [deep]}))
    kept2 = sorted(r["doc_id"] for r in urls.domain_filter(df, bl2).collect())
    assert kept2 == [2]


def test_domain_filter_refuses_ambiguous_domains_table(spark):
    import pandas as pd
    import pytest

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "url": ["https://x.com/"]}))
    multi = spark.createDataFrame(pd.DataFrame({
        "reason": ["spam"], "host": ["x.com"]}))
    with pytest.raises(ValueError, match="refusing to guess"):
        urls.domain_filter(df, multi)
    # but a named 'domain' column among others is fine
    named = spark.createDataFrame(pd.DataFrame({
        "reason": ["spam"], "domain": ["x.com"]}))
    assert urls.domain_filter(df, named).count() == 0


def test_url_windows_have_no_null_partition(spark):
    """The dedup/cap windows must never partition on a literal NULL key
    (web-scale junk URLs would serialise into one task): every row with an
    unparseable URL gets a singleton salted key, and results keep all of
    them."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(1, 8)),
        "url": ["::junk::", "not a url", "also junk", "%%%", "http://a.com/1",
                "http://a.com/1", "http://a.com/2"],
    }))
    out = urls.dedup_by_canonical_url(df)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2, 3, 4, 5, 7]  # junk all kept; 6 is a dup of 5
    capped = urls.cap_per_domain(df, 1)
    kept2 = sorted(r["doc_id"] for r in capped.collect())
    assert kept2 == [1, 2, 3, 4, 5]  # one per a.com; junk exempt


def test_null_doc_id_junk_urls_all_kept(spark):
    """Rows whose URL is junk AND whose id is NULL must all survive dedup
    and cap (the salt falls back to a unique monotonic id instead of
    collapsing every such row into one NULL partition)."""
    df = spark.createDataFrame(
        [(None, "%%%"), (None, "%%%"), (None, "::junk::"),
         (7, "http://a.com/x"), (8, "http://a.com/x")],
        "doc_id int, url string",
    )
    out = urls.dedup_by_canonical_url(df).collect()
    assert sum(1 for r in out if r.doc_id is None) == 3
    assert sorted(r.doc_id for r in out if r.doc_id is not None) == [7]
    capped = urls.cap_per_domain(df, 1).collect()
    assert sum(1 for r in capped if r.doc_id is None) == 3
