"""C4 cleaning rules vs explicit expectations and a python span-dedup
oracle mirroring the module's pinned definitions."""

import re

import numpy as np
import pandas as pd
import pytest

from yirgacheffe_spark.text import c4


def test_line_filter_rules(spark):
    text = "\n".join([
        "This line has enough words and ends well.",      # keep
        "Short line.",                                     # < 5 words
        "This line has plenty of words but no terminal punctuation",  # drop
        "Enable javascript to view this content please.",  # blocklisted
        'He said "five words quoted here."',               # keep (quote end)
        "One more proper sentence with enough words!",     # keep
    ])
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    got = c4.c4_line_filter(df).collect()[0]["text"]
    assert got == "\n".join([
        "This line has enough words and ends well.",
        'He said "five words quoted here."',
        "One more proper sentence with enough words!",
    ])


def test_page_filter_rules(spark):
    pages = {
        1: "One sentence here. Two sentences now. Three makes the cut.",
        2: "Only one sentence lives here.",
        3: "Lorem Ipsum dolor sit amet. More text follows. And more.",
        4: "Code page alert. function() { return 1; }. Three sentences.",
    }
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(pages), "text": list(pages.values())}))
    kept = {r["doc_id"] for r in c4.c4_page_filter(df).collect()}
    assert kept == {1}


def _oracle_span_dedup(docs, k=3):
    """(doc_id -> cleaned text) mirroring c4_span_dedup exactly."""
    split = lambda t: [s for s in re.split(r"(?<=[.!?])\s+", t) if s.strip()]
    spans = []  # (hash key, doc_id, pos)
    for did in sorted(docs):
        ss = split(docs[did])
        for i in range(len(ss) - k + 1):
            key = "".join(s.lower().strip() for s in ss[i:i + k])
            spans.append((key, did, i))
    seen = {}
    deleted = {}
    for key, did, pos in sorted(spans, key=lambda x: (x[0], x[1], x[2])):
        if key not in seen:
            seen[key] = (did, pos)
        else:
            deleted.setdefault(did, set()).update(range(pos, pos + k))
    out = {}
    for did, t in docs.items():
        ss = split(t)
        if did in deleted:
            out[did] = " ".join(s for i, s in enumerate(ss)
                                if i not in deleted[did])
        else:
            out[did] = t
    return out


def test_span_dedup_matches_oracle(spark):
    dup = "The sky is blue today. Water remains wet. Rocks are very hard."
    docs = {
        1: dup + " Extra unique sentence one.",
        2: "Fresh opening line here. " + dup,               # loses the span
        3: "Unrelated page text. Totally different words. Nothing shared here.",
        4: dup,                                             # loses everything
        5: "Too short page.",                               # < 3 sentences
    }
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(docs), "text": list(docs.values())}))
    got = {r["doc_id"]: r["text"] for r in c4.c4_span_dedup(df).collect()}
    want = _oracle_span_dedup(docs)
    assert got == want
    assert got[1] == docs[1]            # first occurrence untouched
    assert got[2] == "Fresh opening line here."
    assert got[4] == ""
    assert got[5] == docs[5]


def test_span_dedup_random_corpus_oracle(spark):
    rng = np.random.default_rng(23)
    sents = [f"Sentence number {i} talks about topic {i % 7}." for i in range(40)]
    docs = {}
    for d in range(30):
        n = int(rng.integers(2, 12))
        picks = rng.integers(0, len(sents), n)
        docs[d] = " ".join(sents[p] for p in picks)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(docs), "text": list(docs.values())}))
    got = {r["doc_id"]: r["text"] for r in c4.c4_span_dedup(df).collect()}
    assert got == _oracle_span_dedup(docs)


def test_span_dedup_plan_is_python_free(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["A one. B two. C three.",
                                   "A one. B two. C three."]}))
    plan = c4.c4_span_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
