"""Gopher quality signals vs a plain-Python oracle implementing the
module's pinned definitions, plus the published-rule filter."""

import numpy as np
import pandas as pd
import pytest
from collections import Counter

from yirgacheffe_spark.text import gopher


def _oracle_signals(t: str) -> dict:
    words = [w for w in t.split() if w]
    words_lower = [w for w in t.lower().split() if w]
    n = len(words)
    lines = [l for l in t.split("\n") if l.strip()]
    paras = [p for p in t.split("\n\n") if p.strip()]

    def dup_fracs(items):
        if not items:
            return 0.0, 0.0
        c = Counter(items)
        n_dup = sum(v - 1 for v in c.values())
        total = sum(len(x) for x in items)
        dupc = sum((v - 1) * len(k) for k, v in c.items())
        return n_dup / len(items), (dupc / total if total else 0.0)

    out = {
        "n_words": n,
        "mean_word_len": (sum(len(w) for w in words) / n) if n else 0.0,
        "symbol_word_ratio": (
            (t.count("#") + t.count("...") + t.count("…")) / n if n else
            (t.count("#") + t.count("...") + t.count("…"))
        ),
        "frac_bullet_lines": (
            sum(1 for l in lines if l.strip()[:1] in "-*•●▪") / len(lines)
            if lines else 0.0
        ),
        "frac_ellipsis_lines": (
            sum(1 for l in lines
                if l.strip().endswith("...") or l.strip().endswith("…"))
            / len(lines) if lines else 0.0
        ),
        "frac_alpha_words": (
            sum(1 for w in words if any(c.isalpha() and c.isascii() for c in w)) / n
            if n else 0.0
        ),
        "n_stop_hits": sum(
            1 for s in ("the", "be", "to", "of", "and", "that", "have", "with")
            if s in words_lower
        ),
    }
    out["frac_dup_lines"], out["frac_dup_line_chars"] = dup_fracs(lines)
    out["frac_dup_paras"], out["frac_dup_para_chars"] = dup_fracs(paras)
    for nn in (2, 3, 4):
        key = f"top{nn}gram_char_frac"
        out[key] = 0.0
        if len(words_lower) >= nn and len(t):
            c = Counter(" ".join(words_lower[k:k + nn])
                        for k in range(len(words_lower) - nn + 1))
            gram, cnt = max(c.items(), key=lambda kv: (kv[1], kv[0]))
            if cnt >= 2:
                out[key] = min(cnt * len(gram) / len(t), 1.0)
    for nn in (5, 6, 7, 8, 9, 10):
        key = f"dup{nn}gram_char_frac"
        out[key] = 0.0
        if len(words_lower) >= nn and len(t):
            c = Counter(" ".join(words_lower[k:k + nn])
                        for k in range(len(words_lower) - nn + 1))
            dup = sum(v * len(g) for g, v in c.items() if v >= 2)
            out[key] = min(dup / len(t), 1.0)
    return out


CASES = [
    "the quick brown fox jumps over the lazy dog with style and that verve",
    "spam spam spam spam spam spam spam spam spam spam spam spam",
    "- bullet one\n- bullet two\nplain line ends here...\nplain again",
    "dup line\ndup line\ndup line\nunique line",
    "para one here\n\npara one here\n\npara two now",
    "a b " * 40,                       # heavy 2-gram repetition
    "one two three four five six seven eight nine ten " * 3,  # 10-gram dups
    "### symbols # everywhere ... and … more",
    "tiny",
    "",
    "word " * 60,                      # passes word count, heavy repetition
]


@pytest.fixture(scope="module")
def sig_rows(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(len(CASES), dtype=np.int64), "text": CASES}))
    return {r["doc_id"]: r.asDict()
            for r in gopher.gopher_signals(df).collect()}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_signals_match_python_oracle(sig_rows, i):
    want = _oracle_signals(CASES[i])
    got = sig_rows[i]
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12), (k, CASES[i][:40])


def test_filter_applies_published_rules(spark):
    texts = {
        # long, varied, stopword-rich, repetition-free: should pass
        "good": "the story of wonder and marvels that travelers have shared "
                + " ".join(f"detail{i} finding{i}" for i in range(30)),
        "too_short": "the cat sat with that hat to be of and",
        "repetitious": "the spam of and that with " * 20,
    }
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(len(texts))), "text": list(texts.values())}))
    kept = {r["text"] for r in gopher.gopher_filter(df).collect()}
    assert texts["good"] in kept
    assert texts["too_short"] not in kept
    assert texts["repetitious"] not in kept


def test_filter_keeps_schema_and_attaches_signals(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": ["the be to of and that have with " * 10]}))
    plain = gopher.gopher_filter(df)
    assert plain.columns == ["doc_id", "text"]
    attached = gopher.gopher_filter(df, signals_attached=True)
    assert "top2gram_char_frac" in attached.columns


def test_signals_on_gate_corpus(spark):
    """Smoke over the driver-generated documents table: every signal is
    finite and in range."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = gopher.gopher_signals(docs).collect()
    assert len(rows) == 500
    for r in rows[:100]:
        for k in gopher.GOPHER_THRESHOLDS:
            v = r[k]
            assert v is not None and v >= 0, (k, v)


def test_curate_corpus_gopher_stage(spark):
    from yirgacheffe_spark.text import pipeline

    good = ("the story of wonder and marvels that travelers have shared "
            + " ".join(f"detail{i} finding{i}" for i in range(30)))
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "lang": ["en", "en"],
        "text": [good, "the spam of and that with " * 20]}))
    cur, report = pipeline.curate_corpus(
        docs, boilerplate_min_docs=None, min_quality=None,
        gopher_rules=True, near_dup_threshold=None, lang_fractions=None)
    assert dict(report)["gopher_rules"] == 1
    assert [r["doc_id"] for r in cur.collect()] == [1]
