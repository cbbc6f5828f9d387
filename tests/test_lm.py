"""Stupid-backoff LM perplexity: independent pure-python reference
(dict counting, no DataFrame machinery) + semantic property tests."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from ckg_spark.ops import lm

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat and the dog"),
    (4, "a completely different sentence entirely"),
    (5, "the cat sat on the mat"),  # exact dup of 1 -> identical ppl
    (6, "zzz qqq xxx zzz qqq xxx zzz"),  # repetitive junk
]


def _ref_scores(docs, model_docs=None, alpha=0.4, min_count=1):
    tok = lambda t: re.findall(r"[a-z0-9']+", t.lower())
    model_docs = model_docs or docs
    uni, bi, ctx = Counter(), Counter(), Counter()
    for _i, t in model_docs:
        tks = tok(t)
        if not tks:
            continue
        for prev, w in zip(["<s>"] + tks[:-1], tks):
            uni[w] += 1
            ctx[prev] += 1
            bi[(prev, w)] += 1
    total = sum(uni.values())
    out = {}
    for i, t in docs:
        tks = tok(t)
        if not tks:
            continue
        lps = []
        for prev, w in zip(["<s>"] + tks[:-1], tks):
            if bi.get((prev, w), 0) >= min_count:
                p = bi[(prev, w)] / ctx[prev]
            else:
                p = alpha * (uni[w] if w in uni else 0.5) / total
            lps.append(math.log(p))
        alp = sum(lps) / len(lps)
        out[i] = (len(lps), alp, math.exp(-alp))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_perplexity_matches_reference(spark, docs_df):
    got = {r["doc"]: r for r in lm.lm_perplexity(docs_df, "text", "doc_id").collect()}
    ref = _ref_scores(DOCS)
    assert set(got) == set(ref)
    for i, (n, alp, ppl) in ref.items():
        assert got[i]["n_tokens"] == n
        assert got[i]["avg_logprob"] == pytest.approx(alp, abs=1e-6)
        assert got[i]["ppl"] == pytest.approx(ppl, abs=1e-3)
    # exact duplicate docs score identically
    assert got[1]["ppl"] == got[5]["ppl"]


def test_separate_model_corpus_and_unseen_floor(spark, docs_df):
    model = docs_df.filter("doc_id <= 3")  # doc 4's words unseen by the model
    got = {
        r["doc"]: r
        for r in lm.lm_perplexity(docs_df, "text", "doc_id", model_docs=model).collect()
    }
    ref = _ref_scores(DOCS, model_docs=DOCS[:3])
    for i, (n, alp, ppl) in ref.items():
        assert got[i]["avg_logprob"] == pytest.approx(alp, abs=1e-6), i
    # unseen-vocabulary doc is the worst-scored one
    worst = max(got.values(), key=lambda r: r["ppl"])
    assert worst["doc"] == 4


def test_buckets_are_exact_terciles(spark, docs_df):
    scored = lm.lm_perplexity(docs_df, "text", "doc_id")
    rows = lm.perplexity_buckets(scored).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    assert len(rows) == len([d for d in DOCS if d[1].strip()])


def test_min_count_prunes_bigrams(spark, docs_df):
    # with a high min_count every bigram falls back to unigrams: ppl must
    # change for docs whose bigrams repeat across the corpus
    full = {r["doc"]: r["ppl"] for r in lm.lm_perplexity(docs_df, "text", "doc_id").collect()}
    pruned = {
        r["doc"]: r["ppl"]
        for r in lm.lm_perplexity(docs_df, "text", "doc_id", min_count=100).collect()
    }
    ref = _ref_scores(DOCS, min_count=100)
    for i in pruned:
        assert pruned[i] == pytest.approx(ref[i][2], abs=1e-3)
    assert full != pruned


# ----------------------------------------------------------------------
# repeated-span removal (ops/dedup.py::remove_repeated_spans)
# ----------------------------------------------------------------------


def test_line_mode_removes_corpus_boilerplate(spark):
    from ckg_spark.ops.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "unique first article\nsubscribe to our newsletter\nmore unique text"),
            (2, "another story entirely\nsubscribe to our newsletter"),
            (3, "subscribe to our newsletter"),
            (4, "totally original content"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc"]: r
        for r in remove_repeated_spans(
            docs, "text", "doc_id", mode="lines", min_repeats=2
        ).collect()
    }
    assert out[1]["clean_text"] == "unique first article\nmore unique text"
    assert out[1]["n_removed"] == 1 and out[1]["n_spans"] == 3
    assert out[2]["clean_text"] == "another story entirely"
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 1
    assert out[4]["clean_text"] == "totally original content"
    assert out[4]["n_removed"] == 0


def test_token_window_mode_removes_shared_prefix_in_order(spark):
    from ckg_spark.ops.dedup import remove_repeated_spans

    shared = " ".join(f"w{i}" for i in range(8))  # exactly two 4-token windows
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma delta"),
            (2, shared + " epsilon zeta eta theta"),
            (3, "lone document with its own words here ok"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc"]: r
        for r in remove_repeated_spans(
            docs, "text", "doc_id", mode="token_windows", window=4, min_repeats=2
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    assert out[1]["n_spans"] == 3 and out[1]["n_removed"] == 2
    assert out[3]["n_removed"] == 0 and out[3]["n_spans"] == 2


def test_docs_with_no_qualifying_spans_survive(spark):
    """A doc that yields ZERO spans (empty/all-blank text) must still
    appear in the output — dropping it silently deletes the doc from any
    pipeline that joins on the result (curate's span stage does exactly
    that). Non-Latin text must SURVIVE WITH ITS TEXT: the tokenizer is
    Unicode (``[\\p{L}\\p{N}']``), so a CJK doc is a real token run, not
    an empty doc (the old ASCII class deleted every CJK document)."""
    from ckg_spark.ops.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "normal ascii words right here"),
            (2, "这是一个完全中文的文档没有拉丁字母"),  # one \p{L} run
            (3, ""),
            (4, "   \n   \n  "),
            (5, "zürich über straße naïve café words here"),  # accents kept
        ],
        "doc_id long, text string",
    )
    empties = {"token_windows": (3, 4), "lines": (3, 4)}
    for mode, zero_docs in empties.items():
        out = {
            r["doc"]: r
            for r in remove_repeated_spans(
                docs, "text", "doc_id", mode=mode, window=4, min_repeats=2
            ).collect()
        }
        assert set(out) == {1, 2, 3, 4, 5}, mode
        for d in zero_docs:
            assert out[d]["clean_text"] == "", (mode, d)
            assert out[d]["n_spans"] == 0 and out[d]["n_removed"] == 0, (mode, d)
        assert out[1]["n_spans"] > 0 and out[1]["n_removed"] == 0
        # the CJK doc keeps its text in BOTH modes now
        assert out[2]["clean_text"] == "这是一个完全中文的文档没有拉丁字母", mode
        assert out[2]["n_spans"] == 1 and out[2]["n_removed"] == 0, mode
        # accented words survive intact (lowercased), not mangled to
        # 'z rich ber stra e'
        assert "zürich" in out[5]["clean_text"] and "straße" in out[5]["clean_text"], mode
        assert "naïve" in out[5]["clean_text"] and "café" in out[5]["clean_text"], mode
