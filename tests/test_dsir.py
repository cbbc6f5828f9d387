"""DSIR importance resampling: independent pure-python reference +
hashed-bucket path agreement + selection determinism."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from ckg_spark.ops import dsir

RAW = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "stock prices rallied as markets opened higher today"),
    (3, "the fox and the dog are friends"),
    (4, "buy cheap pills online casino bonus click here"),
    (5, "a quick brown dog jumps over a lazy fox"),
    (6, "casino casino bonus bonus click click spam spam"),
]
TARGET = [
    (101, "the quick brown fox jumps over the lazy dog"),
    (102, "the dog chased the fox through the brown field"),
]


def _feats(text):
    tk = re.findall(r"[a-z0-9']+", text.lower())
    return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]


def _ref_weights(raw, target, s=1.0):
    rc, tc = Counter(), Counter()
    for _i, t in raw:
        rc.update(_feats(t))
    for _i, t in target:
        tc.update(_feats(t))
    vocab = set(rc) | set(tc)
    v, tr, tt = len(vocab), sum(rc.values()), sum(tc.values())
    lr = {
        f: math.log((tc[f] + s) / (tt + s * v)) - math.log((rc[f] + s) / (tr + s * v))
        for f in vocab
    }
    out = {}
    for i, t in raw:
        fs = _feats(t)
        out[i] = (len(fs), sum(lr[f] for f in fs))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_weights_match_reference(spark, frames):
    raw, target = frames
    got = {
        r["doc"]: r
        for r in dsir.importance_weights(raw, target, "text", "doc_id").collect()
    }
    ref = _ref_weights(RAW, TARGET)
    assert set(got) == set(ref)
    for i, (n, lw) in ref.items():
        assert got[i]["n_feats"] == n
        assert got[i]["log_w"] == pytest.approx(lw, abs=1e-9)
    # semantic direction: target-like docs outrank spam
    assert got[1]["log_w"] > got[4]["log_w"]
    assert got[3]["log_w"] > got[6]["log_w"]


def test_hashed_buckets_agree_with_exact_at_large_b(spark, frames):
    raw, target = frames
    exact = {
        r["doc"]: r["log_w"]
        for r in dsir.importance_weights(raw, target, "text", "doc_id").collect()
    }
    # vocabulary << buckets: collisions are (almost surely) absent, but the
    # smoothing denominator uses V=n_buckets, so RANKS agree, values differ
    hashed = {
        r["doc"]: r["log_w"]
        for r in dsir.importance_weights(
            raw, target, "text", "doc_id", n_buckets=1 << 20
        ).collect()
    }
    rank = lambda d: [k for k, _ in sorted(d.items(), key=lambda kv: -kv[1])]
    assert rank(exact) == rank(hashed)


def test_select_is_deterministic_and_weighted(spark, frames):
    raw, target = frames
    w = dsir.importance_weights(raw, target, "text", "doc_id")
    sel1 = [r["doc"] for r in dsir.dsir_select(w, k=3).collect()]
    sel2 = [
        r["doc"]
        for r in dsir.dsir_select(w.repartition(7), k=3).collect()
    ]
    assert sel1 == sel2  # stable under repartitioning
    # noiseless top-k is exactly the argmax docs
    top = [r["doc"] for r in dsir.dsir_select(w, k=2, noisy=False).collect()]
    ref = _ref_weights(RAW, TARGET)
    want = sorted(ref, key=lambda i: (-ref[i][1], i))[:2]
    assert top == want


def test_target_may_be_text_only(spark, frames):
    """The documented dsir_target input is a text-only corpus — the target
    side only ever feeds per-feature counts, so an id column there must
    not be required, and weights must match the with-ids result exactly."""
    raw, target = frames
    text_only = target.select("text")
    got = {
        r["doc"]: (r["n_feats"], r["log_w"])
        for r in dsir.importance_weights(raw, text_only, "text", "doc_id").collect()
    }
    ref = {
        r["doc"]: (r["n_feats"], r["log_w"])
        for r in dsir.importance_weights(raw, target, "text", "doc_id").collect()
    }
    assert got == ref
