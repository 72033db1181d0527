"""Gopher repetition signals: brute-force parity on synthetic docs
(multi-line, heavy-repeat, empty, short) + gate thresholds."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.pipelines.gopher import (DUP_NS, GOPHER_THRESHOLDS,
                                             TOP_NS, gopher_batch)

DOCS = [
    "a b c a b c a b c",
    "line one\nline two\nline one\nline three",
    "x",
    "",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
    "same same same same same",
    "hello world\nhello world",
    "the quick brown fox jumps over the lazy dog",
    "dup dup\ndup dup\nuniq line\ndup dup",
]


def brute(text):
    res = {}
    lines = [ln for ln in text.split("\n") if ln != ""]
    tl = len(lines)
    c = Counter(lines)
    res["dup_line_frac"] = 1 - len(c) / tl if tl else 0.0
    lchars = sum(len(ln) for ln in lines)
    res["dup_line_char_frac"] = sum(
        (k - 1) * len(ln) for ln, k in c.items() if k > 1) / max(lchars, 1)
    words = [w for w in text.split(" ") if w != ""]
    tc = max(len(text), 1)
    for n in TOP_NS:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
        if grams:
            cc = Counter(grams)
            mx = max(cc.values())
            res[f"top_{n}gram_char_frac"] = max(
                k * len(g) for g, k in cc.items() if k == mx) / tc
        else:
            res[f"top_{n}gram_char_frac"] = 0.0
    for n in DUP_NS:
        grams = [tuple(words[i:i + n]) for i in range(len(words) - n + 1)]
        res[f"dup_{n}gram_frac"] = \
            (1 - len(set(grams)) / len(grams)) if grams else 0.0
    return res


@pytest.fixture(scope="module")
def signals():
    batch = pa.table({"doc_id": pa.array(range(len(DOCS)), pa.int64()),
                      "text": pa.array(DOCS, pa.string())})
    return gopher_batch(batch).to_pydict()


@pytest.mark.parametrize("i", range(len(DOCS)))
def test_signals_match_brute_force(signals, i):
    want = brute(DOCS[i])
    for k, v in want.items():
        assert signals[k][i] == pytest.approx(v, abs=1e-12), (i, k)


def test_batch_boundaries_independent():
    """Signals are per-doc: splitting the batch changes nothing."""
    full = gopher_batch(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string())})).to_pydict()
    for i, d in enumerate(DOCS):
        one = gopher_batch(pa.table({
            "doc_id": pa.array([i], pa.int64()),
            "text": pa.array([d], pa.string())})).to_pydict()
        for k in full:
            assert one[k][0] == full[k][i], (i, k)


def test_gate_thresholds():
    # "same same same same same": top-2gram 'same same' covers
    # 4*9/24 chars -> fails the 0.20 threshold
    batch = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["same same same same same"])})
    sig = gopher_batch(batch).to_pydict()
    assert sig["top_2gram_char_frac"][0] > GOPHER_THRESHOLDS[
        "top_2gram_char_frac"]
