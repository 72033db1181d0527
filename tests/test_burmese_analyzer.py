"""BurmeseAnalyzer conformance: vectors from TestBurmeseAnalyzer.kt
plus generated-RE2 tokenizer parity fuzz."""

import random

from lucene_kmp_ray.analysis.burmese import (BurmeseAnalyzer,
                                             burmese_tokenize)


def test_reference_vectors():
    a = BurmeseAnalyzer()
    assert a("၁၂၃၄") == ["1234"]
    assert a("မြန်မာစာ") == ["မြန်", "မာ", "စာ"]
    # သူ/သည်/တွေ are stop words
    assert a("သူသည်စာအုပ်တွေဖတ်သည်") == ["စာ", "အုပ်",
                                                   "ဖတ်"]
    assert a("သူတို့က မြန်မာစာကို ဖတ်သည်") == [
        "မြန်", "မာ", "စာ", "ဖတ်"]


def test_tokenizer_quirks():
    # syllable break before a base unless virama precedes / asat follows
    assert burmese_tokenize("္ထ") == ["္ထ"]
    # Myanmar digit run at a run start is its own token
    assert burmese_tokenize("၁၂၃ က") == ["၁၂၃", "က"]
    # Latin run absorbs following Myanmar LETTERS, but a combining
    # mark (ြ, Mn) ends it and starts a Myanmar run (reference quirk)
    assert burmese_tokenize("abcမြန်") == ["abcမ", "ြန်"]


def test_sql_tokenizer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(111)
    pat = oracle._my_token_pattern()
    pre = oracle._my_pre_sql("t")
    mychars = [chr(c) for c in
               list(range(0x1000, 0x104A)) + [0x1039, 0x103A, 0x103B]]
    texts = ["မြန်မာစာ", "သူသည်စာအုပ်တွေဖတ်သည်",
             "abc123 မြန်မာ", "၁၂၃ က", "b၁ဦပဠ", "္ထ"]
    for _ in range(600):
        texts.append("".join(
            random.choice(mychars + list("ab 1."))
            for _ in range(random.randint(1, 12))))
    rows = duckdb.connect().execute(
        f"SELECT list_transform(regexp_extract_all({pre}, ?), "
        f"x -> lower(x)) FROM (SELECT unnest(?) AS t)",
        [pat, texts]).fetchall()
    for t, (got,) in zip(texts, rows):
        assert got == burmese_tokenize(t), repr(t)


def test_batch_call_parity():
    a = BurmeseAnalyzer()
    texts = ["သူသည်စာအုပ်တွေဖတ်သည်", "abc ၁၂၃", ""]
    nl, flat, doc_of, pos = a.analyze_flat(texts)
    per_doc = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), doc_of.tolist()):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
