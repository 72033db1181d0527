"""Corpus-scrub operators (C4 span scrub, chunking, SemDeDup) vs brute
force — the pure-Python single-process reference for each."""

import hashlib

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _tok(text):
    from lucene_kmp_ray.analysis.standard import tokenize
    return tokenize(text)


def test_c4_span_scrub_matches_brute(ray_session, corpus_texts):
    from lucene_kmp_ray.pipelines.scrub import SCRUB_WINDOW, c4_span_scrub
    got = c4_span_scrub(SF).to_pandas().set_index("doc_id").sort_index()

    w = SCRUB_WINDOW
    first = {}
    spans_per_doc = []
    for doc_id, text in enumerate(corpus_texts):
        toks = _tok(text)
        spans = [" ".join(toks[i * w:(i + 1) * w])
                 for i in range(len(toks) // w)]
        spans_per_doc.append(spans)
        for win_id, s in enumerate(spans):
            first.setdefault(s, (doc_id, win_id))
    assert len(got) == len(corpus_texts)
    total_scrubbed = 0
    for doc_id, spans in enumerate(spans_per_doc):
        n_scrubbed = sum(1 for win_id, s in enumerate(spans)
                         if first[s] != (doc_id, win_id))
        assert got.loc[doc_id, "n_spans"] == len(spans)
        assert got.loc[doc_id, "n_scrubbed"] == n_scrubbed
        total_scrubbed += n_scrubbed
    assert total_scrubbed > 0  # synthetic corpus repeats spans


def test_chunk_rows_cover_and_overlap():
    """Unit math on a crafted batch: chunk starts step by stride, the
    union of chunks covers every token, consecutive chunks overlap by
    chunk−stride, and a zero-token doc yields one empty chunk."""
    from lucene_kmp_ray.pipelines.scrub import _chunk_rows
    texts = ["w%d " % i for i in range(1)]  # placeholder, rebuilt below
    toks = ["t%03d" % i for i in range(130)]
    batch = pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "text": pa.array([" ".join(toks), "one two", ""], pa.string()),
    })
    out = _chunk_rows(batch, chunk=64, stride=48).to_pandas()
    d7 = out[out.doc_id == 7]
    # 130 tokens -> chunks at 0, 48, 96: lengths 64, 64, 34
    assert list(d7.chunk_id) == [0, 1, 2]
    assert list(d7.n_tokens) == [64, 64, 34]
    assert d7.chunk_md5.iloc[0] == hashlib.md5(
        " ".join(toks[:64]).encode()).hexdigest()
    assert d7.chunk_md5.iloc[2] == hashlib.md5(
        " ".join(toks[96:130]).encode()).hexdigest()
    d8 = out[out.doc_id == 8]
    assert list(d8.n_tokens) == [2]
    # empty text -> zero tokens -> one empty chunk
    d9 = out[out.doc_id == 9]
    assert list(d9.n_tokens) == [0]
    assert d9.chunk_md5.iloc[0] == hashlib.md5(b"").hexdigest()


def test_chunk_documents_matches_brute(ray_session, corpus_texts):
    from lucene_kmp_ray.pipelines.scrub import (CHUNK_STRIDE, CHUNK_TOKENS,
                                                chunk_documents)
    got = chunk_documents(SF).to_pandas().sort_values(
        ["doc_id", "chunk_id"]).reset_index(drop=True)
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    rows = []
    for doc_id, text in enumerate(corpus_texts):
        toks = _tok(text)
        n = len(toks)
        n_chunks = 1 if n <= c else 1 + -(-(n - c) // s)
        for ci in range(n_chunks):
            piece = toks[ci * s:ci * s + c]
            rows.append((doc_id, ci, len(piece),
                         hashlib.md5(" ".join(piece).encode()).hexdigest()))
    assert len(got) == len(rows)
    for (doc_id, ci, nt, md5), r in zip(rows, got.itertuples()):
        assert (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_md5) == \
            (doc_id, ci, nt, md5)


def test_semdedup_matches_brute(ray_session):
    import pyarrow.parquet as pq

    from lucene_kmp_ray.pipelines.ann import _planes
    from lucene_kmp_ray.pipelines.scrub import (SEM_N_PLANES, SEM_THRESHOLD,
                                                semdedup_pairs)
    got = semdedup_pairs(SF).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    planes = _planes(64)[:SEM_N_PLANES]
    bucket = ((mat @ planes.T) > 0) @ (1 << np.arange(SEM_N_PLANES))
    nn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    exp = []
    order = np.argsort(ids, kind="stable")
    for b in np.unique(bucket):
        sel = order[bucket[order] == b]
        g = nn[sel] @ nn[sel].T
        for j in range(1, len(sel)):
            hits = np.flatnonzero(g[j, :j] >= SEM_THRESHOLD)
            if len(hits):
                exp.append((ids[sel[j]], int(b), ids[sel[hits[0]]]))
    exp.sort()
    assert len(got) == len(exp) > 0
    for (vid, b, dof), r in zip(exp, got.itertuples()):
        assert (r.vec_id, r.bucket, r.dup_of) == (vid, b, dof)


def test_semdedup_bucket_cap_drops_oversized(ray_session):
    """A cap smaller than every bucket population yields zero dups (the
    over-cap guard path)."""
    from lucene_kmp_ray.pipelines.scrub import semdedup_pairs
    got = semdedup_pairs(SF, max_bucket=1).to_pandas()
    assert len(got) == 0


def test_bpe_token_counts_matches_brute(ray_session, corpus_texts):
    import re
    from collections import Counter

    from lucene_kmp_ray.pipelines.textstats import (BPE_PRETOKEN_PATTERN,
                                                    bpe_token_counts)
    got = bpe_token_counts(SF).to_pandas()
    rx = re.compile(BPE_PRETOKEN_PATTERN)
    exp = Counter()
    for text in corpus_texts:
        exp.update(rx.findall(text))
    assert dict(zip(got.token, got.n)) == dict(exp)
    # space-prefixed word pieces exist (the GPT-2 convention)
    assert any(t.startswith(" ") for t in got.token)


def test_url_dedup_matches_brute(ray_session):
    import re

    from lucene_kmp_ray.pipelines.dedup import _doc_rows, url_dedup
    got = url_dedup(SF).to_pandas().sort_values(
        "url_canon").reset_index(drop=True)
    n = _doc_rows(SF)
    groups = {}
    for d in range(n):
        raw = "%s://%s/doc/%d%s%s" % (
            "http" if d % 2 == 1 else "https",
            "www.example.com" if d % 3 == 0
            else ("EXAMPLE.com" if d % 11 == 0 else "example.com"),
            d % 397,
            "/" if d % 5 == 0 else "",
            "?utm_source=feed" if d % 7 == 0 else "")
        u = raw.lower()
        u = re.sub(r"^http://", "https://", u)
        u = re.sub(r"^https://www\.", "https://", u)
        u = re.sub(r"\?utm_[a-z_]+=[^&#]*$", "", u)
        u = re.sub(r"/$", "", u)
        lo, cnt = groups.get(u, (d, 0))
        groups[u] = (min(lo, d), cnt + 1)
    assert len(got) == len(groups)
    for r in got.itertuples():
        assert groups[r.url_canon] == (r.keep_doc_id, r.n_dups)
    assert (got.n_dups > 1).any()  # the variants really collide
