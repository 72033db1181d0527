"""PII scrubbing: redaction order, counts, and RE2/re dialect parity."""

import re

import pyarrow as pa

from lucene_kmp_ray.pipelines.pii import (EMAIL_RE, IPV4_RE, PHONE_RE,
                                          PII_STAGES, pii_scrub_batch)


def test_scrub_and_counts():
    docs = [
        "contact bob@example.com or alice.smith+x@mail.co.uk now",
        "server at 192.168.0.1 and 10.0.0.255 responded",
        "call +1 (555) 123-4567 today",
        "no pii here",
        "mixed: a@b.io from 8.8.8.8 dial 555-1234-999",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
    out = pii_scrub_batch(batch).to_pydict()
    assert out["n_emails"] == [2, 0, 0, 0, 1]
    assert out["n_ips"] == [0, 2, 0, 0, 1]
    assert out["n_phones"] == [0, 0, 1, 0, 1]
    assert out["clean_text"][0] == "contact <EMAIL> or <EMAIL> now"
    assert out["clean_text"][1] == "server at <IP> and <IP> responded"
    assert "<PHONE>" in out["clean_text"][2]
    assert out["clean_text"][3] == "no pii here"
    assert out["clean_text"][4] == "mixed: <EMAIL> from <IP> dial <PHONE>"


def test_sequential_order_prevents_double_redaction():
    # an email containing digits+dots must not later count as IP/phone
    batch = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["x 12.34.56.78a@y.com y"])})
    out = pii_scrub_batch(batch).to_pydict()
    assert out["n_emails"] == [1]
    assert out["n_ips"] == [0]
    assert out["clean_text"] == ["x <EMAIL> y"]


def test_patterns_re_compatible():
    # the same strings must compile in Python re (engine-side unit use)
    for pat, _ in PII_STAGES:
        re.compile(pat)
    assert re.fullmatch(EMAIL_RE, "a.b-c_d%e+f@host-1.example.org")
    assert re.search(IPV4_RE, "ip=255.255.255.255.")
    assert re.search(PHONE_RE, "+44 20 7946 0958")
