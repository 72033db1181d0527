"""UAX29URLEmailAnalyzer — the reference's URL+email-aware tokenizer
(``/root/reference/analysis/common/.../email/UAX29URLEmailAnalyzer.kt``,
``UAX29URLEmailTokenizerImpl.kt`` — a JFlex grammar layering <URL> and
<EMAIL> token types over the UAX#29 word rules).

Re-expressed as a PRE-PASS: a combined regex finds EMAIL / scheme URL /
no-scheme URL matches left-to-right; matched spans emit as single tokens,
the gaps tokenize through the shared StandardAnalyzer rules. This
pre-pass-first design reproduces the grammar's precedence cases naturally
— e.g. LUCENE-3880 "MAILTO:Test@Example.ORG" → ["mailto",
"test@example.org"] (the email claims its span; the leftover "MAILTO:"
word-tokenizes without a letter after the colon, so the MidLetter join
does not fire).

No-scheme URLs (``index.ph`` URL vs ``index.php`` ALPHANUM) hinge on the
IANA TLD list the JFlex grammar embeds: here any 2-letter label (the
ccTLD rule) plus the common gTLDs below. A TLD followed by a word char is
NOT a URL (``index.phα``, ``index2.ph９`` — conformance vectors from
TestUAX29URLEmailAnalyzer.kt asserted in tests). Deviations (documented):
the embedded gTLD subset vs IANA's full list, and trailing-punctuation
trimming on URL paths by character class rather than the full RFC 3986
grammar.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .standard import MAX_TOKEN_LENGTH, fold_case, tokenize

# common gTLDs (public IANA data, subset; 2-letter ccTLDs matched by rule)
GTLDS = ("com net org edu gov mil int info biz name pro aero asia cat "
         "coop jobs mobi museum post tel travel xxx arpa app dev xyz "
         "online site tech store blog cloud shop top club vip live news "
         "fun space icu website agency media digital today life world "
         "email group solutions guru").split()

_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
_TLD = rf"(?:{'|'.join(sorted(GTLDS, key=len, reverse=True))}|[A-Za-z]{{2}})"
# RFC 3986-ish path/query/fragment character classes; terminal char
# excludes sentence punctuation so "visit x.com/a." keeps the period out
_PCHAR = r"[-A-Za-z0-9._~%!$&'()*+,;=:@/]"
_PEND = r"[-A-Za-z0-9_~%$&'*+=@/]"

EMAIL_PATTERN = (r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~.\-]+@"
                 rf"(?:{_LABEL}\.)+[A-Za-z]{{2,}}")
SCHEME_URL_PATTERN = (r"[A-Za-z][A-Za-z0-9+.\-]*://"
                      r"[^\s<>\"\[\]]*[^\s<>\"\[\].,;:!?]")
NOSCHEME_URL_PATTERN = (rf"(?:{_LABEL}\.)+{_TLD}"
                        rf"(?::\d+)?"
                        rf"(?:/(?:{_PCHAR}*{_PEND})?)?"
                        rf"(?:\?[^\s<>\"#]*)?"
                        rf"(?:#[^\s<>\"]*)?"
                        r"(?!\w)")

_URL_EMAIL_RE = re.compile(
    f"(?:{EMAIL_PATTERN})|(?:{SCHEME_URL_PATTERN})"
    f"|(?:{NOSCHEME_URL_PATTERN})")


def _split_cap(tok: str) -> list[str]:
    if len(tok) <= MAX_TOKEN_LENGTH:
        return [tok]
    return [tok[i:i + MAX_TOKEN_LENGTH]
            for i in range(0, len(tok), MAX_TOKEN_LENGTH)]


class UAX29URLEmailAnalyzer:
    """URL/email pre-pass → standard word rules on the gaps → lowercase
    (the UAX29URLEmailAnalyzer chain: tokenizer + LowerCaseFilter with
    the empty default stop set)."""

    name = "uax29_url_email"

    def __call__(self, text: str) -> list[str]:
        text = text or ""
        out: list[str] = []
        last = 0
        for m in _URL_EMAIL_RE.finditer(text):
            if m.start() > last:
                out.extend(tokenize(text[last:m.start()]))
            out.extend(_split_cap(fold_case(m.group(0))))
            last = m.end()
        if last < len(text):
            out.extend(tokenize(text[last:]))
        return out

    def analyze_flat(self, texts):
        """Per-doc scalar path: the URL/email pre-pass is inherently
        sequential per text (matched spans interleave with word runs);
        URL-bearing fields are a small fraction of web-corpus bytes, and
        the gap tokenization reuses the shared vectorized kernels."""
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        for i, t in enumerate(texts):
            toks = self(t)
            doc_lengths[i] = len(toks)
            flat.extend(toks)
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64),
                           doc_lengths)
        starts = np.append(0, np.cumsum(doc_lengths))[:-1]
        positions = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, doc_lengths)
        return doc_lengths, pa.array(flat, pa.string()), doc_of, positions
