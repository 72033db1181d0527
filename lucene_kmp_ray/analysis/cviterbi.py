"""On-demand compiled C core for the kuromoji lattice tokenizer.

``_cviterbi.c`` mirrors the pure-Python lattice in ``japanese.py``
(tokenize / _backtrace / _prune_and_rescore) for the
no-user-dictionary configuration: the full forward scan (lexicon-trie
dictionary matches + unknown-word grouping), Viterbi relaxation, and
the search-mode decompound backtrace.  This module compiles it once
per source hash with the system C compiler (``cc -O2 -shared -fPIC``)
into a cached shared object under the temp dir, and exposes ``lib()``
returning the loaded library or ``None`` when compilation is
impossible (no compiler, read-only tmp, …) — callers then fall back to
the Python lattice, which remains the semantic reference.

``build_trie`` flattens a ``surface -> [word_id]`` mapping into the
static arrays the C scan walks (per-node sorted child arrays + word-id
lists, binary-searched per character).

Exact equivalence Python-vs-C is asserted by
``tests/test_cviterbi.py`` (reference vectors + randomized fuzz).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_cviterbi.c")
_CACHED: "ctypes.CDLL | None | bool" = False  # False = not attempted yet


def _compile() -> "ctypes.CDLL | None":
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = os.path.join(tempfile.gettempdir(), f"lkr_cviterbi_{tag}.so")
    if not os.path.exists(so):
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: concurrent actors race safely
    lib = ctypes.CDLL(so)
    # raw-address (void*) signature: pointers are passed as the ints
    # from ndarray.ctypes.data — no per-call ctypes casts in the hot path
    vp = ctypes.c_void_p
    lib.viterbi_analyze.restype = ctypes.c_int64
    lib.viterbi_analyze.argtypes = (
        [ctypes.c_int32]            # n
        + [vp] * 4                  # cp, cls, punct, kanji
        + [vp] * 7                  # trie (children + wids)
        + [vp] * 3                  # lex left/right/cost
        + [vp] * 3                  # unk off/left/cost
        + [vp] * 2                  # invoke, group
        + [vp, ctypes.c_int32]      # conn, conn_dim
        + [ctypes.c_int32]          # search_mode
        + [vp] * 4                  # out arrays
    )
    return lib


def lib() -> "ctypes.CDLL | None":
    """The compiled lattice core, or None when unavailable."""
    global _CACHED
    if _CACHED is False:
        try:
            _CACHED = _compile()
        except Exception:
            _CACHED = None
    return _CACHED


def build_trie(surfaces: "dict[str, list[int]]"):
    """Flatten ``surface -> [word_id]`` into the C scan's static trie
    arrays: (child_start, child_count, child_char, child_node,
    wids_start, wids_count, wid_list) — children sorted by codepoint
    per node, word ids kept in lexicon order."""
    nodes: list[tuple[dict, list]] = [({}, [])]
    for surf, wids in surfaces.items():
        cur = 0
        for ch in surf:
            cp = ord(ch)
            nxt = nodes[cur][0].get(cp)
            if nxt is None:
                nxt = len(nodes)
                nodes[cur][0][cp] = nxt
                nodes.append(({}, []))
            cur = nxt
        nodes[cur][1].extend(wids)
    child_start, child_count, child_char, child_node = [], [], [], []
    wids_start, wids_count, wid_list = [], [], []
    for children, wl in nodes:
        child_start.append(len(child_char))
        child_count.append(len(children))
        for cp in sorted(children):
            child_char.append(cp)
            child_node.append(children[cp])
        wids_start.append(len(wid_list))
        wids_count.append(len(wl))
        wid_list.extend(wl)
    return (np.array(child_start, dtype=np.int32),
            np.array(child_count, dtype=np.int32),
            np.array(child_char, dtype=np.uint32),
            np.array(child_node, dtype=np.int32),
            np.array(wids_start, dtype=np.int32),
            np.array(wids_count, dtype=np.int32),
            np.array(wid_list, dtype=np.int32))


_PUNCT_TABLE: "np.ndarray | None" = None


def punct_table() -> np.ndarray:
    """uint8[65536] BMP punctuation flags (same JDK category set as
    japanese._is_punct), built once per process."""
    global _PUNCT_TABLE
    if _PUNCT_TABLE is None:
        import unicodedata
        cats = frozenset([
            "Zs", "Zl", "Zp", "Cc", "Cf", "Pd", "Ps", "Pe", "Pc", "Po",
            "Sm", "Sc", "Sk", "So", "Pi", "Pf",
        ])
        _PUNCT_TABLE = np.fromiter(
            (unicodedata.category(chr(i)) in cats for i in range(0x10000)),
            dtype=np.uint8, count=0x10000)
    return _PUNCT_TABLE
