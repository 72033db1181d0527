"""The fused C positional skip-read must agree exactly with the numpy
masked-decode + gather path (which remains the semantic reference) over
random posting shapes, widths and PFor exception patterns."""

import numpy as np
import pytest

from lucene_kmp_ray.util import forutil as fu
from lucene_kmp_ray.util.cfor import lib, positions_select


def _require_lib():
    if lib() is None:
        pytest.skip("no C compiler in environment")


def _numpy_reference(enc, n, mask, s, e):
    posd = fu.decode_blocks_masked(enc, n, mask)
    sel = (e - s).astype(np.int64)
    total = int(sel.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(sel)
    starts_out = ends - sel
    idx = np.arange(total, dtype=np.int64) - \
        np.repeat(starts_out, sel) + np.repeat(s, sel)
    deltas = posd[idx]
    flat = np.cumsum(deltas)
    carried = flat[starts_out] - deltas[starts_out]
    return flat - np.repeat(carried, sel)


@pytest.mark.parametrize("encoder", [fu.encode_blocks,
                                     fu.encode_blocks_pfor])
def test_cfor_fuzz_vs_numpy(encoder):
    _require_lib()
    rng = np.random.default_rng(13)
    for trial in range(300):
        n = int(rng.integers(1, 700))
        # mixed magnitudes: mostly small deltas, occasional large outliers
        # (PFor exception bait), some zero-heavy runs (width-0 blocks)
        style = trial % 3
        if style == 0:
            vals = rng.integers(0, 4, size=n)
        elif style == 1:
            vals = rng.integers(0, 50, size=n)
            out = rng.random(n) < 0.05
            vals[out] = rng.integers(1 << 10, 1 << 17, size=int(out.sum()))
        else:
            vals = rng.integers(0, 1 << int(rng.integers(1, 30)), size=n)
        vals = vals.astype(np.int64)
        enc = encoder(vals)
        # random NON-EMPTY entry ranges over the occurrence stream (the
        # production contract: every selected posting entry has freq >= 1)
        n_entries = int(rng.integers(1, 12))
        bounds = np.sort(rng.integers(0, n + 1, size=2 * n_entries))
        s, e = bounds[0::2].astype(np.int64), bounds[1::2].astype(np.int64)
        keep = e > s
        s, e = s[keep], e[keep]
        if len(s) == 0:
            s, e = np.array([0], np.int64), np.array([n], np.int64)
        nblocks = (n + fu.BLOCK_SIZE - 1) // fu.BLOCK_SIZE
        # the caller's mask: blocks any [s,e) touches (plus random extras
        # to prove over-decoding is harmless)
        mask = np.zeros(nblocks, dtype=bool)
        for a, b in zip(s, e):
            if b > a:
                mask[a // fu.BLOCK_SIZE:(b - 1) // fu.BLOCK_SIZE + 1] = True
        mask |= rng.random(nblocks) < 0.2
        want = _numpy_reference(enc, n, mask, s, e)
        pm = fu.block_stream_meta(enc, n)
        got = positions_select(enc, pm, n, mask, s, e,
                               int((e - s).sum()))
        assert got is not None
        assert np.array_equal(got, want), (trial, n, s.tolist(), e.tolist())


def test_cfor_wide_width_tail():
    """Widths > 57 and buffer-tail values exercise the byte-assembly
    fallback inside the C decoder."""
    _require_lib()
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 62, size=200).astype(np.int64)
    enc = fu.encode_blocks(vals)
    n = len(vals)
    nblocks = (n + fu.BLOCK_SIZE - 1) // fu.BLOCK_SIZE
    mask = np.ones(nblocks, dtype=bool)
    s = np.array([0, 120, n - 1], np.int64)
    e = np.array([5, 140, n], np.int64)
    want = _numpy_reference(enc, n, mask, s, e)
    got = positions_select(enc, fu.block_stream_meta(enc, n), n, mask,
                           s, e, int((e - s).sum()))
    assert np.array_equal(got, want)
