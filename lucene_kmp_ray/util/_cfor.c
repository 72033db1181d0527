/* Fused positional skip-read: masked FOR/PFor block decode + per-entry
 * position gather for positions_for_entries (index/reader.py).
 *
 * Semantics are EXACTLY the numpy path's (which remains the fallback and
 * the reference, fuzz-asserted by tests/test_cfor.py):
 *   1. decode only the 128-value blocks the caller's mask selects
 *      (little-endian bit-packed width-w values, PFor exceptions as
 *      (pos_u8, high_u8) pairs OR-ed in at << width);
 *   2. per selected entry [s,e), cumulative-sum its delta slice into
 *      absolute positions, concatenated in entry order.
 *
 * meta rows are block_stream_meta()'s (payload_start, width, n_exc,
 * payload_bytes, total_bytes).
 */
#include <stdint.h>
#include <string.h>

#define BLOCK_SIZE 128

static void decode_block(const uint8_t *mv, int64_t mvlen,
                         const int64_t *m /* meta row */, int64_t cnt,
                         int64_t *out) {
    int64_t pstart = m[0], w = m[1], ne = m[2], pbytes = m[3];
    if (w == 0) {
        memset(out, 0, (size_t)cnt * sizeof(int64_t));
    } else {
        const uint8_t *p = mv + pstart;
        /* values whose 8-byte little-endian window stays inside the
         * buffer decode via one unaligned load; the stream tail (and any
         * width > 57) falls back to byte assembly */
        int64_t L = mvlen - pstart - 8;  /* last byte offset with a full
                                            8-byte window in-buffer */
        int64_t safe;
        if (w > 57 || L < 0) {
            safe = 0;
        } else {
            safe = (8 * L + 7) / w + 1;  /* max i with (i*w)>>3 <= L, +1 */
            if (safe > cnt) safe = cnt;
        }
        uint64_t mask = (w >= 64) ? ~0ULL : ((1ULL << w) - 1);
        for (int64_t i = 0; i < safe; i++) {
            int64_t bito = i * w;
            uint64_t win;
            memcpy(&win, p + (bito >> 3), 8); /* little-endian host */
            out[i] = (int64_t)((win >> (bito & 7)) & mask);
        }
        for (int64_t i = safe; i < cnt; i++) {
            int64_t bito = i * w;
            int64_t byo = bito >> 3;
            int shift = (int)(bito & 7);
            /* up to 9 bytes may carry a 64-bit value at a bit offset */
            uint64_t win = 0;
            uint64_t hi9 = 0;
            int64_t avail = mvlen - (pstart + byo);
            int need = (int)((w + shift + 7) >> 3);
            if (need > (int)avail) need = (int)avail;
            for (int b = 0; b < need && b < 8; b++)
                win |= (uint64_t)p[byo + b] << (8 * b);
            if (need > 8) hi9 = (uint64_t)p[byo + 8];
            uint64_t v = win >> shift;
            if (shift && need > 8) v |= hi9 << (64 - shift);
            out[i] = (int64_t)(v & mask);
        }
    }
    const uint8_t *exc = mv + pstart + pbytes;
    for (int64_t k = 0; k < ne; k++) {
        int64_t pos = exc[2 * k];
        if (pos < cnt)
            out[pos] |= (int64_t)exc[2 * k + 1] << m[1];
    }
}

/* mask: uint8 per block (nonzero = decode).  scratch: caller-allocated
 * n-value workspace (unselected regions are never read).  out_flat:
 * sum(e-s) values.  Returns the number of values written. */
int64_t positions_select(const uint8_t *mv, int64_t mvlen,
                         const int64_t *meta, int64_t nblocks, int64_t n,
                         const uint8_t *mask,
                         const int64_t *s, const int64_t *e, int64_t nsel,
                         int64_t *scratch, int64_t *out_flat) {
    for (int64_t b = 0; b < nblocks; b++) {
        if (!mask[b]) continue;
        int64_t blk_lo = b * BLOCK_SIZE;
        int64_t cnt = (b == nblocks - 1) ? n - blk_lo : BLOCK_SIZE;
        decode_block(mv, mvlen, meta + 5 * b, cnt, scratch + blk_lo);
    }
    int64_t j = 0;
    for (int64_t k = 0; k < nsel; k++) {
        int64_t acc = 0;
        for (int64_t i = s[k]; i < e[k]; i++) {
            acc += scratch[i];
            out_flat[j++] = acc;
        }
    }
    return j;
}
