/* Native Gorilla codec kernels (v1, v2, v2+DifferentialFCM).
 *
 * Bit-exact mirror of the streaming reference classes in stream.py, which
 * themselves mirror the published format of burmanm/gorilla-tsc
 * (GorillaCompressor.java:28-160, GorillaDecompressor.java:23-127,
 * ValueCompressor.java:27-91, ValueDecompressor.java:26-54,
 * Compressor.java:24-181, Decompressor.java:22-131,
 * predictors/DifferentialFCM.java:23-46).  Compiled on demand with the
 * system cc via ctypes (see native.py); every function is also available as
 * a pure-Python fallback, and equivalence is enforced by tests.
 *
 * Word layout: MSB-first bits in big-endian-ordered 64-bit words
 * (LongArrayOutput.java:115-145).  All decode entry points take the word
 * array, its length, and a point capacity; they return the number of points
 * written, or -1 on malformed input (reads past the word array).
 */

#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;

/* ---------------- bit reader (position-based, branch-light) ------------- */

typedef struct {
    const uint64_t *w;
    int64_t nw;
    int64_t pos;      /* global bit position */
} BR;

static inline uint64_t br_peek(BR *r, int k) {
    int64_t wi = r->pos >> 6;
    int off = (int)(r->pos & 63);
    uint64_t hi = wi < r->nw ? r->w[wi] : 0;
    uint64_t lo = wi + 1 < r->nw ? r->w[wi + 1] : 0;
    u128 pair = ((u128)hi << 64) | lo;
    uint64_t v = (uint64_t)(pair >> (128 - off - k));
    return k == 64 ? v : (v & ((1ULL << k) - 1));
}

static inline uint64_t br_get(BR *r, int k) {
    uint64_t v = br_peek(r, k);
    r->pos += k;
    return v;
}

/* ---------------- bit writer (LongArrayOutput semantics) ----------------- */

typedef struct {
    uint64_t *w;
    int64_t n;        /* flushed full words */
    int64_t cap;
    uint64_t cur;     /* partially filled word (lB) */
    int left;         /* bits free in cur */
    int overflow;
} BW;

static inline void bw_flip(BW *b) {
    if (b->n >= b->cap) { b->overflow = 1; return; }
    b->w[b->n++] = b->cur;
    b->cur = 0;
    b->left = 64;
}

static inline void bw_put(BW *b, uint64_t v, int bits) {
    if (bits < 64) v &= (1ULL << bits) - 1;
    if (bits <= b->left) {
        b->cur |= (b->left - bits) ? (v << (b->left - bits)) : v;
        b->left -= bits;
        if (b->left == 0) bw_flip(b);
    } else {
        int first = bits - b->left;            /* 1..63 */
        b->cur |= v >> first;
        bw_flip(b);
        b->cur = v << (64 - first);
        b->left = 64 - first;
    }
}

static inline void bw_bit(BW *b, int set) {
    if (set) b->cur |= 1ULL << (b->left - 1);
    b->left -= 1;
    if (b->left == 0) bw_flip(b);
}

/* close + getLongArray: append partial word, then one fresh zero word */
static inline int64_t bw_close_words(BW *b) {
    bw_flip(b);                 /* flush() */
    if (b->n >= b->cap) { b->overflow = 1; return -1; }
    b->w[b->n++] = 0;           /* getLongArray's trailing snapshot word */
    return b->overflow ? -1 : b->n;
}

#define FIRST_DELTA_BITS 27
#define EMPTY_SENTINEL ((1u << 27) - 1)

static inline int32_t zz32_dec(uint32_t n) {
    return (int32_t)((n >> 1) ^ (~(n & 1) + 1));
}

static inline uint32_t zz32_enc(int32_t n) {
    return ((uint32_t)n << 1) ^ (uint32_t)(n >> 31);
}

/* ===================== v2 decode (LastValue predictor) =================== */

int64_t gtsc_decode_v2(const uint64_t *words, int64_t nw, int64_t max_pts,
                       int64_t *out_ts, uint64_t *out_v)
{
    BR r = {words, nw, 0};
    int64_t limit = nw * 64;
    if (max_pts <= 0) return 0;
    int64_t block_ts = (int64_t)br_get(&r, 64);
    uint64_t fd = br_get(&r, FIRST_DELTA_BITS);
    if (fd == EMPTY_SENTINEL) return 0;
    uint64_t sval = br_get(&r, 64);
    int64_t sdelta = (int64_t)fd;   /* long storedDelta in the v2 decoder */
    int64_t sts = block_ts + sdelta;
    if (r.pos > limit) return -1;
    int64_t cnt = 0;
    out_ts[cnt] = sts; out_v[cnt] = sval; cnt++;

    int lz = 0, tz = 0, sig = 64;   /* window; sig=64 mirrors the initial
                                       Integer.MAX_VALUE lz sentinel read */
    int have_window = 0;
    while (cnt < max_pts) {
        if (r.pos >= limit) return -1;
        /* timestamp control: up to 4 bits, stop at first clear bit */
        uint64_t t4 = br_peek(&r, 4);
        if (!(t4 & 8)) {
            r.pos += 1;                       /* '0': dod == 0 */
        } else {
            uint64_t dd;
            if (!(t4 & 4))      { r.pos += 2; dd = br_get(&r, 7);  }
            else if (!(t4 & 2)) { r.pos += 3; dd = br_get(&r, 9);  }
            else if (!(t4 & 1)) { r.pos += 4; dd = br_get(&r, 12); }
            else {
                r.pos += 4; dd = br_get(&r, 32);
                if (dd == 0xFFFFFFFFULL) break;   /* EOF marker */
            }
            int32_t dod = zz32_dec((uint32_t)(dd + 1));
            sdelta += dod;
        }
        sts += sdelta;
        /* value: '0' repeat | '10' existing window | '11' new window */
        uint64_t v2 = br_peek(&r, 2);
        if (v2 & 2) {
            if (v2 & 1) {
                r.pos += 2;
                uint64_t hdr = br_get(&r, 12);
                lz = (int)(hdr >> 6);
                sig = (int)(hdr & 63) + 1;
                tz = 64 - sig - lz;
                if (tz < 0) return -1;  /* corrupt header: lz+sig > 64
                                           (negative shift is UB) */
                have_window = 1;
            } else {
                r.pos += 2;
                if (!have_window) { sig = 64; tz = 0; }
            }
            uint64_t bits = br_get(&r, sig);
            sval ^= bits << tz;
        } else {
            r.pos += 1;
        }
        if (r.pos > limit) return -1;
        out_ts[cnt] = sts; out_v[cnt] = sval; cnt++;
    }
    return cnt;
}

/* ===================== v1 decode (Decompressor.java) ===================== */

int64_t gtsc_decode_v1(const uint64_t *words, int64_t nw, int64_t max_pts,
                       int64_t *out_ts, uint64_t *out_v)
{
    BR r = {words, nw, 0};
    int64_t limit = nw * 64;
    if (max_pts <= 0) return 0;
    int64_t block_ts = (int64_t)br_get(&r, 64);
    uint64_t fd = br_get(&r, FIRST_DELTA_BITS);
    if (fd == EMPTY_SENTINEL) return 0;
    uint64_t sval = br_get(&r, 64);
    int64_t sdelta = (int64_t)fd;
    int64_t sts = block_ts + sdelta;
    if (r.pos > limit) return -1;
    int64_t cnt = 0;
    out_ts[cnt] = sts; out_v[cnt] = sval; cnt++;

    int lz = 0, tz = 0, sigbits = 64;
    int have_window = 0;
    while (cnt < max_pts) {
        if (r.pos >= limit) return -1;
        uint64_t t4 = br_peek(&r, 4);
        if (!(t4 & 8)) {
            r.pos += 1;
        } else {
            int64_t dod;
            int nb;
            if (!(t4 & 4))      { r.pos += 2; nb = 7;  }
            else if (!(t4 & 2)) { r.pos += 3; nb = 9;  }
            else if (!(t4 & 1)) { r.pos += 4; nb = 12; }
            else                { r.pos += 4; nb = 32; }
            uint64_t dd = br_get(&r, nb);
            if (nb == 32) {
                if (dd == 0xFFFFFFFFULL) break;
                dod = (int32_t)dd;
            } else {
                /* strictly-greater sign fix (Decompressor.java:96-101) */
                dod = (int64_t)dd;
                if (dd > (1ULL << (nb - 1))) dod -= (int64_t)1 << nb;
            }
            sdelta += dod;
        }
        sts += sdelta;
        uint64_t b1 = br_get(&r, 1);
        if (b1) {
            uint64_t b2 = br_get(&r, 1);
            if (b2) {
                lz = (int)br_get(&r, 5);
                int sig = (int)br_get(&r, 6);
                if (sig == 0) sig = 64;      /* "0 means 64" */
                tz = 64 - sig - lz;
                if (tz < 0) return -1;  /* corrupt header: lz+sig > 64 */
                sigbits = 64 - lz - tz;
                have_window = 1;
            } else if (!have_window) {
                sigbits = 64; tz = 0;
            }
            uint64_t bits = br_get(&r, sigbits);
            sval ^= bits << tz;
        }
        if (r.pos > limit) return -1;
        out_ts[cnt] = sts; out_v[cnt] = sval; cnt++;
    }
    return cnt;
}

/* ================= DifferentialFCM predictor (v2 payload) ================ */

typedef struct {
    uint64_t *table;
    uint32_t mask;
    uint64_t last_value;
    uint32_t last_hash;
} DFCM;

static inline void dfcm_update(DFCM *p, uint64_t value) {
    uint64_t delta = value - p->last_value;
    p->table[p->last_hash] = delta;
    p->last_hash = (uint32_t)(((p->last_hash << 5) ^
                               (uint64_t)(((int64_t)delta) >> 50)) & p->mask);
    p->last_value = value;
}

static inline uint64_t dfcm_predict(DFCM *p) {
    return p->table[p->last_hash] + p->last_value;
}

/* table_size → power-of-two table length (DifferentialFCM.java ctor) */
static inline uint32_t dfcm_len(int64_t size) {
    uint64_t s = (uint64_t)(size - 1);
    int bl = 0;
    while (s >> bl) bl++;
    return (uint32_t)1 << bl;
}

int64_t gtsc_decode_v2_dfcm(const uint64_t *words, int64_t nw,
                            int64_t max_pts, int64_t table_size,
                            uint64_t *scratch_table, int64_t scratch_len,
                            int64_t *out_ts, uint64_t *out_v)
{
    BR r = {words, nw, 0};
    int64_t limit = nw * 64;
    if (max_pts <= 0) return 0;
    uint32_t tlen = dfcm_len(table_size);
    if ((int64_t)tlen > scratch_len) return -2;
    memset(scratch_table, 0, tlen * sizeof(uint64_t));
    DFCM p = {scratch_table, tlen - 1, 0, 0};

    int64_t block_ts = (int64_t)br_get(&r, 64);
    uint64_t fd = br_get(&r, FIRST_DELTA_BITS);
    if (fd == EMPTY_SENTINEL) return 0;
    uint64_t sval = br_get(&r, 64);
    dfcm_update(&p, sval);                    /* readFirst updates */
    int64_t sdelta = (int64_t)fd;
    int64_t sts = block_ts + sdelta;
    if (r.pos > limit) return -1;
    int64_t cnt = 0;
    out_ts[cnt] = sts; out_v[cnt] = sval; cnt++;

    int lz = 0, tz = 0, sig = 64;
    int have_window = 0;
    while (cnt < max_pts) {
        if (r.pos >= limit) return -1;
        uint64_t t4 = br_peek(&r, 4);
        if (!(t4 & 8)) {
            r.pos += 1;
        } else {
            uint64_t dd;
            if (!(t4 & 4))      { r.pos += 2; dd = br_get(&r, 7);  }
            else if (!(t4 & 2)) { r.pos += 3; dd = br_get(&r, 9);  }
            else if (!(t4 & 1)) { r.pos += 4; dd = br_get(&r, 12); }
            else {
                r.pos += 4; dd = br_get(&r, 32);
                if (dd == 0xFFFFFFFFULL) break;
            }
            int32_t dod = zz32_dec((uint32_t)(dd + 1));
            sdelta += dod;
        }
        sts += sdelta;
        uint64_t v2 = br_peek(&r, 2);
        if (v2 & 2) {
            if (v2 & 1) {
                r.pos += 2;
                uint64_t hdr = br_get(&r, 12);
                lz = (int)(hdr >> 6);
                sig = (int)(hdr & 63) + 1;
                tz = 64 - sig - lz;
                if (tz < 0) return -1;  /* corrupt header: lz+sig > 64
                                           (negative shift is UB) */
                have_window = 1;
            } else {
                r.pos += 2;
                if (!have_window) { sig = 64; tz = 0; }
            }
            uint64_t bits = br_get(&r, sig);
            uint64_t value = dfcm_predict(&p) ^ (bits << tz);
            dfcm_update(&p, value);
            sval = value;
        } else {
            r.pos += 1;
            sval = dfcm_predict(&p);          /* no update: the replicated
                                                 ValueDecompressor.java:53
                                                 asymmetry */
        }
        if (r.pos > limit) return -1;
        out_ts[cnt] = sts; out_v[cnt] = sval; cnt++;
    }
    return cnt;
}

/* ===================== v2 encode (LastValue predictor) =================== */

static inline void enc_ts_v2(BW *b, int64_t *sts, int32_t *sdelta,
                             int64_t timestamp) {
    int32_t new_delta = (int32_t)(timestamp - *sts);
    int32_t dod = new_delta - *sdelta;
    if (dod == 0) {
        bw_bit(b, 0);
    } else {
        uint32_t z = zz32_enc(dod) - 1;
        int br = 32 - (z ? __builtin_clz(z) : 32);
        if (br >= 1 && br <= 7)       bw_put(b, z | (0x02u << 7), 9);
        else if (br >= 8 && br <= 9)  bw_put(b, z | (0x06u << 9), 12);
        else if (br >= 10 && br <= 12) bw_put(b, z | (0x0Eu << 12), 16);
        else { bw_put(b, 0x0F, 4); bw_put(b, z, 32); }
        *sdelta = new_delta;
    }
    *sts = timestamp;
}

/* shared value-window encoder (ValueCompressor.java:32-91); diff is the
 * predictor XOR */
typedef struct { int lz, tz; int have; } VWin;

static inline void enc_val_xor(BW *b, VWin *wn, uint64_t diff) {
    if (diff == 0) { bw_bit(b, 0); return; }
    int lz = __builtin_clzll(diff);
    int tz = __builtin_ctzll(diff);
    bw_bit(b, 1);
    if (wn->have && lz >= wn->lz && tz >= wn->tz) {
        bw_bit(b, 0);
        int sig = 64 - wn->lz - wn->tz;
        bw_put(b, diff >> wn->tz, sig);
    } else {
        bw_bit(b, 1);
        int sig = 64 - lz - tz;
        bw_put(b, (uint64_t)lz, 6);
        bw_put(b, (uint64_t)(sig - 1), 6);
        bw_put(b, diff >> tz, sig);
        wn->lz = lz; wn->tz = tz; wn->have = 1;
    }
}

int64_t gtsc_encode_v2(int64_t block_ts, const int64_t *ts,
                       const uint64_t *vals, int64_t n, int closed,
                       uint64_t *out_words, int64_t cap,
                       int64_t *out_total_bits)
{
    BW b = {out_words, 0, cap, 0, 64, 0};
    bw_put(&b, (uint64_t)block_ts, 64);
    if (n == 0) {
        /* empty block: header + EOF only — the EOF marker's first 27 set
         * bits double as the empty-block sentinel (vectorized.py:227-230,
         * GorillaDecompressor.java:65) */
        bw_put(&b, 0x0F, 4);
        bw_put(&b, 0xFFFFFFFFULL, 32);
        bw_bit(&b, 0);
        int64_t tb = b.n * 64 + (64 - b.left);
        *out_total_bits = tb;
        if (closed) return bw_close_words(&b);
        if (b.n >= b.cap) return -1;
        out_words[b.n] = b.cur;
        return b.overflow ? -1 : b.n + 1;
    } else {
        int32_t sdelta = (int32_t)(ts[0] - block_ts);
        int64_t sts = ts[0];
        bw_put(&b, (uint32_t)sdelta, FIRST_DELTA_BITS);
        bw_put(&b, vals[0], 64);
        uint64_t sval = vals[0];
        VWin wn = {0, 0, 0};
        for (int64_t i = 1; i < n; i++) {
            enc_ts_v2(&b, &sts, &sdelta, ts[i]);
            enc_val_xor(&b, &wn, sval ^ vals[i]);
            sval = vals[i];
            if (b.overflow) return -1;
        }
    }
    int64_t total_bits = b.n * 64 + (64 - b.left);
    if (closed) {
        bw_put(&b, 0x0F, 4);
        bw_put(&b, 0xFFFFFFFFULL, 32);
        bw_bit(&b, 0);
        total_bits += 37;
        *out_total_bits = total_bits;
        return bw_close_words(&b);
    }
    *out_total_bits = total_bits;
    /* snapshot: flushed words + current partial word */
    if (b.n >= b.cap) return -1;
    out_words[b.n] = b.cur;
    return b.overflow ? -1 : b.n + 1;
}

int64_t gtsc_encode_v2_dfcm(int64_t block_ts, const int64_t *ts,
                            const uint64_t *vals, int64_t n,
                            int64_t table_size, uint64_t *scratch_table,
                            int64_t scratch_len, int closed,
                            uint64_t *out_words, int64_t cap,
                            int64_t *out_total_bits)
{
    BW b = {out_words, 0, cap, 0, 64, 0};
    uint32_t tlen = dfcm_len(table_size);
    if ((int64_t)tlen > scratch_len) return -2;
    memset(scratch_table, 0, tlen * sizeof(uint64_t));
    DFCM p = {scratch_table, tlen - 1, 0, 0};
    bw_put(&b, (uint64_t)block_ts, 64);
    if (n == 0) {
        /* empty block: header + EOF only — the EOF marker's first 27 set
         * bits double as the empty-block sentinel (vectorized.py:227-230,
         * GorillaDecompressor.java:65) */
        bw_put(&b, 0x0F, 4);
        bw_put(&b, 0xFFFFFFFFULL, 32);
        bw_bit(&b, 0);
        int64_t tb = b.n * 64 + (64 - b.left);
        *out_total_bits = tb;
        if (closed) return bw_close_words(&b);
        if (b.n >= b.cap) return -1;
        out_words[b.n] = b.cur;
        return b.overflow ? -1 : b.n + 1;
    } else {
        int32_t sdelta = (int32_t)(ts[0] - block_ts);
        int64_t sts = ts[0];
        bw_put(&b, (uint32_t)sdelta, FIRST_DELTA_BITS);
        dfcm_update(&p, vals[0]);             /* writeFirst updates */
        bw_put(&b, vals[0], 64);
        VWin wn = {0, 0, 0};
        for (int64_t i = 1; i < n; i++) {
            enc_ts_v2(&b, &sts, &sdelta, ts[i]);
            uint64_t diff = dfcm_predict(&p) ^ vals[i];
            dfcm_update(&p, vals[i]);         /* encoder always updates */
            enc_val_xor(&b, &wn, diff);
            if (b.overflow) return -1;
        }
    }
    int64_t total_bits = b.n * 64 + (64 - b.left);
    if (closed) {
        bw_put(&b, 0x0F, 4);
        bw_put(&b, 0xFFFFFFFFULL, 32);
        bw_bit(&b, 0);
        total_bits += 37;
        *out_total_bits = total_bits;
        return bw_close_words(&b);
    }
    *out_total_bits = total_bits;
    if (b.n >= b.cap) return -1;
    out_words[b.n] = b.cur;
    return b.overflow ? -1 : b.n + 1;
}

/* ===================== v1 encode (Compressor.java) ======================= */

int64_t gtsc_encode_v1(int64_t block_ts, const int64_t *ts,
                       const uint64_t *vals, int64_t n, int closed,
                       uint64_t *out_words, int64_t cap,
                       int64_t *out_total_bits)
{
    BW b = {out_words, 0, cap, 0, 64, 0};
    bw_put(&b, (uint64_t)block_ts, 64);
    if (n == 0) {
        /* empty block: header + EOF only — the EOF marker's first 27 set
         * bits double as the empty-block sentinel (vectorized.py:227-230,
         * GorillaDecompressor.java:65) */
        bw_put(&b, 0x0F, 4);
        bw_put(&b, 0xFFFFFFFFULL, 32);
        bw_bit(&b, 0);
        int64_t tb = b.n * 64 + (64 - b.left);
        *out_total_bits = tb;
        if (closed) return bw_close_words(&b);
        if (b.n >= b.cap) return -1;
        out_words[b.n] = b.cur;
        return b.overflow ? -1 : b.n + 1;
    } else {
        int64_t sdelta = ts[0] - block_ts;    /* long in v1 */
        int64_t sts = ts[0];
        bw_put(&b, (uint64_t)sdelta, FIRST_DELTA_BITS);
        bw_put(&b, vals[0], 64);
        uint64_t sval = vals[0];
        int wlz = 0, wtz = 0, have = 0;
        for (int64_t i = 1; i < n; i++) {
            int64_t new_delta = ts[i] - sts;
            int64_t dod = new_delta - sdelta;
            if (dod == 0)                      bw_bit(&b, 0);
            else if (dod >= -63 && dod <= 64)  { bw_put(&b, 0x02, 2); bw_put(&b, (uint64_t)dod, 7); }
            else if (dod >= -255 && dod <= 256){ bw_put(&b, 0x06, 3); bw_put(&b, (uint64_t)dod, 9); }
            else if (dod >= -2047 && dod <= 2048){ bw_put(&b, 0x0E, 4); bw_put(&b, (uint64_t)dod, 12); }
            else { bw_put(&b, 0x0F, 4); bw_put(&b, (uint64_t)dod, 32); }
            sdelta = new_delta;
            sts = ts[i];

            uint64_t xor = sval ^ vals[i];
            if (xor == 0) {
                bw_bit(&b, 0);
            } else {
                int lz = __builtin_clzll(xor);
                int tz = __builtin_ctzll(xor);
                if (lz >= 32) lz = 31;         /* Compressor.java:132-134 */
                bw_bit(&b, 1);
                if (have && lz >= wlz && tz >= wtz) {
                    bw_bit(&b, 0);
                    int sig = 64 - wlz - wtz;
                    bw_put(&b, xor >> wtz, sig);
                } else {
                    bw_bit(&b, 1);
                    int sig = 64 - lz - tz;
                    bw_put(&b, (uint64_t)lz, 5);
                    bw_put(&b, (uint64_t)sig, 6);   /* 64 & 0x3F == 0 */
                    bw_put(&b, xor >> tz, sig);
                    wlz = lz; wtz = tz; have = 1;
                }
            }
            sval = vals[i];
            if (b.overflow) return -1;
        }
    }
    int64_t total_bits = b.n * 64 + (64 - b.left);
    if (closed) {
        bw_put(&b, 0x0F, 4);
        bw_put(&b, 0xFFFFFFFFULL, 32);
        bw_bit(&b, 0);
        total_bits += 37;
        *out_total_bits = total_bits;
        return bw_close_words(&b);
    }
    *out_total_bits = total_bits;
    if (b.n >= b.cap) return -1;
    out_words[b.n] = b.cur;
    return b.overflow ? -1 : b.n + 1;
}

/* ============== batched v2 decode (one call per map batch) ============== */

int64_t gtsc_decode_v2_batch(const uint64_t *words, const int64_t *w_off,
                             const int64_t *npts, int64_t n_blocks,
                             int64_t *out_ts, uint64_t *out_v,
                             const int64_t *out_off)
{
    for (int64_t b = 0; b < n_blocks; b++) {
        int64_t rc = gtsc_decode_v2(words + w_off[b],
                                    w_off[b + 1] - w_off[b], npts[b],
                                    out_ts + out_off[b], out_v + out_off[b]);
        if (rc != npts[b]) return -(b + 1);
    }
    return out_off[n_blocks];
}

/* ============== batched v2 encode (one call per partition) ==============
 *
 * Encodes n_series closed v2 blocks back-to-back into one word buffer.
 * bounds[s]..bounds[s+1] delimits series s in the concatenated ts/vals
 * arrays (timestamps already strictly increasing per series); block_ts[s]
 * is its block header.  Writes exclusive word offsets into out_w_off
 * (n_series + 1 entries) and returns the total word count, or -(s+1) if
 * series s failed (capacity — callers size cap to the worst case, so
 * unreachable in practice).  This replaces a per-series Python+ctypes
 * round-trip in the encode partition kernel (stages/series.py), the
 * encode-side twin of gtsc_decode_v2_batch above. */

int64_t gtsc_encode_v2_batch(const int64_t *block_ts, const int64_t *ts,
                             const uint64_t *vals, const int64_t *bounds,
                             int64_t n_series, uint64_t *out_words,
                             int64_t cap, int64_t *out_w_off)
{
    int64_t w = 0;
    out_w_off[0] = 0;
    for (int64_t s = 0; s < n_series; s++) {
        int64_t tb;
        int64_t nw = gtsc_encode_v2(block_ts[s], ts + bounds[s],
                                    vals + bounds[s],
                                    bounds[s + 1] - bounds[s], 1,
                                    out_words + w, cap - w, &tb);
        if (nw < 0) return -(s + 1);
        w += nw;
        out_w_off[s + 1] = w;
    }
    return w;
}

/* ========== candidate-pair enumeration (dedup/similarity stages) ========
 *
 * Decodes every in-bucket (i < j) pair over pre-sorted candidate rows and
 * writes surviving id pairs — the allocation-free native form of the
 * numpy triangular decode in stages/dedup.py:candidate_pairs_partition
 * (the vectorized form allocates ~90 B of intermediates per raw pair,
 * which serializes across parallel reduce tasks on first-touch).  With
 * threshold >= 0 and sz/pos arrays present, applies the PPJoin length +
 * positional filters; an integer m >= ceil(x) test is equivalent to
 * (double)m >= x, so no libm ceil is needed and results are bit-identical
 * to the numpy filter.  Returns the pair count, or -1 if cap is hit
 * (callers size cap to the unfiltered pair total, so that is unreachable).
 */

int64_t gtsc_pair_candidates(const int64_t *ids, const int32_t *sz,
                             const int32_t *pos, const int64_t *starts,
                             const int64_t *sizes, int64_t n_buckets,
                             double threshold, int64_t *out_a,
                             int64_t *out_b, int64_t cap)
{
    int64_t n_out = 0;
    int use_f = threshold >= 0.0 && sz != 0 && pos != 0;
    double tfrac = use_f ? threshold / (1.0 + threshold) : 0.0;
    for (int64_t b = 0; b < n_buckets; b++) {
        int64_t s = starts[b], e = starts[b] + sizes[b];
        for (int64_t j = s + 1; j < e; j++) {
            for (int64_t i = s; i < j; i++) {
                if (use_f) {
                    int64_t sa = sz[i], sb = sz[j];
                    int64_t mn = sa < sb ? sa : sb;
                    int64_t mx = sa < sb ? sb : sa;
                    if ((double)mn < threshold * (double)mx) continue;
                    int64_t ra = sa - pos[i], rb = sb - pos[j];
                    int64_t ub = ra < rb ? ra : rb;
                    if ((double)ub < tfrac * (double)(sa + sb)) continue;
                }
                if (n_out >= cap) return -1;
                out_a[n_out] = ids[i];
                out_b[n_out] = ids[j];
                n_out++;
            }
        }
    }
    return n_out;
}

/* ============== gorilla2e: entropy-coded timestamp stream ===============
 *
 * Stream-split block format — the v2 bitstream spends most of the mixed
 * store's bytes on irregular-timestamp dod codes (BASELINE.md: the store
 * is timestamp-entropy-bound; predictor choice is irrelevant), so this
 * tag re-codes ONLY the dod stream with an adaptive binary range coder
 * (the carry-less LZMA-style coder of Martin/Subbotin lineage: 11-bit
 * adaptive bit models, shift-low byte renormalization — a published,
 * public-domain construction) while the value stream keeps the exact v2
 * XOR coding (ValueCompressor.java:32-91 semantics).  Payload layout:
 *
 *   [u32 BE: L = rc section byte length]
 *   [u64 BE: block_ts]
 *   [L bytes: rc section — 27 direct bits first_delta, then per point a
 *     dod bucket symbol through adaptive bit models (zero bit contexted
 *     on the previous symbol) and the in-bucket offset through a
 *     per-bucket adaptive bit-tree; the 32-bit escape is direct bits]
 *   [value section: MSB-first bits packed into BYTES (no word padding):
 *     64-bit first value, then the v2 XOR codes; no EOF marker — the
 *     block store carries n_points externally]
 *
 * Dod analysis mirrors gtsc_encode_v2 exactly (int32 wrap, zigzag-1,
 * bucket bounds), so ts round-trips bit-exactly through the same integer
 * path.  No dynamic allocation: models live on the stack (~10 KB).
 */

#define RC_TOP (1u << 24)
#define RC_BITS 11
#define RC_TOTAL (1u << RC_BITS)
#define RC_MOVE 5

typedef struct {
    uint8_t *buf; int64_t pos, cap;
    uint64_t low; uint32_t range; uint8_t cache; int64_t cache_size;
    int ovf;
} RCE;

static inline void rce_init(RCE *rc, uint8_t *buf, int64_t cap) {
    rc->buf = buf; rc->pos = 0; rc->cap = cap;
    rc->low = 0; rc->range = 0xFFFFFFFFu; rc->cache = 0; rc->cache_size = 1;
    rc->ovf = 0;
}

static inline void rce_shift_low(RCE *rc) {
    if ((uint32_t)rc->low < 0xFF000000u || (rc->low >> 32) != 0) {
        uint8_t carry = (uint8_t)(rc->low >> 32);
        uint8_t temp = rc->cache;
        do {
            if (rc->pos >= rc->cap) { rc->ovf = 1; return; }
            rc->buf[rc->pos++] = (uint8_t)(temp + carry);
            temp = 0xFF;
        } while (--rc->cache_size != 0);
        rc->cache = (uint8_t)(rc->low >> 24);
    }
    rc->cache_size++;
    rc->low = (uint32_t)rc->low << 8;
}

static inline void rce_bit(RCE *rc, uint16_t *prob, int bit) {
    uint32_t bound = (rc->range >> RC_BITS) * (*prob);
    if (!bit) {
        rc->range = bound;
        *prob += (uint16_t)((RC_TOTAL - *prob) >> RC_MOVE);
    } else {
        rc->low += bound;
        rc->range -= bound;
        *prob -= (uint16_t)(*prob >> RC_MOVE);
    }
    if (rc->range < RC_TOP) { rc->range <<= 8; rce_shift_low(rc); }
}

static inline void rce_direct(RCE *rc, uint64_t v, int nbits) {
    for (int i = nbits - 1; i >= 0; i--) {
        rc->range >>= 1;
        if ((v >> i) & 1) rc->low += rc->range;
        if (rc->range < RC_TOP) { rc->range <<= 8; rce_shift_low(rc); }
    }
}

static inline void rce_tree(RCE *rc, uint16_t *probs, int nbits, uint32_t v) {
    uint32_t m = 1;
    for (int i = nbits - 1; i >= 0; i--) {
        int bit = (int)((v >> i) & 1);
        rce_bit(rc, &probs[m], bit);
        m = (m << 1) | (uint32_t)bit;
    }
}

static inline void rce_flush(RCE *rc) {
    for (int i = 0; i < 5; i++) rce_shift_low(rc);
}

typedef struct {
    const uint8_t *buf; int64_t pos, len;
    uint32_t range, code;
} RCD;

static inline uint8_t rcd_byte(RCD *rc) {
    return rc->pos < rc->len ? rc->buf[rc->pos++] : 0;
}

static inline void rcd_init(RCD *rc, const uint8_t *buf, int64_t len) {
    rc->buf = buf; rc->pos = 0; rc->len = len;
    rc->range = 0xFFFFFFFFu; rc->code = 0;
    for (int i = 0; i < 5; i++)  /* first byte is the encoder's cache seed */
        rc->code = (rc->code << 8) | rcd_byte(rc);
}

static inline int rcd_bit(RCD *rc, uint16_t *prob) {
    uint32_t bound = (rc->range >> RC_BITS) * (*prob);
    int bit;
    if (rc->code < bound) {
        rc->range = bound;
        *prob += (uint16_t)((RC_TOTAL - *prob) >> RC_MOVE);
        bit = 0;
    } else {
        rc->code -= bound;
        rc->range -= bound;
        *prob -= (uint16_t)(*prob >> RC_MOVE);
        bit = 1;
    }
    if (rc->range < RC_TOP) {
        rc->range <<= 8;
        rc->code = (rc->code << 8) | rcd_byte(rc);
    }
    return bit;
}

static inline uint64_t rcd_direct(RCD *rc, int nbits) {
    uint64_t v = 0;
    for (int i = 0; i < nbits; i++) {
        rc->range >>= 1;
        int bit = rc->code >= rc->range;
        if (bit) rc->code -= rc->range;
        v = (v << 1) | (uint64_t)bit;
        if (rc->range < RC_TOP) {
            rc->range <<= 8;
            rc->code = (rc->code << 8) | rcd_byte(rc);
        }
    }
    return v;
}

static inline uint32_t rcd_tree(RCD *rc, uint16_t *probs, int nbits) {
    uint32_t m = 1;
    for (int i = 0; i < nbits; i++)
        m = (m << 1) | (uint32_t)rcd_bit(rc, &probs[m]);
    return m - (1u << nbits);
}

/* dod bucket models: zero bit (contexted on previous-symbol-was-zero),
 * three bucket-selection bits, per-bucket offset bit-trees */
typedef struct {
    uint16_t p_zero[2];
    uint16_t p_b7, p_b9, p_b12;
    uint16_t t7[1 << 7];
    uint16_t t9[1 << 9];
    uint16_t t12[1 << 12];
    uint16_t tbl[1 << 6];     /* escape bit-length tree (0..32) */
} EModels;

static inline void emodels_init(EModels *m) {
    uint16_t half = RC_TOTAL / 2;
    m->p_zero[0] = m->p_zero[1] = half;
    m->p_b7 = m->p_b9 = m->p_b12 = half;
    for (int i = 0; i < (1 << 7); i++)  m->t7[i] = half;
    for (int i = 0; i < (1 << 9); i++)  m->t9[i] = half;
    for (int i = 0; i < (1 << 12); i++) m->t12[i] = half;
    for (int i = 0; i < (1 << 6); i++)  m->tbl[i] = half;
}

/* byte-granular MSB-first bit writer (value section: no word padding) */
typedef struct { uint8_t *b; int64_t pos, cap; uint64_t acc; int nacc; int ovf; } BB;

static inline void bb_put(BB *o, uint64_t v, int nb) {
    if (nb < 64) v &= (1ULL << nb) - 1;
    u128 acc = ((u128)o->acc << nb) | v;
    int total = o->nacc + nb;
    while (total >= 8) {
        total -= 8;
        if (o->pos >= o->cap) { o->ovf = 1; return; }
        o->b[o->pos++] = (uint8_t)(acc >> total);
    }
    o->acc = (uint64_t)acc & ((1u << total) - 1);
    o->nacc = total;
}

static inline void bb_flush(BB *o) {
    if (o->nacc) {
        if (o->pos >= o->cap) { o->ovf = 1; return; }
        o->b[o->pos++] = (uint8_t)(o->acc << (8 - o->nacc));
        o->acc = 0; o->nacc = 0;
    }
}

typedef struct { const uint8_t *b; int64_t nbytes; int64_t pos; } BBR;

static inline uint64_t bbr_get(BBR *r, int k) {
    int64_t bytei = r->pos >> 3;
    int off = (int)(r->pos & 7);
    u128 acc = 0;
    for (int i = 0; i < 9; i++) {
        uint8_t c = (bytei + i < r->nbytes) ? r->b[bytei + i] : 0;
        acc = (acc << 8) | c;
    }
    uint64_t v = (uint64_t)(acc >> (72 - off - k));
    r->pos += k;
    return k == 64 ? v : (v & ((1ULL << k) - 1));
}

/* byte-level value-stream XOR encoder (v2 window semantics) */
static inline void bb_val_xor(BB *o, VWin *wn, uint64_t diff) {
    if (diff == 0) { bb_put(o, 0, 1); return; }
    int lz = __builtin_clzll(diff);
    int tz = __builtin_ctzll(diff);
    if (wn->have && lz >= wn->lz && tz >= wn->tz) {
        int sig = 64 - wn->lz - wn->tz;
        bb_put(o, 2, 2);                          /* '10' */
        bb_put(o, diff >> wn->tz, sig);
    } else {
        int sig = 64 - lz - tz;
        bb_put(o, (uint64_t)(0b11 << 12) | ((uint64_t)lz << 6)
                      | (uint64_t)(sig - 1), 14); /* '11' + 6+6 header */
        bb_put(o, diff >> tz, sig);
        wn->lz = lz; wn->tz = tz; wn->have = 1;
    }
}

int64_t gtsc_encode_e(int64_t block_ts, const int64_t *ts,
                      const uint64_t *vals, int64_t n,
                      uint8_t *out, int64_t cap)
{
    if (cap < 12) return -1;
    if (n == 0) {
        out[0] = out[1] = out[2] = out[3] = 0;    /* L = 0 */
        for (int i = 0; i < 8; i++)
            out[4 + i] = (uint8_t)((uint64_t)block_ts >> (56 - 8 * i));
        return 12;
    }
    /* rc section at out+12 */
    RCE rc;
    rce_init(&rc, out + 12, cap - 12);
    EModels m;
    emodels_init(&m);
    int32_t sdelta = (int32_t)(ts[0] - block_ts);
    int64_t sts = ts[0];
    rce_direct(&rc, (uint32_t)sdelta & ((1u << FIRST_DELTA_BITS) - 1),
               FIRST_DELTA_BITS);
    int prev_nz = 0;
    for (int64_t i = 1; i < n; i++) {
        int32_t new_delta = (int32_t)(ts[i] - sts);
        int32_t dod = new_delta - sdelta;
        if (dod == 0) {
            rce_bit(&rc, &m.p_zero[prev_nz], 0);
            prev_nz = 0;
        } else {
            rce_bit(&rc, &m.p_zero[prev_nz], 1);
            prev_nz = 1;
            uint32_t z = zz32_enc(dod) - 1;
            if (z >= 1 && z <= 127) {
                rce_bit(&rc, &m.p_b7, 0);
                rce_tree(&rc, m.t7, 7, z);
            } else if (z >= 128 && z <= 511) {
                rce_bit(&rc, &m.p_b7, 1);
                rce_bit(&rc, &m.p_b9, 0);
                rce_tree(&rc, m.t9, 9, z - 128);
            } else if (z >= 512 && z <= 4095) {
                rce_bit(&rc, &m.p_b7, 1);
                rce_bit(&rc, &m.p_b9, 1);
                rce_bit(&rc, &m.p_b12, 0);
                rce_tree(&rc, m.t12, 12, z - 512);
            } else {                               /* incl. z == 0 (dod=-1) */
                rce_bit(&rc, &m.p_b7, 1);
                rce_bit(&rc, &m.p_b9, 1);
                rce_bit(&rc, &m.p_b12, 1);
                /* escape: bit-length through an adaptive tree, then the
                 * below-MSB bits direct (MSB itself is implicit) — large
                 * irregular dods cost ~log2(z) bits instead of flat 32 */
                int bl = z ? 32 - __builtin_clz(z) : 0;
                rce_tree(&rc, m.tbl, 6, (uint32_t)bl);
                if (bl > 1) rce_direct(&rc, z & ((1u << (bl - 1)) - 1),
                                       bl - 1);
            }
            sdelta = new_delta;
        }
        sts = ts[i];
        if (rc.ovf) return -1;
    }
    rce_flush(&rc);
    if (rc.ovf) return -1;
    int64_t L = rc.pos;
    out[0] = (uint8_t)(L >> 24); out[1] = (uint8_t)(L >> 16);
    out[2] = (uint8_t)(L >> 8);  out[3] = (uint8_t)L;
    for (int i = 0; i < 8; i++)
        out[4 + i] = (uint8_t)((uint64_t)block_ts >> (56 - 8 * i));
    /* value section */
    BB o = {out, 12 + L, cap, 0, 0, 0};
    bb_put(&o, vals[0], 64);
    uint64_t sval = vals[0];
    VWin wn = {0, 0, 0};
    for (int64_t i = 1; i < n; i++) {
        bb_val_xor(&o, &wn, sval ^ vals[i]);
        sval = vals[i];
        if (o.ovf) return -1;
    }
    bb_flush(&o);
    return o.ovf ? -1 : o.pos;
}

int64_t gtsc_decode_e(const uint8_t *buf, int64_t len, int64_t n,
                      int64_t *out_ts, uint64_t *out_v)
{
    if (len < 12) return -1;
    int64_t L = ((int64_t)buf[0] << 24) | ((int64_t)buf[1] << 16)
              | ((int64_t)buf[2] << 8) | (int64_t)buf[3];
    if (12 + L > len) return -1;
    uint64_t bts_u = 0;
    for (int i = 0; i < 8; i++) bts_u = (bts_u << 8) | buf[4 + i];
    int64_t block_ts = (int64_t)bts_u;
    if (n == 0) return 0;

    RCD rc;
    rcd_init(&rc, buf + 12, L);
    EModels m;
    emodels_init(&m);
    uint32_t fd = (uint32_t)rcd_direct(&rc, FIRST_DELTA_BITS);
    int64_t sdelta = (int64_t)fd;
    int64_t sts = block_ts + sdelta;
    out_ts[0] = sts;
    int prev_nz = 0;
    for (int64_t i = 1; i < n; i++) {
        if (rcd_bit(&rc, &m.p_zero[prev_nz])) {
            prev_nz = 1;
            uint32_t z;
            if (!rcd_bit(&rc, &m.p_b7))        z = rcd_tree(&rc, m.t7, 7);
            else if (!rcd_bit(&rc, &m.p_b9))   z = rcd_tree(&rc, m.t9, 9) + 128;
            else if (!rcd_bit(&rc, &m.p_b12))  z = rcd_tree(&rc, m.t12, 12) + 512;
            else {
                int bl = (int)rcd_tree(&rc, m.tbl, 6);
                z = bl == 0 ? 0
                    : bl == 1 ? 1
                    : (1u << (bl - 1))
                      | (uint32_t)rcd_direct(&rc, bl - 1);
            }
            int32_t dod = zz32_dec(z + 1);
            sdelta += dod;
        } else {
            prev_nz = 0;
        }
        sts += sdelta;
        out_ts[i] = sts;
    }

    BBR r = {buf + 12 + L, len - 12 - L, 0};
    uint64_t sval = bbr_get(&r, 64);
    out_v[0] = sval;
    int lz = 0, tz = 0, sig = 64;
    int have_window = 0;
    for (int64_t i = 1; i < n; i++) {
        if (r.pos >= (r.nbytes << 3) + 8) return -1;
        if (bbr_get(&r, 1)) {
            if (bbr_get(&r, 1)) {
                uint64_t hdr = bbr_get(&r, 12);
                lz = (int)(hdr >> 6);
                sig = (int)(hdr & 63) + 1;
                tz = 64 - sig - lz;
                if (tz < 0) return -1;
                have_window = 1;
            } else if (!have_window) {
                sig = 64; tz = 0;
            }
            uint64_t bits = bbr_get(&r, sig);
            sval ^= bits << tz;
        }
        out_v[i] = sval;
    }
    return n;
}

/* batched forms: byte-offset in/out, one call per map batch */
int64_t gtsc_decode_e_batch(const uint8_t *data, const int64_t *b_off,
                            const int64_t *npts, int64_t n_blocks,
                            int64_t *out_ts, uint64_t *out_v,
                            const int64_t *out_off)
{
    for (int64_t b = 0; b < n_blocks; b++) {
        int64_t rc = gtsc_decode_e(data + b_off[b], b_off[b + 1] - b_off[b],
                                   npts[b], out_ts + out_off[b],
                                   out_v + out_off[b]);
        if (rc != npts[b]) return -(b + 1);
    }
    return out_off[n_blocks];
}

int64_t gtsc_encode_e_batch(const int64_t *block_ts, const int64_t *ts,
                            const uint64_t *vals, const int64_t *bounds,
                            int64_t n_series, uint8_t *out, int64_t cap,
                            int64_t *out_b_off)
{
    int64_t w = 0;
    out_b_off[0] = 0;
    for (int64_t s = 0; s < n_series; s++) {
        int64_t nb = gtsc_encode_e(block_ts[s], ts + bounds[s],
                                   vals + bounds[s],
                                   bounds[s + 1] - bounds[s],
                                   out + w, cap - w);
        if (nb < 0) return -(s + 1);
        w += nb;
        out_b_off[s + 1] = w;
    }
    return w;
}
