"""gorilla2e: stream-split block codec with an entropy-coded dod stream.

Pure-Python mirror of the C kernels in ``_native.c`` (``gtsc_encode_e`` /
``gtsc_decode_e``) — bit-identical output (enforced by
``tests/test_codec_entropy.py``), used only when no C compiler is
available.  Rationale and payload layout are documented at the C
implementation; briefly: the mixed store is timestamp-entropy-bound
(BASELINE.md — predictor choice moves nothing, byte-level entropy coding
does), so this tag re-codes ONLY the delta-of-delta stream with an
adaptive binary range coder (the public carry-less LZMA-style coder:
11-bit adaptive bit models, bit-tree offset models per dod bucket,
shift-low byte renormalization) while values keep the exact v2 XOR
coding (``ValueCompressor.java:32-52`` semantics) packed at BYTE
granularity — no EOF marker, no 64-bit word padding (the block store
carries ``n_points`` externally).

Payload: ``[u32 BE rc-length][u64 BE block_ts][rc section][value section]``.
"""

from __future__ import annotations

import numpy as np

RC_BITS = 11
RC_TOTAL = 1 << RC_BITS
RC_MOVE = 5
RC_TOP = 1 << 24
_M32 = 0xFFFFFFFF
FIRST_DELTA_BITS = 27


def _i32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _zz32_enc(dod: int) -> int:
    return ((dod << 1) ^ (dod >> 31)) & _M32


def _zz32_dec(z: int) -> int:
    v = (z >> 1) ^ (-(z & 1) & _M32)
    return v - (1 << 32) if v >= (1 << 31) else v


class _Models:
    __slots__ = ("p_zero", "p_b7", "p_b9", "p_b12", "t7", "t9", "t12",
                 "tbl")

    def __init__(self):
        half = RC_TOTAL // 2
        self.p_zero = [half, half]
        self.p_b7 = [half]
        self.p_b9 = [half]
        self.p_b12 = [half]
        self.t7 = [half] * (1 << 7)
        self.t9 = [half] * (1 << 9)
        self.t12 = [half] * (1 << 12)
        self.tbl = [half] * (1 << 6)


class _REnc:
    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        if (self.low & _M32) < 0xFF000000 or (self.low >> 32) != 0:
            carry = (self.low >> 32) & 0xFF
            temp = self.cache
            while True:
                self.out.append((temp + carry) & 0xFF)
                temp = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        # canonical LZMA keeps low as uint32 after the shift: bits 24-31
        # just went to cache, so the truncation loses nothing
        self.low = ((self.low & _M32) << 8) & _M32

    def bit(self, probs: list, idx: int, b: int):
        p = probs[idx]
        bound = (self.range >> RC_BITS) * p
        if not b:
            self.range = bound
            probs[idx] = p + ((RC_TOTAL - p) >> RC_MOVE)
        else:
            self.low += bound
            self.range -= bound
            probs[idx] = p - (p >> RC_MOVE)
        if self.range < RC_TOP:
            self.range = (self.range << 8) & _M32
            self._shift_low()

    def direct(self, v: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.range >>= 1
            if (v >> i) & 1:
                self.low += self.range
            if self.range < RC_TOP:
                self.range = (self.range << 8) & _M32
                self._shift_low()

    def tree(self, probs: list, nbits: int, v: int):
        m = 1
        for i in range(nbits - 1, -1, -1):
            b = (v >> i) & 1
            self.bit(probs, m, b)
            m = (m << 1) | b

    def flush(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class _RDec:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.range = 0xFFFFFFFF
        self.code = 0
        # the first byte is the encoder's zero cache seed; the working
        # code is 32-bit (C keeps it in a uint32_t)
        for _ in range(5):
            self.code = ((self.code << 8) | self._byte()) & _M32

    def _byte(self) -> int:
        b = self.buf[self.pos] if self.pos < len(self.buf) else 0
        self.pos += 1
        return b

    def bit(self, probs: list, idx: int) -> int:
        p = probs[idx]
        bound = (self.range >> RC_BITS) * p
        if self.code < bound:
            self.range = bound
            probs[idx] = p + ((RC_TOTAL - p) >> RC_MOVE)
            b = 0
        else:
            self.code -= bound
            self.range -= bound
            probs[idx] = p - (p >> RC_MOVE)
            b = 1
        if self.range < RC_TOP:
            self.range = (self.range << 8) & _M32
            self.code = ((self.code << 8) | self._byte()) & _M32
        return b

    def direct(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            self.range >>= 1
            b = 1 if self.code >= self.range else 0
            if b:
                self.code -= self.range
            v = (v << 1) | b
            if self.range < RC_TOP:
                self.range = (self.range << 8) & _M32
                self.code = ((self.code << 8) | self._byte()) & _M32
        return v

    def tree(self, probs: list, nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) | self.bit(probs, m)
        return m - (1 << nbits)


class _ByteBits:
    """MSB-first bit writer at byte granularity (value section)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, v: int, nb: int):
        if nb < 64:
            v &= (1 << nb) - 1
        self.acc = (self.acc << nb) | v
        self.nacc += nb
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:
            self.out.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = 0
            self.nacc = 0
        return bytes(self.out)


class _ByteBitsReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def get(self, k: int) -> int:
        v = 0
        pos = self.pos
        for i in range(k):
            bytei = (pos + i) >> 3
            off = 7 - ((pos + i) & 7)
            bit = (self.buf[bytei] >> off) & 1 if bytei < len(self.buf) else 0
            v = (v << 1) | bit
        self.pos += k
        return v


def encode_block_e_py(block_ts: int, ts: np.ndarray,
                      value_bits: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    vb = np.asarray(value_bits).astype(np.uint64, copy=False)
    n = len(ts)
    head = bytearray(12)
    head[4:12] = int(np.uint64(np.int64(block_ts).view(np.uint64))).to_bytes(
        8, "big")
    if n == 0:
        return bytes(head)
    enc = _REnc()
    m = _Models()
    sdelta = _i32(int(ts[0]) - int(block_ts))
    sts = int(ts[0])
    enc.direct(sdelta & ((1 << FIRST_DELTA_BITS) - 1), FIRST_DELTA_BITS)
    prev_nz = 0
    ts_l = ts.tolist()
    for i in range(1, n):
        new_delta = _i32(ts_l[i] - sts)
        dod = _i32(new_delta - sdelta)
        if dod == 0:
            enc.bit(m.p_zero, prev_nz, 0)
            prev_nz = 0
        else:
            enc.bit(m.p_zero, prev_nz, 1)
            prev_nz = 1
            z = (_zz32_enc(dod) - 1) & _M32
            if 1 <= z <= 127:
                enc.bit(m.p_b7, 0, 0)
                enc.tree(m.t7, 7, z)
            elif 128 <= z <= 511:
                enc.bit(m.p_b7, 0, 1)
                enc.bit(m.p_b9, 0, 0)
                enc.tree(m.t9, 9, z - 128)
            elif 512 <= z <= 4095:
                enc.bit(m.p_b7, 0, 1)
                enc.bit(m.p_b9, 0, 1)
                enc.bit(m.p_b12, 0, 0)
                enc.tree(m.t12, 12, z - 512)
            else:
                enc.bit(m.p_b7, 0, 1)
                enc.bit(m.p_b9, 0, 1)
                enc.bit(m.p_b12, 0, 1)
                # escape: bit-length tree + below-MSB direct bits (the
                # MSB is implicit) — mirrors the C kernel
                bl = z.bit_length()
                enc.tree(m.tbl, 6, bl)
                if bl > 1:
                    enc.direct(z & ((1 << (bl - 1)) - 1), bl - 1)
            sdelta = new_delta
        sts = ts_l[i]
    rc = enc.flush()
    head[0:4] = len(rc).to_bytes(4, "big")

    o = _ByteBits()
    vb_l = [int(x) for x in vb]
    o.put(vb_l[0], 64)
    sval = vb_l[0]
    wlz = wtz = 0
    have = False
    for i in range(1, n):
        diff = sval ^ vb_l[i]
        if diff == 0:
            o.put(0, 1)
        else:
            lz = 64 - diff.bit_length()
            tz = (diff & -diff).bit_length() - 1
            if have and lz >= wlz and tz >= wtz:
                o.put(2, 2)
                o.put(diff >> wtz, 64 - wlz - wtz)
            else:
                sig = 64 - lz - tz
                o.put((0b11 << 12) | (lz << 6) | (sig - 1), 14)
                o.put(diff >> tz, sig)
                wlz, wtz, have = lz, tz, True
        sval = vb_l[i]
    return bytes(head) + rc + o.flush()


def decode_block_e_py(payload: bytes, n: int):
    if len(payload) < 12:
        raise ValueError("short gorilla2e payload")
    L = int.from_bytes(payload[0:4], "big")
    block_ts = int.from_bytes(payload[4:12], "big")
    if block_ts >= 1 << 63:
        block_ts -= 1 << 64
    out_ts = np.empty(n, dtype=np.int64)
    out_v = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out_ts, out_v
    dec = _RDec(payload[12:12 + L])
    m = _Models()
    sdelta = dec.direct(FIRST_DELTA_BITS)
    sts = block_ts + sdelta
    out_ts[0] = sts
    prev_nz = 0
    for i in range(1, n):
        if dec.bit(m.p_zero, prev_nz):
            prev_nz = 1
            if not dec.bit(m.p_b7, 0):
                z = dec.tree(m.t7, 7)
            elif not dec.bit(m.p_b9, 0):
                z = dec.tree(m.t9, 9) + 128
            elif not dec.bit(m.p_b12, 0):
                z = dec.tree(m.t12, 12) + 512
            else:
                bl = dec.tree(m.tbl, 6)
                z = (0 if bl == 0 else 1 if bl == 1
                     else (1 << (bl - 1)) | dec.direct(bl - 1))
            sdelta += _zz32_dec((z + 1) & _M32)
        else:
            prev_nz = 0
        sts += sdelta
        out_ts[i] = sts

    r = _ByteBitsReader(payload[12 + L:])
    sval = r.get(64)
    out_v[0] = np.uint64(sval)
    lz = tz = 0
    sig = 64
    have = False
    for i in range(1, n):
        if r.get(1):
            if r.get(1):
                hdr = r.get(12)
                lz = hdr >> 6
                sig = (hdr & 63) + 1
                tz = 64 - sig - lz
                if tz < 0:
                    raise ValueError("corrupt gorilla2e value header")
                have = True
            elif not have:
                sig, tz = 64, 0
            sval ^= (r.get(sig) << tz) & 0xFFFFFFFFFFFFFFFF
        out_v[i] = np.uint64(sval)
    return out_ts, out_v


def encode_block_e(block_ts: int, ts: np.ndarray,
                   value_bits: np.ndarray) -> bytes:
    """One series → gorilla2e payload bytes (native kernel when
    available, Python mirror otherwise — bit-identical, tested)."""
    from . import native

    if native.AVAILABLE:
        return native.encode_e(int(block_ts), ts, value_bits)
    return encode_block_e_py(block_ts, ts, value_bits)


def decode_block_e(payload: bytes, n: int):
    """gorilla2e payload → ``(ts int64[], value_bits uint64[])``."""
    from . import native

    if native.AVAILABLE:
        return native.decode_e(payload, n)
    return decode_block_e_py(payload, n)
