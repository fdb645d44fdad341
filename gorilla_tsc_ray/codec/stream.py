"""Reference-faithful streaming Gorilla codecs (v2 and v1).

Bit-exact re-implementation (from the published format, not a code
translation) of:

- v2: ``GorillaCompressor.java:28-160`` / ``GorillaDecompressor.java:23-127``
  with ``ValueCompressor.java:27-91`` / ``ValueDecompressor.java:26-54``.
- v1: ``Compressor.java:24-181`` / ``Decompressor.java:22-131``.

These per-point classes are the semantic ground truth: the vectorized NumPy
paths in ``vectorized.py`` are tested for bit-identical output against them.
Java ``int``/``long`` overflow semantics are replicated explicitly (the
``(int)`` casts at ``GorillaCompressor.java:74,102`` wrap at 32 bits).

Timestamp sentinels (engine contract, see SURVEY.md §1.1): ``ts == 0`` for a
first point is unrepresentable (``storedTimestamp == 0`` means "empty",
``GorillaCompressor.java:50``), and first delta ``(1<<27)-1`` is the
empty-block EOF marker (``GorillaDecompressor.java:65``) — callers must keep
``ts > block_ts >= 1`` and first delta in ``[0, 2**27-2]``.
"""

from __future__ import annotations

import struct

from .bits import BitReader, BitWriter
from .predictors import LastValuePredictor, Predictor

_M32 = (1 << 32) - 1
_M64 = (1 << 64) - 1
FIRST_DELTA_BITS = 27
EMPTY_BLOCK_SENTINEL = (1 << 27) - 1
_LZ_SENTINEL = 1 << 30  # stands in for Integer.MAX_VALUE initial window


def _i32(x: int) -> int:
    """Java ``(int)`` cast: wrap to signed 32-bit."""
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _s64(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


def zigzag32_encode(n: int) -> int:
    """Protobuf zigzag (``GorillaCompressor.java:157-160``); returns the
    uint32 bit pattern."""
    return ((n << 1) ^ (n >> 31)) & _M32


def zigzag32_decode(n: int) -> int:
    """``GorillaDecompressor.java:125-127``; ``n`` is a uint32 pattern,
    result is signed."""
    return _i32((n >> 1) ^ (_M32 if n & 1 else 0))


def double_to_bits(value: float) -> int:
    """``Double.doubleToRawLongBits`` — preserves NaN payloads."""
    return struct.unpack("<Q", struct.pack("<d", value))[0]


def bits_to_double(bits: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", bits & _M64))[0]


def long_to_bits(value: int) -> int:
    """Two's-complement int64 → uint64 bit pattern."""
    return value & _M64


def bits_to_long(bits: int) -> int:
    return _s64(bits)


class _ValueCompressor:
    """``ValueCompressor.java:27-91``."""

    __slots__ = ("_out", "_predictor", "_lz", "_tz")

    def __init__(self, out: BitWriter, predictor: Predictor) -> None:
        self._out = out
        self._predictor = predictor
        self._lz = _LZ_SENTINEL
        self._tz = 0

    def write_first(self, value: int) -> None:
        self._predictor.update(value)
        self._out.write_bits(value, 64)

    def compress(self, value: int) -> None:
        value &= _M64
        diff = self._predictor.predict() ^ value
        self._predictor.update(value)
        if diff == 0:
            self._out.skip_bit()
            return
        lz = 64 - diff.bit_length()
        tz = (diff & -diff).bit_length() - 1
        self._out.write_bit()
        if lz >= self._lz and tz >= self._tz:
            # existing window: control '0' + significant bits
            self._out.skip_bit()
            sig = 64 - self._lz - self._tz
            self._out.write_bits(diff >> self._tz, sig)
        else:
            # new window: control '1' + 6-bit lz + 6-bit (sig-1) + sig bits
            self._out.write_bit()
            sig = 64 - lz - tz
            self._out.write_bits(lz, 6)
            self._out.write_bits(sig - 1, 6)
            self._out.write_bits(diff >> tz, sig)
            self._lz, self._tz = lz, tz


class _ValueDecompressor:
    """``ValueDecompressor.java:26-54`` — including the intentional
    fall-through from the new-window case and the predictor-update asymmetry
    on the zero-XOR path (``:53``; the encoder always updates,
    ``ValueCompressor.java:35``)."""

    __slots__ = ("_in", "_predictor", "_lz", "_tz")

    def __init__(self, inp: BitReader, predictor: Predictor) -> None:
        self._in = inp
        self._predictor = predictor
        self._lz = _LZ_SENTINEL
        self._tz = 0

    def read_first(self) -> int:
        value = self._in.get_bits(64)
        self._predictor.update(value)
        return value

    def next_value(self) -> int:
        ctrl = self._in.next_clear_bit(2)
        if ctrl == 3:
            self._lz = self._in.get_bits(6)
            sig = self._in.get_bits(6) + 1
            self._tz = 64 - sig - self._lz
            # intentional fall-through to the existing-window read
        if ctrl >= 2:
            value = self._in.get_bits(64 - self._lz - self._tz)
            value = (value << self._tz) & _M64
            value = self._predictor.predict() ^ value
            self._predictor.update(value)
            return value
        return self._predictor.predict()  # no update — replicated asymmetry


class GorillaCompressor:
    """v2 encoder (``GorillaCompressor.java:28-143``).

    ``add_value(ts, bits)`` takes the raw uint64 value bit pattern
    (use :func:`double_to_bits` / :func:`long_to_bits`).
    """

    def __init__(self, block_timestamp: int, out: BitWriter | None = None,
                 predictor: Predictor | None = None) -> None:
        self.out = out if out is not None else BitWriter()
        self._block_ts = block_timestamp
        self._stored_ts = 0
        self._stored_delta = 0  # int32
        self.out.write_bits(block_timestamp, 64)  # addHeader
        self._values = _ValueCompressor(self.out, predictor or LastValuePredictor())

    def add_value(self, timestamp: int, value_bits: int) -> None:
        if self._stored_ts == 0:
            self._stored_delta = _i32(timestamp - self._block_ts)
            self._stored_ts = timestamp
            self.out.write_bits(self._stored_delta, FIRST_DELTA_BITS)
            self._values.write_first(value_bits & _M64)
            return
        self._compress_timestamp(timestamp)
        self._values.compress(value_bits)

    def add_double(self, timestamp: int, value: float) -> None:
        self.add_value(timestamp, double_to_bits(value))

    def add_long(self, timestamp: int, value: int) -> None:
        self.add_value(timestamp, long_to_bits(value))

    def _compress_timestamp(self, timestamp: int) -> None:
        new_delta = _i32(timestamp - self._stored_ts)
        dod = _i32(new_delta - self._stored_delta)
        if dod == 0:
            self.out.skip_bit()
        else:
            z = zigzag32_encode(dod) - 1  # one free bit (decoder adds it back)
            bits_required = z.bit_length()
            if 1 <= bits_required <= 7:
                self.out.write_bits(z | (0x02 << 7), 9)
            elif 8 <= bits_required <= 9:
                self.out.write_bits(z | (0x06 << 9), 12)
            elif 10 <= bits_required <= 12:
                self.out.write_bits(z | (0x0E << 12), 16)
            else:  # includes bits_required == 0 (z == 0, dod == -1)
                self.out.write_bits(0x0F, 4)
                self.out.write_bits(z, 32)
            self._stored_delta = new_delta
        self._stored_ts = timestamp

    def close(self) -> None:
        """EOF marker + flush (``GorillaCompressor.java:84-89``)."""
        self.out.write_bits(0x0F, 4)
        self.out.write_bits(0xFFFFFFFF, 32)
        self.out.skip_bit()
        self.out.flush()


class GorillaDecompressor:
    """v2 decoder (``GorillaDecompressor.java:23-112``); iterator of
    ``(timestamp, value_bits)`` pairs, ``None``-terminated via
    :meth:`read_pair`."""

    def __init__(self, inp: BitReader, predictor: Predictor | None = None) -> None:
        self._in = inp
        self._block_ts = _s64(inp.get_bits(64))
        self._stored_ts = 0
        self._stored_delta = 0  # long in the reference decoder
        self._stored_val = 0
        self._eos = False
        self._values = _ValueDecompressor(inp, predictor or LastValuePredictor())

    def read_pair(self):
        if self._eos:
            return None
        if self._stored_ts == 0:
            self._stored_delta = self._in.get_bits(FIRST_DELTA_BITS)
            if self._stored_delta == EMPTY_BLOCK_SENTINEL:
                self._eos = True
                return None
            self._stored_val = self._values.read_first()
            self._stored_ts = self._block_ts + self._stored_delta
            return (self._stored_ts, self._stored_val)
        ctrl = self._in.next_clear_bit(4)
        if ctrl == 0x00:
            self._stored_ts += self._stored_delta
        else:
            n_payload = {0x02: 7, 0x06: 9, 0x0E: 12, 0x0F: 32}[ctrl]
            dd = self._in.get_bits(n_payload)
            if n_payload == 32 and dd == 0xFFFFFFFF:
                self._eos = True
                return None
            dod = zigzag32_decode((dd + 1) & _M32)
            self._stored_delta += dod
            self._stored_ts += self._stored_delta
        self._stored_val = self._values.next_value()
        return (self._stored_ts, self._stored_val)

    def __iter__(self):
        while True:
            pair = self.read_pair()
            if pair is None:
                return
            yield pair


class CompressorV1:
    """v1 encoder (``Compressor.java:24-181``) — legacy format: raw signed
    two's-complement dod buckets (no zigzag), 5-bit leading-zero count capped
    at 31, 6-bit significant-bit count with the ``0 ⇒ 64`` trick, inline
    last-value prediction."""

    def __init__(self, block_timestamp: int, out: BitWriter | None = None) -> None:
        self.out = out if out is not None else BitWriter()
        self._block_ts = block_timestamp
        self._stored_ts = 0
        self._stored_delta = 0  # long
        self._stored_val = 0
        self._lz = _LZ_SENTINEL
        self._tz = 0
        self.out.write_bits(block_timestamp, 64)

    def add_value(self, timestamp: int, value_bits: int) -> None:
        if self._stored_ts == 0:
            self._stored_delta = timestamp - self._block_ts
            self._stored_ts = timestamp
            self._stored_val = value_bits & _M64
            self.out.write_bits(self._stored_delta, FIRST_DELTA_BITS)
            self.out.write_bits(self._stored_val, 64)
            return
        self._compress_timestamp(timestamp)
        self._compress_value(value_bits & _M64)

    def add_double(self, timestamp: int, value: float) -> None:
        self.add_value(timestamp, double_to_bits(value))

    def _compress_timestamp(self, timestamp: int) -> None:
        new_delta = timestamp - self._stored_ts
        dod = new_delta - self._stored_delta
        if dod == 0:
            self.out.skip_bit()
        elif -63 <= dod <= 64:
            self.out.write_bits(0x02, 2)
            self.out.write_bits(dod, 7)
        elif -255 <= dod <= 256:
            self.out.write_bits(0x06, 3)
            self.out.write_bits(dod, 9)
        elif -2047 <= dod <= 2048:
            self.out.write_bits(0x0E, 4)
            self.out.write_bits(dod, 12)
        else:
            self.out.write_bits(0x0F, 4)
            self.out.write_bits(dod, 32)
        self._stored_delta = new_delta
        self._stored_ts = timestamp

    def _compress_value(self, value: int) -> None:
        xor = self._stored_val ^ value
        if xor == 0:
            self.out.skip_bit()
        else:
            lz = 64 - xor.bit_length()
            tz = (xor & -xor).bit_length() - 1
            if lz >= 32:
                lz = 31  # Compressor.java:132-134
            self.out.write_bit()
            if lz >= self._lz and tz >= self._tz:
                self.out.skip_bit()
                sig = 64 - self._lz - self._tz
                self.out.write_bits(xor >> self._tz, sig)
            else:
                self.out.write_bit()
                self.out.write_bits(lz, 5)
                sig = 64 - lz - tz
                self.out.write_bits(sig, 6)  # 64 & 0x3F == 0 → "0 means 64"
                self.out.write_bits(xor >> tz, sig)
                self._lz, self._tz = lz, tz
        self._stored_val = value

    def close(self) -> None:
        self.out.write_bits(0x0F, 4)
        self.out.write_bits(0xFFFFFFFF, 32)
        self.out.skip_bit()
        self.out.flush()


class DecompressorV1:
    """v1 decoder (``Decompressor.java:22-131``)."""

    def __init__(self, inp: BitReader) -> None:
        self._in = inp
        self._block_ts = _s64(inp.get_bits(64))
        self._stored_ts = 0
        self._stored_delta = 0
        self._stored_val = 0
        self._lz = _LZ_SENTINEL
        self._tz = 0
        self._eos = False

    def read_pair(self):
        if self._eos:
            return None
        if self._stored_ts == 0:
            self._stored_delta = self._in.get_bits(FIRST_DELTA_BITS)
            if self._stored_delta == EMPTY_BLOCK_SENTINEL:
                self._eos = True
                return None
            self._stored_val = self._in.get_bits(64)
            self._stored_ts = self._block_ts + self._stored_delta
            return (self._stored_ts, self._stored_val)
        ctrl = self._in.next_clear_bit(4)
        to_read = {0x00: 0, 0x02: 7, 0x06: 9, 0x0E: 12, 0x0F: 32}[ctrl]
        dod = 0
        if to_read > 0:
            dd = self._in.get_bits(to_read)
            if to_read == 32:
                if dd == 0xFFFFFFFF:
                    self._eos = True
                    return None
                dod = _i32(dd)
            else:
                # sign-fix with the reference's asymmetric ranges
                # (Decompressor.java:96-101: strictly greater-than)
                dod = dd - (1 << to_read) if dd > (1 << (to_read - 1)) else dd
        self._stored_delta += dod
        self._stored_ts += self._stored_delta
        # value (Decompressor.java:111-130)
        if self._in.read_bit():
            if self._in.read_bit():
                self._lz = self._in.get_bits(5)
                sig = self._in.get_bits(6)
                if sig == 0:
                    sig = 64
                self._tz = 64 - sig - self._lz
            value = self._in.get_bits(64 - self._lz - self._tz)
            value = (value << self._tz) & _M64
            self._stored_val ^= value
        return (self._stored_ts, self._stored_val)

    def __iter__(self):
        while True:
            pair = self.read_pair()
            if pair is None:
                return
            yield pair
