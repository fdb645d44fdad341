"""MSB-first bit stream containers over 64-bit words.

Semantics mirror the reference containers
(``LongArrayOutput.java:44-145`` / ``LongArrayInput.java:30-91``): bits are
packed most-significant-first into 64-bit words; ``flush`` stores the
partially filled word and opens a fresh (zero) one, and a snapshot
(``to_words`` without flush) is legal mid-stream — which is what makes
open-block checkpointing possible (reference test
``EncodeGorillaTest.java:484-500``).

Implementation is plain Python ints (arbitrary precision) masked to 64 bits;
this is the *reference-faithful* container used by the streaming codec and by
conformance tests.  The hot path uses the vectorized packer in
``vectorized.py`` instead.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1


class BitWriter:
    """MSB-first bit sink; mirrors ``LongArrayOutput.java``."""

    __slots__ = ("_words", "_cur", "_bits_left")

    def __init__(self) -> None:
        self._words: list[int] = []
        self._cur = 0  # the partially-filled word (``lB``)
        self._bits_left = 64

    def _flip(self) -> None:
        self._words.append(self._cur & _M64)
        self._cur = 0
        self._bits_left = 64

    def write_bit(self) -> None:
        """Write a set bit (``writeBit``, LongArrayOutput.java:97-101)."""
        self._cur |= 1 << (self._bits_left - 1)
        self._bits_left -= 1
        if self._bits_left == 0:
            self._flip()

    def skip_bit(self) -> None:
        """Write a clear bit (``skipBit``, LongArrayOutput.java:103-106)."""
        self._bits_left -= 1
        if self._bits_left == 0:
            self._flip()

    def write_bits(self, value: int, bits: int) -> None:
        """Write the low ``bits`` bits of ``value`` MSB-first
        (``writeBits``, LongArrayOutput.java:115-131; two-word spill path
        included)."""
        value &= (1 << bits) - 1 if bits < 64 else _M64
        if bits <= self._bits_left:
            self._cur |= value << (self._bits_left - bits)
            self._bits_left -= bits
            if self._bits_left == 0:
                self._flip()
        else:
            first = bits - self._bits_left
            self._cur |= value >> first
            self._flip()
            self._cur |= (value << (64 - first)) & _M64
            self._bits_left = 64 - first

    def flush(self) -> None:
        """Store the current partial word (``flush``→``flipWord``,
        LongArrayOutput.java:136-139)."""
        self._flip()

    def to_words(self) -> list[int]:
        """Snapshot, reference ``getLongArray`` (LongArrayOutput.java:141-145):
        all stored words plus the current partial word — works mid-stream."""
        return self._words + [self._cur & _M64]

    @property
    def bit_count(self) -> int:
        return 64 * len(self._words) + (64 - self._bits_left)


class BitReader:
    """MSB-first bit source; mirrors ``LongArrayInput.java:30-91``."""

    __slots__ = ("_words", "_pos", "_cur", "_bits_left")

    def __init__(self, words) -> None:
        self._words = words
        self._pos = 0
        self._cur = int(words[0]) & _M64
        self._pos = 1
        self._bits_left = 64

    def _flip(self) -> None:
        self._cur = int(self._words[self._pos]) & _M64
        self._pos += 1
        self._bits_left = 64

    def read_bit(self) -> int:
        bit = (self._cur >> (self._bits_left - 1)) & 1
        self._bits_left -= 1
        if self._bits_left == 0:
            self._flip()
        return bit

    def get_bits(self, bits: int) -> int:
        """Read ``bits`` bits MSB-first (``getLong``,
        LongArrayInput.java:55-73)."""
        if bits <= self._bits_left:
            value = (self._cur >> (self._bits_left - bits)) & ((1 << bits) - 1)
            self._bits_left -= bits
            if self._bits_left == 0:
                self._flip()
        else:
            value = self._cur & ((1 << self._bits_left) - 1)
            bits -= self._bits_left
            self._flip()
            value = (value << bits) | (self._cur >> (self._bits_left - bits))
            self._bits_left -= bits
        return value

    def next_clear_bit(self, max_bits: int) -> int:
        """Read up to ``max_bits`` bits, stopping after the first 0 bit;
        returns the accumulated prefix (``nextClearBit``,
        LongArrayInput.java:76-91)."""
        val = 0
        for _ in range(max_bits):
            val <<= 1
            if self.read_bit():
                val |= 1
            else:
                break
        return val


class ByteBitWriter:
    """Byte-granularity MSB-first bit sink — mirrors
    ``ByteBufferBitOutput.java:20-105`` (the reference's second container;
    byte padding makes its output interoperable with go-tsz streams, unlike
    the word-padded ``LongArrayOutput``).  Plug-compatible with the
    streaming codec classes via the BitOutput seam (``write_bit`` /
    ``skip_bit`` / ``write_bits`` / ``flush``)."""

    __slots__ = ("_bytes", "_cur", "_bits_left")

    def __init__(self) -> None:
        self._bytes = bytearray()
        self._cur = 0
        self._bits_left = 8

    def _flip(self) -> None:
        self._bytes.append(self._cur & 0xFF)
        self._cur = 0
        self._bits_left = 8

    def write_bit(self) -> None:
        self._cur |= 1 << (self._bits_left - 1)
        self._bits_left -= 1
        if self._bits_left == 0:
            self._flip()

    def skip_bit(self) -> None:
        self._bits_left -= 1
        if self._bits_left == 0:
            self._flip()

    def write_bits(self, value: int, bits: int) -> None:
        """``ByteBufferBitOutput.writeBits`` — spills across bytes exactly
        like the reference loop."""
        value &= (1 << bits) - 1 if bits < 64 else _M64
        while bits > 0:
            shift = bits - self._bits_left
            if shift >= 0:
                self._cur |= (value >> shift) & ((1 << self._bits_left) - 1)
                bits -= self._bits_left
                self._flip()
            else:
                self._cur |= (value << (-shift)) & 0xFF
                self._bits_left -= bits
                bits = 0
        if self._bits_left == 0:
            self._flip()

    def flush(self) -> None:
        self._flip()

    def to_bytes(self) -> bytes:
        """Snapshot: flushed bytes + the current partial byte (mirrors
        ``getByteBuffer`` returning the buffer up to its position)."""
        return bytes(self._bytes) + bytes([self._cur & 0xFF])

    @property
    def bit_count(self) -> int:
        return 8 * len(self._bytes) + (8 - self._bits_left)


class ByteBitReader:
    """Byte-granularity MSB-first bit source — mirrors
    ``ByteBufferBitInput.java:20-99``.  Same read interface as
    :class:`BitReader`, so the streaming decompressors accept either."""

    __slots__ = ("_data", "_pos", "_cur", "_bits_left")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._cur = data[0] if len(data) else 0
        self._pos = 1
        self._bits_left = 8

    def _flip(self) -> None:
        self._cur = self._data[self._pos] if self._pos < len(self._data) else 0
        self._pos += 1
        self._bits_left = 8

    def read_bit(self) -> int:
        bit = (self._cur >> (self._bits_left - 1)) & 1
        self._bits_left -= 1
        if self._bits_left == 0:
            self._flip()
        return bit

    def get_bits(self, bits: int) -> int:
        """``ByteBufferBitInput.getLong`` — cross-byte accumulation."""
        value = 0
        while bits > 0:
            if bits > self._bits_left or bits == 8:
                # take the whole remainder of the current byte
                byte = self._cur & ((1 << self._bits_left) - 1)
                value = (value << self._bits_left) | byte
                bits -= self._bits_left
                self._flip()
            else:
                value = ((value << bits)
                         | ((self._cur >> (self._bits_left - bits))
                            & ((1 << bits) - 1)))
                self._bits_left -= bits
                bits = 0
        if self._bits_left == 0:
            self._flip()
        return value

    def next_clear_bit(self, max_bits: int) -> int:
        val = 0
        for _ in range(max_bits):
            val <<= 1
            if self.read_bit():
                val |= 1
            else:
                break
        return val


def words_to_bytes(words) -> bytes:
    """Serialize 64-bit words big-endian — the on-disk ``payload`` format
    (one ``large_binary`` cell per block)."""
    out = bytearray()
    for w in words:
        out += int(w).to_bytes(8, "big")
    return bytes(out)


def bytes_to_words(payload: bytes) -> list[int]:
    if len(payload) % 8:
        raise ValueError("payload length must be a multiple of 8")
    return [int.from_bytes(payload[i : i + 8], "big") for i in range(0, len(payload), 8)]
