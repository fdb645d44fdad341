"""ByteBuffer bit containers (ByteBufferBitOutput/Input.java parity):
same bit stream as the word containers at byte granularity, and fully
plug-compatible with the streaming codecs via the BitInput/BitOutput seam.
Closes the one reference operator not ported in round 1 (SURVEY §2a#11).
"""

from __future__ import annotations

import numpy as np
import pytest

from gorilla_tsc_ray.codec import (
    CompressorV1,
    DecompressorV1,
    GorillaCompressor,
    GorillaDecompressor,
)
from gorilla_tsc_ray.codec.bits import (
    BitReader,
    BitWriter,
    ByteBitReader,
    ByteBitWriter,
    words_to_bytes,
)

T0 = 1500400800000


def _series(seed: int, n: int):
    rng = np.random.default_rng(seed)
    ts = T0 + 1 + np.cumsum(rng.integers(1, 5000, n)).astype(np.int64)
    vb = rng.normal(0, 1e4, n).view(np.uint64)
    return ts, vb


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 17), (2, 300)])
def test_bit_prefix_matches_word_container(seed, n):
    """The byte container must produce the exact bit stream of the word
    container, padded to bytes instead of 64-bit words."""
    ts, vb = _series(seed, n)
    wc = GorillaCompressor(T0, out=BitWriter())
    bc = GorillaCompressor(T0, out=ByteBitWriter())
    for t, b in zip(ts.tolist(), vb.tolist()):
        wc.add_value(t, b)
        bc.add_value(t, b)
    wc.close()
    bc.close()
    n_bits = bc.out.bit_count
    n_bytes = (n_bits + 7) // 8
    word_bytes = words_to_bytes(wc.out.to_words())[:n_bytes]
    byte_bytes = bc.out.to_bytes()[:n_bytes]
    assert word_bytes == byte_bytes


@pytest.mark.parametrize("codec", ["v2", "v1"])
def test_roundtrip_through_byte_container(codec):
    ts, vb = _series(5, 200)
    if codec == "v2":
        comp = GorillaCompressor(T0, out=ByteBitWriter())
    else:
        comp = CompressorV1(T0, out=ByteBitWriter())
    for t, b in zip(ts.tolist(), vb.tolist()):
        comp.add_value(t, b)
    comp.close()
    data = comp.out.to_bytes()
    if codec == "v2":
        dec = GorillaDecompressor(ByteBitReader(data))
    else:
        dec = DecompressorV1(ByteBitReader(data))
    out = list(dec)
    assert [p[0] for p in out] == ts.tolist()
    assert [p[1] for p in out] == vb.tolist()


def test_cross_container_decode():
    """A stream written by the WORD container decodes through the BYTE
    reader (byte-truncated) and vice versa — byte-level interop is the
    point of this container (go-tsz padding, Compressor.java:79 note)."""
    ts, vb = _series(9, 64)
    wc = GorillaCompressor(T0, out=BitWriter())
    for t, b in zip(ts.tolist(), vb.tolist()):
        wc.add_value(t, b)
    wc.close()
    data = words_to_bytes(wc.out.to_words())
    out = list(GorillaDecompressor(ByteBitReader(data)))
    assert [p[0] for p in out] == ts.tolist()

    bc = GorillaCompressor(T0, out=ByteBitWriter())
    for t, b in zip(ts.tolist(), vb.tolist()):
        bc.add_value(t, b)
    bc.close()
    padded = bc.out.to_bytes()
    padded += b"\x00" * (-len(padded) % 8)  # word-align for the word reader
    words = np.frombuffer(padded, dtype=">u8").astype(np.uint64).tolist()
    out2 = list(GorillaDecompressor(BitReader(words)))
    assert [p[1] for p in out2] == vb.tolist()
