"""Value predictors for the Gorilla value codec.

Mirrors the reference's ``Predictor`` extension seam (``Predictor.java:22-37``)
with the two shipped implementations:

- :class:`LastValuePredictor` — prediction = previous value
  (``predictors/LastValuePredictor.java:10-22``; the original Gorilla
  behavior and the default everywhere).
- :class:`DifferentialFCM` — hash table of last deltas
  (``predictors/DifferentialFCM.java:23-46``).

All arithmetic is on 64-bit two's-complement values represented as Python
ints in ``[0, 2**64)`` (raw bit patterns).
"""

from __future__ import annotations

from typing import Protocol

_M64 = (1 << 64) - 1


class Predictor(Protocol):
    def update(self, value: int) -> None: ...
    def predict(self) -> int: ...


class LastValuePredictor:
    __slots__ = ("_stored",)

    def __init__(self) -> None:
        self._stored = 0

    def update(self, value: int) -> None:
        self._stored = value & _M64

    def predict(self) -> int:
        return self._stored


def _s64(x: int) -> int:
    """Reinterpret a uint64 bit pattern as a signed 64-bit int."""
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


class DifferentialFCM:
    """Differential Finite Context Method predictor
    (``predictors/DifferentialFCM.java:23-46``).

    Table size is rounded up to the next power of two exactly as the
    reference does (``1 << (64 - numberOfLeadingZeros(size-1))``), the hash
    is ``((lastHash << 5) ^ ((value - lastValue) >> 50)) & mask`` with Java
    *arithmetic* (sign-preserving) shift on the 64-bit delta, and prediction
    is ``table[lastHash] + lastValue`` with 64-bit wraparound.
    """

    __slots__ = ("_table", "_mask", "_last_value", "_last_hash")

    def __init__(self, size: int) -> None:
        if size <= 0:
            raise ValueError("Size must be positive")
        size -= 1
        bit_len = size.bit_length()  # 64 - numberOfLeadingZeros(size)
        new_size = 1 << bit_len
        self._table = [0] * new_size
        self._mask = new_size - 1
        self._last_value = 0
        self._last_hash = 0

    def update(self, value: int) -> None:
        value &= _M64
        delta = (value - self._last_value) & _M64
        self._table[self._last_hash] = delta
        # Java: (int)(((lastHash << 5) ^ ((value - lastValue) >> 50)) & mask)
        self._last_hash = ((self._last_hash << 5) ^ (_s64(delta) >> 50)) & self._mask
        self._last_value = value

    def predict(self) -> int:
        return (self._table[self._last_hash] + self._last_value) & _M64
