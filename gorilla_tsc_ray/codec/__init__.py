"""Bit-exact Gorilla time-series codecs (streaming + vectorized)."""

from .bits import (BitReader, BitWriter, ByteBitReader, ByteBitWriter,
                   bytes_to_words, words_to_bytes)
from .predictors import DifferentialFCM, LastValuePredictor, Predictor
from .stream import (
    CompressorV1,
    DecompressorV1,
    GorillaCompressor,
    GorillaDecompressor,
    bits_to_double,
    bits_to_long,
    double_to_bits,
    long_to_bits,
)
from .vectorized import (
    decode_series,
    encode_series,
    encode_series_auto,
    payload_to_words,
    words_to_payload,
)

__all__ = [
    "BitReader", "BitWriter", "ByteBitReader", "ByteBitWriter",
    "bytes_to_words", "words_to_bytes",
    "DifferentialFCM", "LastValuePredictor", "Predictor",
    "GorillaCompressor", "GorillaDecompressor", "CompressorV1", "DecompressorV1",
    "double_to_bits", "bits_to_double", "long_to_bits", "bits_to_long",
    "encode_series", "encode_series_auto", "decode_series", "words_to_payload", "payload_to_words",
]
