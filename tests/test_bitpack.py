"""Bit-level primitive tests (Vorbis I spec section 2 semantics).

Parity targets: lewton src/bitpacking.rs inline tests (spec vectors,
empty-read semantics, float32_unpack).
"""

import pytest

from lewton_tpu.bitpack import BitCursor, bit_reverse, float32_unpack, ilog
from lewton_tpu.errors import EndOfPacket
from lewton_tpu.utils.bitwriter import BitWriter


def test_ilog_spec_vectors():
    # Vorbis I spec section 9.2.1 examples.
    assert ilog(0) == 0
    assert ilog(1) == 1
    assert ilog(2) == 2
    assert ilog(3) == 2
    assert ilog(4) == 3
    assert ilog(7) == 3
    assert ilog(-1) == 0
    assert ilog(-7) == 0


def test_bit_reverse():
    assert bit_reverse(0) == 0
    assert bit_reverse(1) == 0x80000000
    assert bit_reverse(0x80000000) == 1
    assert bit_reverse(0xFFFFFFFF) == 0xFFFFFFFF
    assert bit_reverse(0b1010) == 0b0101 << 28


def test_lsb_first_reads():
    # Spec section 2.1: bits fill each octet LSb first.
    # 0b0011_1100 -> reading 2,4,2 bits yields 0b00, 0b1111, 0b00
    cur = BitCursor(bytes([0b00111100]))
    assert cur.read_bits(2) == 0b00
    assert cur.read_bits(4) == 0b1111
    assert cur.read_bits(2) == 0b00
    assert cur.at_end()


def test_octet_straddling():
    cur = BitCursor(bytes([0xFF, 0x01]))
    assert cur.read_bits(4) == 0xF
    assert cur.read_bits(8) == 0x1F  # low 4 ones from byte0, then 0x01 low bits
    assert cur.read_bits(4) == 0x0
    assert cur.at_end()


def test_wide_reads():
    cur = BitCursor(bytes([0x78, 0x56, 0x34, 0x12, 0xFF]))
    assert cur.read_bits(32) == 0x12345678
    assert cur.read_bits(8) == 0xFF


def test_signed_reads():
    w = BitWriter().write_bits((-3) & 0x7F, 7).write_bits(5, 7)
    cur = BitCursor(w.getvalue())
    assert cur.read_signed_bits(7) == -3
    assert cur.read_signed_bits(7) == 5


def test_zero_bit_read_at_end():
    # Reading 0 bits succeeds even on an empty packet (reference semantics,
    # lewton src/bitpacking.rs:516-538).
    cur = BitCursor(b"")
    assert cur.read_bits(0) == 0
    with pytest.raises(EndOfPacket):
        cur.read_bits(1)


def test_end_of_packet():
    cur = BitCursor(bytes([0xAA]))
    assert cur.read_bits(7) == 0x2A
    with pytest.raises(EndOfPacket):
        cur.read_bits(2)
    # the failed read must not have consumed the remaining bit state
    # (the reference's cursor is unusable after Err; we keep it readable)
    assert cur.read_bits(1) == 1


def test_float32_unpack():
    # exponent bias 788: mantissa m, exponent e -> m * 2^(e-788)
    def pack(sign, exp, mant):
        return (sign << 31) | (exp << 21) | mant

    assert float32_unpack(pack(0, 788, 1)) == 1.0
    assert float32_unpack(pack(0, 789, 3)) == 6.0
    assert float32_unpack(pack(1, 788, 5)) == -5.0
    assert float32_unpack(pack(0, 787, 1)) == 0.5
    assert float32_unpack(pack(0, 0, 0)) == 0.0


def test_roundtrip_random():
    import random

    rng = random.Random(1234)
    widths, vals = [], []
    w = BitWriter()
    for _ in range(1000):
        n = rng.randint(0, 32)
        v = rng.getrandbits(n) if n else 0
        widths.append(n)
        vals.append(v)
        w.write_bits(v, n)
    cur = BitCursor(w.getvalue())
    for n, v in zip(widths, vals):
        assert cur.read_bits(n) == v


def test_peek_and_advance():
    cur = BitCursor(bytes([0b10110100, 0xFF]))
    v, got = cur.peek_bits(8)
    assert (v, got) == (0b10110100, 8)
    cur.advance(3)
    v, got = cur.peek_bits(8)
    assert got == 8
    assert v == ((0b10110100 >> 3) | (0xFF << 5)) & 0xFF
    # peeking past the end returns what's available
    cur.advance(8)
    v, got = cur.peek_bits(8)
    assert got == 5
    assert v == 0b11111
