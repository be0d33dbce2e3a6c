"""Huffman codebook tests (Vorbis I spec section 3.2.1).

Parity targets: lewton src/huffman_tree.rs inline tests (spec example,
under/over-specified, single entry, decode through the bit cursor).
"""

import random

import pytest

from lewton_tpu.bitpack import BitCursor
from lewton_tpu.errors import EndOfPacket, HuffmanError
from lewton_tpu.huffman import HuffmanTree, assign_codewords
from lewton_tpu.utils.bitwriter import BitWriter

SPEC_LENGTHS = [2, 4, 4, 4, 4, 2, 3, 3]
SPEC_CODES = [
    (0b00, 2),
    (0b0100, 4),
    (0b0101, 4),
    (0b0110, 4),
    (0b0111, 4),
    (0b10, 2),
    (0b110, 3),
    (0b111, 3),
]


def test_spec_example_assignment():
    assert assign_codewords(SPEC_LENGTHS) == SPEC_CODES


def test_overspecified_rejected():
    with pytest.raises(HuffmanError):
        assign_codewords([1, 1, 1])
    with pytest.raises(HuffmanError):
        assign_codewords([2, 2, 2, 2, 2])


def test_underpopulated_rejected():
    with pytest.raises(HuffmanError):
        assign_codewords([1, 2])  # leaves half of depth-2 unassigned
    with pytest.raises(HuffmanError):
        assign_codewords([2, 2, 2])


def test_single_entry():
    t = HuffmanTree([1])
    # any single bit decodes entry 0 (spec errata; lewton :202-217)
    for byte in (0b0, 0b1):
        cur = BitCursor(bytes([byte]))
        assert cur.read_huffman(t) == 0
        assert cur.bits_consumed() == 1


def test_single_entry_invalid_length():
    with pytest.raises(HuffmanError):
        HuffmanTree([3])
    with pytest.raises(HuffmanError):
        HuffmanTree([0, 2, 0])


def test_sparse_entries():
    # unused entries (length 0) get no codewords
    codes = assign_codewords([0, 1, 0, 1, 0])
    assert codes[0] is None and codes[2] is None and codes[4] is None
    assert codes[1] == (0, 1) and codes[3] == (1, 1)


def test_decode_spec_example():
    t = HuffmanTree(SPEC_LENGTHS)
    seq = [0, 5, 7, 2, 6, 1, 4, 3, 0, 5]
    w = BitWriter()
    for e in seq:
        code, l = SPEC_CODES[e]
        w.write_huffman(code, l)
    cur = BitCursor(w.getvalue() + b"\x00")  # pad so LUT peeks see 8 bits
    for e in seq:
        assert cur.read_huffman(t) == e


def test_decode_long_codes():
    # lengths up to 20 bits: exercises LUT fallback into tree descent
    lengths = [1] + [i for i in range(2, 21)] + [20]
    t = HuffmanTree(lengths)
    codes = t.codes
    seq = [0, 5, 19, 20, 1, 20, 10, 0]
    w = BitWriter()
    for e in seq:
        code, l = codes[e]
        w.write_huffman(code, l)
    cur = BitCursor(w.getvalue() + b"\x00\x00\x00")
    for e in seq:
        assert cur.read_huffman(t) == e


def test_decode_near_packet_end():
    # a codeword ending exactly at packet end must decode (no 8-bit peek)
    t = HuffmanTree(SPEC_LENGTHS)
    w = BitWriter().write_huffman(0b111, 3)
    cur = BitCursor(w.getvalue()[:1])
    assert cur.read_huffman(t) == 7
    # and a truncated codeword must raise EndOfPacket:
    # leave exactly 2 bits "0,1" — the prefix of the 4-bit codewords
    cur2 = BitCursor(bytes([0b10000000]))
    cur2.read_bits(6)  # consume pad; remaining stream bits: 0 then 1
    with pytest.raises(EndOfPacket):
        cur2.read_huffman(t)


def test_randomized_roundtrip():
    rng = random.Random(99)
    for trial in range(30):
        # build a random full tree by splitting leaves
        lengths = [1, 1]
        for _ in range(rng.randint(0, 60)):
            i = rng.randrange(len(lengths))
            l = lengths[i]
            if l >= 30:
                continue
            lengths[i] = l + 1
            lengths.insert(i + 1, l + 1)
        perm = list(range(len(lengths)))
        rng.shuffle(perm)
        shuffled = [lengths[p] for p in perm]
        t = HuffmanTree(shuffled)
        seq = [rng.randrange(len(shuffled)) for _ in range(200)]
        w = BitWriter()
        for e in seq:
            code, l = t.codes[e]
            w.write_huffman(code, l)
        cur = BitCursor(w.getvalue() + b"\x00" * 4)
        for e in seq:
            assert cur.read_huffman(t) == e
