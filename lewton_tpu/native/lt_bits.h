// Bit-level primitives: LSb-first bit cursor + canonical Huffman decode.
//
// Host half of the TPU framework (SURVEY.md §7): entropy decode is
// inherently bit-serial, so it runs native and emits dense tensors.
// Independent implementation from the Vorbis I spec §2 (bit packing) and
// §3.2.1 (codebook codeword assignment); behavioral parity with the
// reference reader (lewton src/bitpacking.rs, src/huffman_tree.rs).
#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace lt {

// End-of-packet is *data* in Vorbis (floors/residues stop cleanly), so the
// cursor reports EOP via return codes, never exceptions.
class BitCursor {
 public:
  BitCursor(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  // Read n<=32 bits LSb-first. Returns false on end-of-packet (cursor
  // position then undefined for further reads, matching the reference's
  // "EOP is terminal" use).
  bool read(uint32_t n, uint32_t* out) {
    uint64_t avail_bits = (uint64_t)(len_ - byte_) * 8 - bit_;
    if (n > avail_bits) return false;
    uint32_t v = 0;
    uint32_t got = 0;
    while (got < n) {
      uint32_t take = 8 - bit_;
      if (take > n - got) take = n - got;
      uint32_t chunk = (uint32_t)(data_[byte_] >> bit_) & ((1u << take) - 1u);
      v |= chunk << got;
      got += take;
      bit_ += take;
      if (bit_ == 8) {
        bit_ = 0;
        ++byte_;
      }
    }
    *out = v;
    return true;
  }

  bool read_flag(bool* out) {
    uint32_t v;
    if (!read(1, &v)) return false;
    *out = v != 0;
    return true;
  }

  bool read_i32(uint32_t n, int32_t* out) {  // sign-extend an n-bit field
    uint32_t v;
    if (!read(n, &v)) return false;
    if (n < 32 && (v & (1u << (n - 1)))) v |= ~((1u << n) - 1u);
    *out = (int32_t)v;
    return true;
  }

  // Vorbis float32 unpack (spec §2.1.9): 1 sign, 10-bit exponent biased
  // 788, 21-bit mantissa.
  bool read_vorbis_float(float* out) {
    uint32_t x;
    if (!read(32, &x)) return false;
    double mant = (double)(x & 0x1fffff);
    if (x & 0x80000000u) mant = -mant;
    int32_t exp = (int32_t)((x >> 21) & 0x3ff) - 788;
    *out = (float)ldexp(mant, exp);
    return true;
  }

  // Peek up to n bits without consuming (zero-padded past EOP).
  uint32_t peek(uint32_t n) const {
    uint32_t v = 0;
    size_t byte = byte_;
    uint32_t bit = bit_;
    uint32_t got = 0;
    while (got < n && byte < len_) {
      uint32_t take = 8 - bit;
      if (take > n - got) take = n - got;
      uint32_t chunk = (uint32_t)(data_[byte] >> bit) & ((1u << take) - 1u);
      v |= chunk << got;
      got += take;
      bit += take;
      if (bit == 8) {
        bit = 0;
        ++byte;
      }
    }
    return v;
  }

  void advance(uint32_t n) {
    uint64_t pos = (uint64_t)byte_ * 8 + bit_ + n;
    byte_ = (size_t)(pos >> 3);
    bit_ = (uint32_t)(pos & 7);
  }

  uint64_t bits_remaining() const {
    return (uint64_t)(len_ - byte_) * 8 - bit_;
  }

 private:
  const uint8_t* data_;
  size_t len_;
  size_t byte_ = 0;
  uint32_t bit_ = 0;
};

// Canonical Huffman decoder. Codewords are assigned in spec §3.2.1 order
// (first-fit left-aligned); decode uses a primary lookup table over the
// next LUT_BITS bits (in read order, i.e. reversed codeword bits) with a
// bit-by-bit fallback for longer codes.
class Huffman {
 public:
  static constexpr uint32_t LUT_BITS = 10;

  // lengths[i] == 0 means entry i is unused. Returns false (and sets *err)
  // on over/under-specified trees. Single-entry codebooks follow the
  // reference quirk: one 1-bit codeword, any bit decodes to that entry.
  bool build(const std::vector<uint8_t>& lengths, std::string* err);

  bool empty() const { return n_codes_ == 0; }

  // Decode one scalar; false on EOP or (impossible for valid trees)
  // unmatched prefix.
  bool decode(BitCursor* cur, uint32_t* out) const {
    if (single_entry_) {  // any 1-bit input decodes to the entry (ref quirk)
      uint32_t b;
      if (!cur->read(1, &b)) return false;
      *out = single_value_;
      return true;
    }
    uint32_t p = cur->peek(LUT_BITS);
    int32_t e = lut_[p];
    if (e >= 0) {
      uint32_t len = (uint32_t)(e & 31);
      if (cur->bits_remaining() < len) return false;  // EOP mid-codeword
      cur->advance(len);
      *out = (uint32_t)(e >> 5);
      return true;
    }
    // overflow path: codes longer than LUT_BITS, walk from scratch
    return decode_slow(cur, out);
  }

 private:
  bool decode_slow(BitCursor* cur, uint32_t* out) const;

  // primary table: >=0 -> (value << 5) | length; -1 -> long-code fallback
  std::vector<int32_t> lut_;
  // sorted (codeword aligned to 32 bits, length, value) for the slow path
  struct Code {
    uint32_t word;  // MSB-aligned codeword
    uint8_t len;
    uint32_t value;
  };
  std::vector<Code> codes_;  // sorted by word
  uint32_t n_codes_ = 0;
  bool single_entry_ = false;
  uint32_t single_value_ = 0;
};

}  // namespace lt
