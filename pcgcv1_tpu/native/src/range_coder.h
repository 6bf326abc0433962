// Byte-oriented range coder, 16-bit symbol frequencies.
//
// TPU-native replacement for the reference's host-side arithmetic coder
// (the TF contrib `coder_ops.range_encode/range_decode` C++ kernels imported
// at models/entropy_model.py:6 in NJUVISION/PCGCv1). Same capability —
// encode integer symbols against quantized CDFs with total 2^16 — with a
// clean-room LZMA-style carry-cached implementation. The emitted bytes are
// our own format (the reference's TF byte format is not a compatibility
// target; no TF checkpoints or streams ship with it).
//
// Contract: cdf totals are exactly 1<<16 and every symbol has frequency
// >= 1. Encoder and decoder must see bit-identical CDFs (guaranteed by
// det_math.h evaluation).

#ifndef PCGC_RANGE_CODER_H_
#define PCGC_RANGE_CODER_H_

#include <cstdint>
#include <cstring>
#include <vector>

namespace pcgc {

constexpr uint32_t kProbBits = 16;
constexpr uint32_t kProbTotal = 1u << kProbBits;
constexpr uint32_t kTopValue = 1u << 24;

class RangeEncoder {
 public:
  explicit RangeEncoder(std::vector<uint8_t>* out) : out_(out) {}

  // Encode a symbol occupying [cum, cum+freq) of the 2^16 interval.
  inline void Encode(uint32_t cum, uint32_t freq) {
    uint32_t r = range_ >> kProbBits;
    low_ += static_cast<uint64_t>(r) * cum;
    range_ = r * freq;
    while (range_ < kTopValue) {
      ShiftLow();
      range_ <<= 8;
    }
  }

  // Binary symbol with probability-of-zero p0 (16-bit). bit==0 takes
  // [0, p0), bit==1 takes [p0, total).
  inline void EncodeBit(int bit, uint32_t p0) {
    if (bit)
      Encode(p0, kProbTotal - p0);
    else
      Encode(0, p0);
  }

  void Finish() {
    for (int i = 0; i < 5; ++i) ShiftLow();
  }

 private:
  // LZMA-style carry-cached byte emission. The first emitted byte is a
  // dummy 0 (or 1 after a carry) that absorbs carry propagation out of the
  // 32-bit window; the decoder discards it.
  inline void ShiftLow() {
    if (static_cast<uint32_t>(low_) < 0xFF000000u ||
        static_cast<int>(low_ >> 32) != 0) {
      uint8_t carry = static_cast<uint8_t>(low_ >> 32);
      out_->push_back(cache_ + carry);
      for (; pending_ > 0; --pending_)
        out_->push_back(static_cast<uint8_t>(0xFF + carry));
      cache_ = static_cast<uint8_t>(low_ >> 24);
    } else {
      ++pending_;
    }
    low_ = (low_ << 8) & 0xFFFFFFFFull;
  }

  std::vector<uint8_t>* out_;
  uint64_t low_ = 0;
  uint32_t range_ = 0xFFFFFFFFu;
  uint8_t cache_ = 0;
  uint64_t pending_ = 0;
};

class RangeDecoder {
 public:
  RangeDecoder(const uint8_t* buf, size_t n) : buf_(buf), n_(n) {
    // Mirror of Finish(): first emitted byte corresponds to the initial
    // cache (always 0 via the first ShiftLow); prime 4 payload bytes.
    NextByte();  // discard leading cache byte
    for (int i = 0; i < 4; ++i) code_ = (code_ << 8) | NextByte();
  }

  // Returns the 16-bit interval position of the next symbol; the caller
  // locates symbol s with cdf[s] <= pos < cdf[s+1] then calls Consume.
  inline uint32_t Peek() {
    r_ = range_ >> kProbBits;
    uint32_t pos = static_cast<uint32_t>(code_ / r_);
    return pos >= kProbTotal ? kProbTotal - 1 : pos;
  }

  inline void Consume(uint32_t cum, uint32_t freq) {
    code_ -= static_cast<uint64_t>(r_) * cum;
    range_ = r_ * freq;
    while (range_ < kTopValue) {
      code_ = (code_ << 8) | NextByte();
      range_ <<= 8;
    }
  }

  inline int DecodeBit(uint32_t p0) {
    uint32_t pos = Peek();
    int bit = pos >= p0;
    if (bit)
      Consume(p0, kProbTotal - p0);
    else
      Consume(0, p0);
    return bit;
  }

 private:
  inline uint8_t NextByte() { return pos_ < n_ ? buf_[pos_++] : 0; }

  const uint8_t* buf_;
  size_t n_;
  size_t pos_ = 0;
  uint64_t code_ = 0;
  uint32_t range_ = 0xFFFFFFFFu;
  uint32_t r_ = 0;
};

// Adaptive binary probability model (12-bit shift update) for the octree
// occupancy coder.
struct BitModel {
  uint32_t p0 = kProbTotal / 2;
  static constexpr int kMoveBits = 5;
  inline void Update(int bit) {
    if (bit)
      p0 -= p0 >> kMoveBits;
    else
      p0 += (kProbTotal - p0) >> kMoveBits;
    // keep within [64, total-64] so freq >= 64 both sides
    if (p0 < 64) p0 = 64;
    if (p0 > kProbTotal - 64) p0 = kProbTotal - 64;
  }
};

}  // namespace pcgc

#endif  // PCGC_RANGE_CODER_H_
