// Native FLAC decoder for the data-prep / raw-audio loaders.
//
// (reference: the upstream recipe shells out to the external `flac` CLI in
// egs/librispeech/local/data_prep.sh ("flac -c -d -s %s.flac |") and feeds
// the decoded WAV through Kaldi pipes.  This framework decodes FLAC
// natively instead, so LibriSpeech-style corpora are readable with zero
// external tools.  Clean-room implementation from the FLAC bitstream
// format; no reference code involved.)
//
// Exposed C ABI (ctypes):
//   flac_decode_file(path, &samples, &nframes, &channels, &rate, &bits)
//     -> 0 on success; samples is a malloc'd interleaved int32 buffer that
//        the caller must release with flac_free().
//   flac_decode_buffer(data, size, ...) — same, from an in-memory stream
//     (used for decoding piped / archived content).
//   flac_free(ptr)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB-first within the current byte
  bool overrun = false;

  explicit BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) { overrun = true; return 0; }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    return b;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    // Fast byte-aligned path for whole bytes.
    while (n >= 8 && bit_pos == 0) {
      if (byte_pos >= size) { overrun = true; return 0; }
      v = (v << 8) | data[byte_pos++];
      n -= 8;
    }
    while (n-- > 0) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
  }

  // Unary: count of 0 bits before the terminating 1.
  uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      if (byte_pos >= size) { overrun = true; return q; }
      // Scan remaining bits of current byte at once.
      uint8_t rest = (uint8_t)(data[byte_pos] << bit_pos);
      if (rest == 0) {
        q += 8 - bit_pos;
        bit_pos = 0;
        ++byte_pos;
        continue;
      }
      int lead = __builtin_clz((uint32_t)rest) - 24;  // zeros in this byte
      q += lead;
      bit_pos += lead + 1;  // consume the zeros and the 1
      if (bit_pos >= 8) { bit_pos -= 8; ++byte_pos; }
      return q;
    }
  }

  void align_byte() {
    if (bit_pos) { bit_pos = 0; ++byte_pos; }
  }
};

// Extended UTF-8-style coded number in frame headers (up to 36 bits).
bool read_coded_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra;
  uint64_t v;
  if ((b0 & 0x80u) == 0)        { *out = b0; return true; }
  else if ((b0 & 0xE0u) == 0xC0u) { extra = 1; v = b0 & 0x1Fu; }
  else if ((b0 & 0xF0u) == 0xE0u) { extra = 2; v = b0 & 0x0Fu; }
  else if ((b0 & 0xF8u) == 0xF0u) { extra = 3; v = b0 & 0x07u; }
  else if ((b0 & 0xFCu) == 0xF8u) { extra = 4; v = b0 & 0x03u; }
  else if ((b0 & 0xFEu) == 0xFCu) { extra = 5; v = b0 & 0x01u; }
  else if (b0 == 0xFEu)           { extra = 6; v = 0; }
  else return false;
  for (int i = 0; i < extra; ++i) {
    uint32_t b = (uint32_t)br.read_bits(8);
    if ((b & 0xC0u) != 0x80u) return false;
    v = (v << 6) | (b & 0x3Fu);
  }
  *out = v;
  return true;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits = 0;
  uint64_t total_samples = 0;
};

// Residual of one subframe: Rice-coded partitions.
bool read_residual(BitReader& br, uint32_t blocksize, uint32_t order,
                   std::vector<int64_t>& x) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xFu : 0x1Fu;
  uint32_t porder = (uint32_t)br.read_bits(4);
  uint32_t parts = 1u << porder;
  if (blocksize % parts != 0) return false;
  uint32_t part_len = blocksize / parts;
  if (part_len < order) return false;  // first partition would underflow
  size_t idx = order;
  for (uint32_t p = 0; p < parts; ++p) {
    uint32_t n = part_len - (p == 0 ? order : 0);
    uint32_t param = (uint32_t)br.read_bits(param_bits);
    if (param == escape) {
      uint32_t raw = (uint32_t)br.read_bits(5);
      for (uint32_t i = 0; i < n; ++i)
        x[idx++] = raw ? br.read_signed(raw) : 0;
    } else {
      for (uint32_t i = 0; i < n; ++i) {
        uint64_t q = br.read_unary();
        uint64_t r = br.read_bits((int)param);
        uint64_t u = (q << param) | r;
        x[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);  // zigzag
      }
    }
    if (br.overrun) return false;
  }
  return idx == blocksize;
}

// Decode one subframe into x (length blocksize), at effective bps.
bool read_subframe(BitReader& br, uint32_t blocksize, int bps,
                   std::vector<int64_t>& x) {
  if (br.read_bits(1) != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bits(1)) {  // wasted-bits flag: unary k-1 follows
    wasted = 1 + (int)br.read_unary();
  }
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (uint32_t i = 0; i < blocksize; ++i) x[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < blocksize; ++i) x[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0..4
    uint32_t order = type - 8;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) x[i] = br.read_signed(bps);
    if (!read_residual(br, blocksize, order, x)) return false;
    switch (order) {
      case 0: break;
      case 1:
        for (uint32_t i = 1; i < blocksize; ++i) x[i] += x[i - 1];
        break;
      case 2:
        for (uint32_t i = 2; i < blocksize; ++i)
          x[i] += 2 * x[i - 1] - x[i - 2];
        break;
      case 3:
        for (uint32_t i = 3; i < blocksize; ++i)
          x[i] += 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3];
        break;
      case 4:
        for (uint32_t i = 4; i < blocksize; ++i)
          x[i] += 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4];
        break;
      default: return false;
    }
  } else if (type >= 32) {  // LPC, order 1..32
    uint32_t order = (type & 31u) + 1;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) x[i] = br.read_signed(bps);
    uint32_t prec = (uint32_t)br.read_bits(4);
    if (prec == 15) return false;  // reserved
    ++prec;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (uint32_t i = 0; i < order; ++i) coef[i] = br.read_signed((int)prec);
    if (!read_residual(br, blocksize, order, x)) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j) acc += coef[j] * x[i - 1 - j];
      x[i] += acc >> shift;
    }
  } else {
    return false;  // reserved subframe type
  }
  if (wasted)
    for (uint32_t i = 0; i < blocksize; ++i)
      x[i] = (int64_t)((uint64_t)x[i] << wasted);
  return !br.overrun;
}

int decode_stream(const uint8_t* data, size_t size, int32_t** out_samples,
                  int64_t* out_nframes, int32_t* out_channels,
                  int32_t* out_rate, int32_t* out_bits) {
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return -2;
  BitReader br(data, size);
  br.byte_pos = 4;

  StreamInfo si;
  bool have_si = false;
  for (;;) {  // metadata blocks
    if (br.eof()) return -3;
    uint32_t hdr = (uint32_t)br.read_bits(8);
    bool last = (hdr & 0x80u) != 0;
    uint32_t btype = hdr & 0x7Fu;
    uint32_t blen = (uint32_t)br.read_bits(24);
    if (btype == 0) {  // STREAMINFO
      br.read_bits(16);  // min blocksize
      br.read_bits(16);  // max blocksize
      br.read_bits(24);  // min framesize
      br.read_bits(24);  // max framesize
      si.sample_rate = (uint32_t)br.read_bits(20);
      si.channels = (uint32_t)br.read_bits(3) + 1;
      si.bits = (uint32_t)br.read_bits(5) + 1;
      si.total_samples = br.read_bits(36);
      br.byte_pos += 16;  // MD5
      have_si = true;
    } else {
      br.byte_pos += blen;
    }
    if (last) break;
  }
  if (!have_si || br.overrun || si.channels < 1 || si.channels > 8)
    return -3;

  std::vector<int32_t> pcm;
  if (si.total_samples)
    pcm.reserve((size_t)si.total_samples * si.channels);

  std::vector<std::vector<int64_t>> chan(si.channels);

  while (!br.eof() && !br.overrun) {
    // Frame header (byte-aligned).
    if (br.byte_pos + 2 > size) break;
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.eof() && sync == 0) break;  // trailing padding
    if (sync != 0x3FFEu) return -4;
    br.read_bits(1);                       // reserved
    br.read_bits(1);                       // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bits(1);                       // reserved
    uint64_t coded_num;
    if (!read_coded_number(br, &coded_num)) return -4;

    uint32_t blocksize;
    switch (bs_code) {
      case 0: return -4;  // reserved
      case 1: blocksize = 192; break;
      case 6: blocksize = (uint32_t)br.read_bits(8) + 1; break;
      case 7: blocksize = (uint32_t)br.read_bits(16) + 1; break;
      default:
        blocksize = bs_code <= 5 ? (576u << (bs_code - 2))
                                 : (256u << (bs_code - 8));
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    else if (sr_code == 15) return -4;
    br.read_bits(8);  // header CRC-8 (not verified)

    int bps;
    switch (ss_code) {
      case 0: bps = (int)si.bits; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -4;
    }

    uint32_t nch;
    int side_ch = -1;  // which channel carries the +1-bit side signal
    if (ch_code <= 7) {
      nch = ch_code + 1;
    } else if (ch_code == 8) { nch = 2; side_ch = 1; }  // left/side
    else if (ch_code == 9) { nch = 2; side_ch = 0; }    // side/right
    else if (ch_code == 10) { nch = 2; side_ch = 1; }   // mid/side
    else return -4;
    if (nch != si.channels) return -4;

    for (uint32_t c = 0; c < nch; ++c) {
      chan[c].assign(blocksize, 0);
      int cb = bps + ((int)c == side_ch ? 1 : 0);
      if (!read_subframe(br, blocksize, cb, chan[c])) return -5;
    }
    br.align_byte();
    br.read_bits(16);  // frame CRC-16 (not verified)
    if (br.overrun) return -5;

    // Undo stereo decorrelation.
    if (ch_code == 8) {         // left/side: right = left - side
      for (uint32_t i = 0; i < blocksize; ++i)
        chan[1][i] = chan[0][i] - chan[1][i];
    } else if (ch_code == 9) {  // side/right: left = side + right
      for (uint32_t i = 0; i < blocksize; ++i)
        chan[0][i] = chan[0][i] + chan[1][i];
    } else if (ch_code == 10) { // mid/side
      for (uint32_t i = 0; i < blocksize; ++i) {
        int64_t side = chan[1][i];
        int64_t m2 = (chan[0][i] << 1) | (side & 1);
        chan[0][i] = (m2 + side) >> 1;
        chan[1][i] = (m2 - side) >> 1;
      }
    }

    size_t base = pcm.size();
    pcm.resize(base + (size_t)blocksize * nch);
    for (uint32_t i = 0; i < blocksize; ++i)
      for (uint32_t c = 0; c < nch; ++c)
        pcm[base + (size_t)i * nch + c] = (int32_t)chan[c][i];

    if (si.total_samples &&
        pcm.size() >= si.total_samples * si.channels) {
      pcm.resize((size_t)si.total_samples * si.channels);
      break;  // ignore trailing padding after the last frame
    }
  }

  int64_t nframes = (int64_t)(pcm.size() / si.channels);
  int32_t* buf = (int32_t*)malloc(pcm.size() * sizeof(int32_t));
  if (!buf && !pcm.empty()) return -6;
  memcpy(buf, pcm.data(), pcm.size() * sizeof(int32_t));
  *out_samples = buf;
  *out_nframes = nframes;
  *out_channels = (int32_t)si.channels;
  *out_rate = (int32_t)si.sample_rate;
  *out_bits = (int32_t)si.bits;
  return 0;
}

}  // namespace

extern "C" {

int flac_decode_buffer(const uint8_t* data, int64_t size,
                       int32_t** out_samples, int64_t* out_nframes,
                       int32_t* out_channels, int32_t* out_rate,
                       int32_t* out_bits) {
  return decode_stream(data, (size_t)size, out_samples, out_nframes,
                       out_channels, out_rate, out_bits);
}

int flac_decode_file(const char* path, int32_t** out_samples,
                     int64_t* out_nframes, int32_t* out_channels,
                     int32_t* out_rate, int32_t* out_bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)sz);
  if (sz > 0 && fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -1;
  }
  fclose(f);
  return decode_stream(buf.data(), buf.size(), out_samples, out_nframes,
                       out_channels, out_rate, out_bits);
}

void flac_free(int32_t* p) { free(p); }

}  // extern "C"
