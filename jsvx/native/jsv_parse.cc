// jsvx native bitstream front-end: slice/macroblock/block VLC parsing.
//
// The serial Huffman walk is the one stage of JSV decode that cannot run on
// the TPU (SURVEY.md section 7 "hard parts"); the reference runs it in
// JavaScript (decoders/jsv.js:683-1525).  This is the optimized host
// implementation: LUT-driven multi-bit decode into caller-provided dense
// planes, one call per picture.  The Python parser in
// jsvx/bitstream/parser.py is the executable specification; outputs must be
// bit-identical (tests/test_native_parser.py fuzzes the equivalence).
//
// VLC lookup tables are passed in from Python at session creation so the
// code tables live in exactly one place (jsvx/coding/tables.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Lut {
  std::vector<int32_t> value;
  std::vector<uint8_t> length;
  int bits = 0;

  void set(const int32_t* v, const uint8_t* l, int b) {
    bits = b;
    value.assign(v, v + (size_t(1) << b));
    length.assign(l, l + (size_t(1) << b));
  }
};

constexpr int kErrStall = -1;      // ran past end of picture span
constexpr int kErrBadCode = -2;    // invalid VLC code
constexpr int kErrOverrun = -3;    // macroblock address out of range

struct BitReader {
  const uint8_t* data;
  int64_t n_bits;
  int64_t pos = 0;
  bool bad = false;

  BitReader(const uint8_t* d, int64_t n_bytes)
      : data(d), n_bits(n_bytes * 8) {}

  inline uint64_t peek_word() const {
    // 57+ bits valid from pos; zero-pad past the end.
    int64_t byte = pos >> 3;
    uint64_t w = 0;
    int64_t avail = (n_bits >> 3) - byte;
    if (avail >= 8) {
      std::memcpy(&w, data + byte, 8);
      w = __builtin_bswap64(w);
    } else {
      for (int64_t i = 0; i < avail; ++i)
        w |= uint64_t(data[byte + i]) << (56 - 8 * i);
    }
    return w << (pos & 7);
  }

  inline uint32_t peek(int bits) const {
    return uint32_t(peek_word() >> (64 - bits));
  }

  inline uint32_t get(int bits) {
    if (pos + bits > n_bits) { bad = true; return 0; }
    uint32_t v = peek(bits);
    pos += bits;
    return v;
  }

  inline void skip(int bits) { pos += bits; if (pos > n_bits) bad = true; }

  inline int32_t vlc(const Lut& t) {
    uint32_t p = peek(t.bits);
    uint8_t len = t.length[p];
    if (len == 0 || pos + len > n_bits) { bad = true; return 0; }
    pos += len;
    return t.value[p];
  }
};

struct Parser {
  Lut addr, type_i, type_p, cbp, motion, dc_lum, dc_chrom, coeff;
  uint8_t zigzag[64];
  uint8_t zigzag_inv[64];   // spatial position -> scan index
};

struct SliceState {
  int32_t quantizer_scale = 0;
  int32_t dc_y = 128, dc_cb = 128, dc_cr = 128, dc_a = 128;
  int32_t motion_h = 0, motion_v = 0;
  int32_t motion_h_prev = 0, motion_v_prev = 0;

  void reset_dc() { dc_y = dc_cb = dc_cr = dc_a = 128; }
  void reset_mv() { motion_h = motion_v = motion_h_prev = motion_v_prev = 0; }
};

struct PictureOut {
  // per-component coefficient planes; [3] = alpha (YUVA, full-res)
  int16_t* levels[4] = {nullptr, nullptr, nullptr, nullptr};
  // per-component last-non-zero: Y/A at (2*mbH, 2*mbW), chroma (mbH, mbW)
  uint8_t* lnz[4] = {nullptr, nullptr, nullptr, nullptr};
  uint8_t* mb_quant;
  uint8_t* mb_intra;
  int16_t* mb_mv;     // (mbH, mbW, 2) = (vy, vx)
  uint8_t* mb_rep_add;
  // optional device-ready per-pixel dequant sideband (may be null):
  //   mult  = quantizer_scale * quant_matrix value at this position
  //   flags = bit0 non-intra, bit1 inside coded scan range, bit2 intra DC
  int16_t* mult[4] = {nullptr, nullptr, nullptr, nullptr};
  uint8_t* flags[4] = {nullptr, nullptr, nullptr, nullptr};
  const uint8_t* intra_q = nullptr;      // 64, spatial order
  const uint8_t* non_intra_q = nullptr;
};

struct PictureCtx {
  int32_t mb_w, mb_h, coded_w;
  int32_t picture_type;    // 1 = I, 2 = P
  int32_t full_pel, f_code;
  int32_t yuva;            // 4th alpha component (4 extra blocks per MB)
};

inline int32_t decode_motion_component(BitReader& r, const Parser& p,
                                       const PictureCtx& c, int32_t& prev,
                                       bool full_pel) {
  int r_size = c.f_code - 1;
  int F = 1 << r_size;
  int32_t code = r.vlc(p.motion);
  int32_t d;
  if (code != 0 && F != 1) {
    int32_t residual = int32_t(r.get(r_size));
    d = (((code < 0 ? -code : code) - 1) << r_size) + residual + 1;
    if (code < 0) d = -d;
  } else {
    d = code;
  }
  prev += d;
  if (prev > (F << 4) - 1) prev -= F << 5;
  else if (prev < -(F << 4)) prev += F << 5;
  return full_pel ? (prev << 1) : prev;
}

// Decode one 8x8 block into its plane position; mirrors
// jsvx/bitstream/parser.py::_parse_block (spec: jsv.js:1338-1525).
inline int parse_block(BitReader& r, const Parser& p, const PictureCtx& c,
                       PictureOut& o, SliceState& s, int row, int col,
                       int block, bool intra) {
  int32_t block_data[64];
  std::memset(block_data, 0, sizeof(block_data));
  int n = 0;

  if (intra) {
    int32_t predictor, size;
    if (block < 4) {
      predictor = s.dc_y;
      size = r.vlc(p.dc_lum);
    } else if (block >= 6) {       // alpha: own predictor, luminance table
      predictor = s.dc_a;
      size = r.vlc(p.dc_lum);
    } else {
      predictor = (block == 4) ? s.dc_cb : s.dc_cr;
      size = r.vlc(p.dc_chrom);
    }
    int32_t dc;
    if (size > 0) {
      int32_t diff = int32_t(r.get(size));
      if (diff & (1 << (size - 1))) dc = predictor + diff;
      else dc = predictor + ((-1 << size) | (diff + 1));
    } else {
      dc = predictor;
    }
    block_data[0] = dc;
    if (block < 4) s.dc_y = dc;
    else if (block >= 6) s.dc_a = dc;
    else if (block == 4) s.dc_cb = dc;
    else s.dc_cr = dc;
    n = 1;
  }

  for (;;) {
    if (r.bad) return kErrStall;
    int32_t code = r.vlc(p.coeff);
    if (r.bad) return kErrBadCode;
    if (code == 0x0001 && n > 0) {
      if (r.get(1) == 0) break;  // end_of_block
    }
    int32_t run, level;
    if (code == 0xFFFF) {        // escape
      run = int32_t(r.get(6));
      level = int32_t(r.get(8));
      if (level == 0) level = int32_t(r.get(8));
      else if (level == 128) level = int32_t(r.get(8)) - 256;
      else if (level > 128) level -= 256;
    } else {
      run = code >> 8;
      level = code & 0xFF;
      if (r.get(1)) level = -level;
    }
    n += run;
    if (n > 63) break;           // corrupt stream guard
    block_data[p.zigzag[n]] = level;
    ++n;
  }

  // Place the block and record last-non-zero.
  int comp, by, bx;
  int stride;
  if (block < 4 || block >= 6) {
    comp = (block < 4) ? 0 : 3;
    int b = (block < 4) ? block : block - 6;
    by = row * 2 + ((b & 2) ? 1 : 0);
    bx = col * 2 + ((b & 1) ? 1 : 0);
    stride = c.coded_w;
  } else {
    comp = (block == 4) ? 1 : 2;
    by = row;
    bx = col;
    stride = c.coded_w >> 1;
  }
  int16_t* dst = o.levels[comp] + (int64_t)by * 8 * stride + bx * 8;
  for (int i = 0; i < 8; ++i) {
    for (int j = 0; j < 8; ++j)
      dst[j] = (int16_t)block_data[i * 8 + j];
    dst += stride;
  }
  if (o.mult[comp] != nullptr) {
    // emit the per-pixel dequant sideband in the same pass
    const uint8_t* m = intra ? o.intra_q : o.non_intra_q;
    const int32_t q = s.quantizer_scale;
    int16_t* md = o.mult[comp] + (int64_t)by * 8 * stride + bx * 8;
    uint8_t* fd = o.flags[comp] + (int64_t)by * 8 * stride + bx * 8;
    for (int i = 0; i < 8; ++i) {
      for (int j = 0; j < 8; ++j) {
        int pos = i * 8 + j;
        md[j] = (int16_t)(q * m[pos]);
        uint8_t f = intra ? 0 : 1;
        if (p.zigzag_inv[pos] < n) f |= 2;
        if (pos == 0 && intra) f |= 4;
        fd[j] = f;
      }
      md += stride;
      fd += stride;
    }
  }
  uint8_t lnz = (uint8_t)(n > 255 ? 255 : n);
  int lnz_stride = (comp == 0 || comp == 3) ? c.mb_w * 2 : c.mb_w;
  o.lnz[comp][(int64_t)by * lnz_stride + bx] = lnz;
  return 0;
}

// Mirrors jsvx/bitstream/parser.py::_parse_macroblock (jsv.js:725-828).
inline int parse_macroblock(BitReader& r, const Parser& p,
                            const PictureCtx& c, PictureOut& o,
                            SliceState& s, int32_t& mb_address,
                            bool slice_begin) {
  const int32_t mb_size = c.mb_w * c.mb_h;
  int32_t increment = 0;
  int32_t t = r.vlc(p.addr);
  if (r.bad) return kErrStall;
  while (t == 34) { t = r.vlc(p.addr); if (r.bad) return kErrStall; }
  while (t == 35) { increment += 33; t = r.vlc(p.addr);
                    if (r.bad) return kErrStall; }
  increment += t;

  if (slice_begin) {
    mb_address += increment;
  } else {
    if (mb_address + increment >= mb_size) {
      mb_address = mb_size;              // illegal increment: drop
      return 0;
    }
    if (increment > 1) {
      s.reset_dc();
      if (c.picture_type == 2) s.reset_mv();
    }
    while (increment > 1) {
      ++mb_address;
      int row = mb_address / c.mb_w, col = mb_address % c.mb_w;
      o.mb_mv[((int64_t)row * c.mb_w + col) * 2 + 0] = (int16_t)s.motion_v;
      o.mb_mv[((int64_t)row * c.mb_w + col) * 2 + 1] = (int16_t)s.motion_h;
      o.mb_quant[(int64_t)row * c.mb_w + col] =
          (uint8_t)s.quantizer_scale;
      --increment;
    }
    ++mb_address;
  }
  if (mb_address >= mb_size) return kErrOverrun;
  int row = mb_address / c.mb_w, col = mb_address % c.mb_w;

  int32_t mb_type = r.vlc(c.picture_type == 1 ? p.type_i : p.type_p);
  if (r.bad) return kErrBadCode;
  bool intra = mb_type & 0x01;
  bool motion_fw = mb_type & 0x08;
  if (mb_type & 0x10) s.quantizer_scale = int32_t(r.get(5));

  o.mb_quant[(int64_t)row * c.mb_w + col] = (uint8_t)s.quantizer_scale;
  o.mb_intra[(int64_t)row * c.mb_w + col] = intra ? 1 : 0;

  if (intra) {
    s.reset_mv();
    if (c.picture_type == 2)
      o.mb_rep_add[(int64_t)row * c.mb_w + col] = 1;
  } else {
    s.reset_dc();
    if (motion_fw) {
      s.motion_h = decode_motion_component(r, p, c, s.motion_h_prev,
                                           c.full_pel);
      s.motion_v = decode_motion_component(r, p, c, s.motion_v_prev,
                                           c.full_pel);
    } else if (c.picture_type == 2) {
      s.reset_mv();
    }
    o.mb_mv[((int64_t)row * c.mb_w + col) * 2 + 0] = (int16_t)s.motion_v;
    o.mb_mv[((int64_t)row * c.mb_w + col) * 2 + 1] = (int16_t)s.motion_h;
  }

  int32_t cbp = 0, acbp = 0;
  if (mb_type & 0x02) {
    cbp = r.vlc(p.cbp);
    if (r.bad) return kErrBadCode;
    if (c.yuva) acbp = int32_t(r.get(4));
  } else if (intra) {
    cbp = 0x3F;
    if (c.yuva) acbp = 0xF;
  }

  for (int block = 0; block < 6; ++block) {
    if (cbp & (0x20 >> block)) {
      int rc = parse_block(r, p, c, o, s, row, col, block, intra);
      if (rc < 0) return rc;
    }
  }
  for (int ab = 0; ab < 4; ++ab) {       // alpha blocks 6..9 (YUVA)
    if (acbp & (0x8 >> ab)) {
      int rc = parse_block(r, p, c, o, s, row, col, 6 + ab, intra);
      if (rc < 0) return rc;
    }
  }
  return 0;
}

// Find the next 00 00 01 start code at/after byte `from`; returns the
// offset of the 00 00 01 prefix or -1.
inline int64_t find_start(const uint8_t* d, int64_t n, int64_t from) {
  for (int64_t i = from; i + 3 < n; ++i) {
    if (d[i] == 0 && d[i + 1] == 0 && d[i + 2] == 1) return i;
    // skip ahead over nonzero bytes quickly
    if (d[i + 2] > 1) i += 2;
    else if (d[i + 1] != 0) i += 1;
  }
  return -1;
}

}  // namespace

extern "C" {

void* jsv_parser_new(
    const int32_t* addr_v, const uint8_t* addr_l, int addr_b,
    const int32_t* ti_v, const uint8_t* ti_l, int ti_b,
    const int32_t* tp_v, const uint8_t* tp_l, int tp_b,
    const int32_t* cbp_v, const uint8_t* cbp_l, int cbp_b,
    const int32_t* mot_v, const uint8_t* mot_l, int mot_b,
    const int32_t* dcl_v, const uint8_t* dcl_l, int dcl_b,
    const int32_t* dcc_v, const uint8_t* dcc_l, int dcc_b,
    const int32_t* coef_v, const uint8_t* coef_l, int coef_b,
    const uint8_t* zigzag) {
  Parser* p = new Parser();
  p->addr.set(addr_v, addr_l, addr_b);
  p->type_i.set(ti_v, ti_l, ti_b);
  p->type_p.set(tp_v, tp_l, tp_b);
  p->cbp.set(cbp_v, cbp_l, cbp_b);
  p->motion.set(mot_v, mot_l, mot_b);
  p->dc_lum.set(dcl_v, dcl_l, dcl_b);
  p->dc_chrom.set(dcc_v, dcc_l, dcc_b);
  p->coeff.set(coef_v, coef_l, coef_b);
  std::memcpy(p->zigzag, zigzag, 64);
  for (int i = 0; i < 64; ++i) p->zigzag_inv[zigzag[i]] = (uint8_t)i;
  return p;
}

void jsv_parser_free(void* handle) { delete (Parser*)handle; }

// Parse all slices of one picture.  `start_byte` points at the first
// byte after the picture header's last bit (byte-aligned caller-side is
// not required: pass the bit offset).  Returns the byte offset of the
// first non-slice start code found (picture end) or a negative error.
int64_t jsv_parse_picture_slices(
    void* handle, const uint8_t* data, int64_t n_bytes, int64_t start_bit,
    int32_t mb_w, int32_t mb_h, int32_t picture_type, int32_t full_pel,
    int32_t f_code, int32_t yuva,
    int16_t* levels_y, int16_t* levels_cb, int16_t* levels_cr,
    int16_t* levels_a,
    uint8_t* lnz_y, uint8_t* lnz_cb, uint8_t* lnz_cr, uint8_t* lnz_a,
    uint8_t* mb_quant, uint8_t* mb_intra, int16_t* mb_mv,
    uint8_t* mb_rep_add,
    // optional (may all be null): per-pixel dequant sideband emission
    const uint8_t* intra_q, const uint8_t* non_intra_q,
    int16_t* mult_y, int16_t* mult_cb, int16_t* mult_cr, int16_t* mult_a,
    uint8_t* flags_y, uint8_t* flags_cb, uint8_t* flags_cr,
    uint8_t* flags_a) {
  Parser& p = *(Parser*)handle;
  PictureCtx c{mb_w, mb_h, mb_w * 16, picture_type, full_pel, f_code, yuva};
  PictureOut o;
  o.levels[0] = levels_y; o.levels[1] = levels_cb;
  o.levels[2] = levels_cr; o.levels[3] = levels_a;
  o.lnz[0] = lnz_y; o.lnz[1] = lnz_cb; o.lnz[2] = lnz_cr; o.lnz[3] = lnz_a;
  o.mb_quant = mb_quant; o.mb_intra = mb_intra;
  o.mb_mv = mb_mv; o.mb_rep_add = mb_rep_add;
  if (mult_y != nullptr && intra_q != nullptr) {
    o.mult[0] = mult_y; o.mult[1] = mult_cb; o.mult[2] = mult_cr;
    o.mult[3] = mult_a;
    o.flags[0] = flags_y; o.flags[1] = flags_cb; o.flags[2] = flags_cr;
    o.flags[3] = flags_a;
    o.intra_q = intra_q;
    o.non_intra_q = non_intra_q;
  }

  int64_t cursor = (start_bit + 7) >> 3;
  for (;;) {
    int64_t off = find_start(data, n_bytes, cursor);
    if (off < 0) return n_bytes;             // end of stream = picture end
    int code = data[off + 3];
    if (code >= 0x01 && code <= 0xAF) {
      // Slice: bound by the next start code (or EOF).
      int64_t next = find_start(data, n_bytes, off + 4);
      int64_t slice_end = next < 0 ? n_bytes : next;
      BitReader r(data, n_bytes);
      r.pos = (off + 4) * 8;

      SliceState s;
      int32_t mb_address = (code - 1) * mb_w - 1;
      s.quantizer_scale = int32_t(r.get(5));
      while (r.get(1)) r.skip(8);            // extra slice information

      bool slice_begin = true;
      while (((r.pos + 7) >> 3) < slice_end) {
        int rc = parse_macroblock(r, p, c, o, s, mb_address, slice_begin);
        slice_begin = false;
        if (rc == kErrOverrun) break;
        if (rc < 0) return rc;
        if (r.bad) return kErrStall;
        if (mb_address >= mb_w * mb_h) break;
      }
      cursor = slice_end;
    } else if (code == 0xB5 || code == 0xB2) {
      cursor = off + 4;                      // extension / user data
    } else {
      return off;                            // picture end
    }
  }
}

}  // extern "C"
