// cadx_io: native data-loading runtime for the cadx_tpu framework.
//
// The reference pipeline loads DICOMs one at a time in Python
// (Classes/Preprocessing.py) — fine for 245 images, a bottleneck for
// production feeds. This library provides the host-side runtime the
// Python layer binds via ctypes:
//
//   - a minimal DICOM parser (explicit/implicit VR little-endian,
//     uncompressed 8/16-bit monochrome) mirroring cadx_tpu/data/dicom.py
//   - area/nearest resize + normalize into float32 model input
//   - a multi-threaded prefetching batch loader: worker threads parse and
//     preprocess files into a bounded ring of ready batches while the
//     accelerator consumes previous ones.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread cadx_io.cc -o libcadx_io.so

#include <sys/stat.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct DicomImage {
  int rows = 0;
  int cols = 0;
  int bits = 0;
  std::vector<uint16_t> pixels;  // normalized storage (u8 widened)
  std::string error;
  bool ok = false;
};

uint16_t rd16(const uint8_t* p) { return static_cast<uint16_t>(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0] | (p[1] << 8) | (p[2] << 16) | (p[3] << 24));
}

// compressed pixel-data codecs (defined below parse_dicom)
bool rle_decode(const uint8_t* frame, size_t len, int rows, int cols,
                int bits, std::vector<uint16_t>* out);
bool jpeg_lossless_decode(const uint8_t* data, size_t n, int expect_rows,
                          int expect_cols, std::vector<uint16_t>* out);
bool jls_decode(const uint8_t* data, size_t n, int expect_rows,
                int expect_cols, std::vector<uint16_t>* out);
bool collect_fragments(const uint8_t* v, size_t len, std::vector<uint8_t>* out);

bool is_long_vr(const char* vr) {
  // incl. the newer long-form VRs (PS3.5 6.2): misreading their 4-byte
  // length as reserved bytes desyncs the element walk
  static const char* kLong[] = {"OB", "OW", "OF", "SQ", "UT", "UN",
                                "UC", "UR", "OD", "OL", "OV", "SV", "UV"};
  for (const char* v : kLong)
    if (vr[0] == v[0] && vr[1] == v[1]) return true;
  return false;
}

DicomImage parse_dicom(const uint8_t* data, size_t n) {
  DicomImage out;
  if (n < 132 || std::memcmp(data + 128, "DICM", 4) != 0) {
    out.error = "not a DICOM file";
    return out;
  }
  size_t off = 132;
  bool explicit_vr = true;
  std::string ts = "1.2.840.10008.1.2.1";
  int rows = 0, cols = 0, bits = 16, pixel_rep = 0, samples = 1;
  const uint8_t* pixel_data = nullptr;
  size_t pixel_len = 0;
  bool encapsulated = false;

  bool in_meta = true;
  while (off + 8 <= n) {
    uint16_t group = rd16(data + off);
    uint16_t elem = rd16(data + off + 2);
    size_t header = 4;
    uint32_t length = 0;
    bool exp = explicit_vr || group == 0x0002;
    if (in_meta && group != 0x0002) {
      in_meta = false;
      explicit_vr = (ts != "1.2.840.10008.1.2");  // encapsulated = explicit
      if (ts != "1.2.840.10008.1.2" && ts != "1.2.840.10008.1.2.1" &&
          ts != "1.2.840.10008.1.2.5" && ts != "1.2.840.10008.1.2.4.57" &&
          ts != "1.2.840.10008.1.2.4.70" && ts != "1.2.840.10008.1.2.4.80" &&
          ts != "1.2.840.10008.1.2.4.81") {
        out.error = "unsupported transfer syntax " + ts;
        return out;
      }
      encapsulated = (ts != "1.2.840.10008.1.2" && ts != "1.2.840.10008.1.2.1");
      exp = explicit_vr;
    }
    if (exp) {
      const char* vr = reinterpret_cast<const char*>(data + off + 4);
      if (is_long_vr(vr)) {
        if (off + 12 > n) break;
        length = rd32(data + off + 8);
        header = 12;
      } else {
        length = rd16(data + off + 6);
        header = 8;
      }
    } else {
      if (off + 8 > n) break;
      length = rd32(data + off + 4);
      header = 8;
    }
    if (length == 0xFFFFFFFFu) {
      // undefined length: item stream until (FFFE,E0DD)
      size_t p = off + header;
      bool terminated = false;
      while (p + 8 <= n) {
        uint16_t g = rd16(data + p), e = rd16(data + p + 2);
        uint32_t l = rd32(data + p + 4);
        p += 8;
        if (g == 0xFFFE && e == 0xE0DD) { terminated = true; break; }
        if (g != 0xFFFE || e != 0xE000) break;
        if (l == 0xFFFFFFFFu) {
          // undefined-length SQ item (nested functional groups): scan
          // for its (FFFE,E00D) delimiter like the Python parser does
          bool item_done = false;
          while (p + 8 <= n) {
            if (rd16(data + p) == 0xFFFE && rd16(data + p + 2) == 0xE00D) {
              p += 8;
              item_done = true;
              break;
            }
            p += 2;
          }
          if (!item_done) break;
        } else {
          if (p + l > n) break;
          p += l;
        }
      }
      if (!terminated) {
        out.error = "unterminated undefined-length element";
        return out;
      }
      if (group == 0x7FE0 && elem == 0x0010) {
        pixel_data = data + off + header;
        pixel_len = p - 8 - (off + header);  // item stream sans delimiter
      }
      off = p;
      continue;
    }
    const uint8_t* value = data + off + header;
    if (off + header + length > n) break;

    if (group == 0x0002 && elem == 0x0010) {
      ts.assign(reinterpret_cast<const char*>(value), length);
      while (!ts.empty() && (ts.back() == '\0' || ts.back() == ' ')) ts.pop_back();
    } else if (group == 0x0028 && elem == 0x0010 && length >= 2) {
      rows = rd16(value);  // length checked: declared-0 elements must not
    } else if (group == 0x0028 && elem == 0x0011 && length >= 2) {
      cols = rd16(value);  // read past the buffer
    } else if (group == 0x0028 && elem == 0x0100 && length >= 2) {
      bits = rd16(value);
    } else if (group == 0x0028 && elem == 0x0103 && length >= 2) {
      pixel_rep = rd16(value);
    } else if (group == 0x0028 && elem == 0x0002 && length >= 2) {
      samples = rd16(value);
    } else if (group == 0x7FE0 && elem == 0x0010) {
      pixel_data = value;
      pixel_len = length;
    }
    off += header + length;
  }

  if (!pixel_data || rows <= 0 || cols <= 0) {
    out.error = "missing PixelData or Rows/Columns";
    return out;
  }
  if (pixel_rep != 0) {
    // the python reader returns int16 for signed data; memcpy'ing signed
    // values into the uint16 buffer would silently corrupt intensities
    out.error = "signed pixel data not supported by the native loader";
    return out;
  }
  if (samples != 1) {
    out.error = "multi-sample (non-monochrome) pixel data not supported";
    return out;
  }
  size_t count = static_cast<size_t>(rows) * cols;
  if (encapsulated) {
    std::vector<uint8_t> frame;
    if (!collect_fragments(pixel_data, pixel_len, &frame)) {
      out.error = "bad encapsulated pixel data";
      return out;
    }
    bool ok;
    if (ts == "1.2.840.10008.1.2.5") {
      ok = rle_decode(frame.data(), frame.size(), rows, cols, bits,
                      &out.pixels);
    } else if (ts == "1.2.840.10008.1.2.4.80" ||
               ts == "1.2.840.10008.1.2.4.81") {
      ok = jls_decode(frame.data(), frame.size(), rows, cols, &out.pixels);
    } else {
      ok = jpeg_lossless_decode(frame.data(), frame.size(), rows, cols,
                                &out.pixels);
    }
    if (!ok || out.pixels.size() != count) {
      out.error = "compressed pixel decode failed";
      return out;
    }
    out.rows = rows;
    out.cols = cols;
    out.bits = bits;
    out.ok = true;
    return out;
  }
  out.pixels.resize(count);
  if (bits == 16) {
    if (pixel_len < count * 2) { out.error = "PixelData too short"; return out; }
    std::memcpy(out.pixels.data(), pixel_data, count * 2);
  } else if (bits == 8) {
    if (pixel_len < count) { out.error = "PixelData too short"; return out; }
    for (size_t i = 0; i < count; ++i) out.pixels[i] = pixel_data[i];
  } else {
    out.error = "unsupported BitsAllocated";
    return out;
  }
  out.rows = rows;
  out.cols = cols;
  out.bits = bits;
  out.ok = true;
  return out;
}

// ---------------------------------------------------------------------------
// Compressed pixel-data codecs (decode side; the Python layer carries the
// reference implementations + encoders, cadx_tpu/data/codecs.py)
// ---------------------------------------------------------------------------

// DICOM RLE Lossless (PS3.5 Annex G): 64-byte offset header + PackBits
// segments; 16-bit data = MSB plane then LSB plane.
bool rle_decode(const uint8_t* frame, size_t len, int rows, int cols,
                int bits, std::vector<uint16_t>* out) {
  if (len < 64) return false;
  uint32_t n_segs = rd32(frame);
  size_t count = static_cast<size_t>(rows) * cols;
  if (bits != 8 && bits != 16) return false;  // match codecs.rle_decode
  int want = bits == 16 ? 2 : 1;
  if (static_cast<int>(n_segs) != want) return false;
  std::vector<std::vector<uint8_t>> planes;
  for (uint32_t s = 0; s < n_segs; ++s) {
    size_t off = rd32(frame + 4 + 4 * s);
    size_t end = (s + 1 < n_segs) ? rd32(frame + 4 + 4 * (s + 1)) : len;
    if (off > end || end > len) return false;
    std::vector<uint8_t> plane;
    plane.reserve(count);
    size_t i = off;
    while (i < end && plane.size() < count) {
      uint8_t ctrl = frame[i++];
      if (ctrl < 128) {
        size_t n = ctrl + 1;
        if (i + n > end) return false;
        plane.insert(plane.end(), frame + i, frame + i + n);
        i += n;
      } else if (ctrl > 128) {
        if (i >= end) return false;
        plane.insert(plane.end(), 257 - ctrl, frame[i++]);
      }
    }
    if (plane.size() < count) return false;
    plane.resize(count);
    planes.push_back(std::move(plane));
  }
  out->resize(count);
  if (bits == 16) {
    for (size_t i = 0; i < count; ++i)
      (*out)[i] = static_cast<uint16_t>((planes[0][i] << 8) | planes[1][i]);
  } else {
    for (size_t i = 0; i < count; ++i) (*out)[i] = planes[0][i];
  }
  return true;
}

// JPEG Lossless (ITU T.81 SOF3), single component, predictors 1-7
// (DICOM 1.2.840.10008.1.2.4.70 mandates SV1 = predictor 1).
struct BitReader {
  const uint8_t* d;
  size_t n;
  size_t byte = 0;
  int bit = 0;  // bits consumed of current byte (MSB first)
  bool ok = true;

  int read_bit() {
    // de-stuffing inline: a 0xFF data byte is followed by 0x00
    if (byte >= n) { ok = false; return 0; }
    int v = (d[byte] >> (7 - bit)) & 1;
    if (++bit == 8) {
      bit = 0;
      if (d[byte] == 0xFF) {
        if (byte + 1 < n && d[byte + 1] == 0x00) byte += 2;
        else { ok = false; byte = n; }  // marker: end of scan
      } else {
        byte += 1;
      }
    }
    return v;
  }
  int read_bits(int k) {
    int v = 0;
    for (int i = 0; i < k; ++i) v = (v << 1) | read_bit();
    return v;
  }
  // Byte-align (discard pad bits) and consume an RSTn marker
  // (T.81 restart). Returns false if FFD0..FFD7 does not follow.
  bool skip_restart() {
    if (bit != 0) {
      uint8_t cur = d[byte];
      byte += 1;
      bit = 0;
      if (cur == 0xFF) {
        if (byte < n && d[byte] == 0x00) byte += 1;  // stuffed data byte
        else byte -= 1;  // the FF was the marker prefix itself
      }
    }
    if (byte + 1 >= n) { ok = false; return false; }
    if (d[byte] != 0xFF) return false;
    uint8_t m = d[byte + 1];
    if (m < 0xD0 || m > 0xD7) return false;
    byte += 2;
    return true;
  }
};

bool jpeg_lossless_decode(const uint8_t* data, size_t n, int expect_rows,
                          int expect_cols, std::vector<uint16_t>* out) {
  if (n < 4 || data[0] != 0xFF || data[1] != 0xD8) return false;
  size_t off = 2;
  int precision = 0, rows = 0, cols = 0, predictor = 1, pt = 0, table_id = 0;
  int restart_interval = 0;  // samples (MCUs) per restart interval
  // huffman tables: per id, code->symbol maps keyed by (length, code)
  struct HTab { int maxcode[17]; int mincode[17]; int valptr[17]; uint8_t vals[256]; bool set = false; };
  HTab tabs[4];
  size_t scan_off = 0;

  while (off + 4 <= n) {
    if (data[off] != 0xFF) return false;
    uint8_t marker = data[off + 1];
    off += 2;
    if (marker == 0xD9) break;
    if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) continue;
    if (off + 2 > n) return false;
    size_t seglen = (data[off] << 8) | data[off + 1];
    if (off + seglen > n) return false;
    const uint8_t* seg = data + off + 2;
    size_t sn = seglen - 2;
    if (marker == 0xDD) {
      if (sn < 2) return false;
      restart_interval = (seg[0] << 8) | seg[1];
    } else if (marker == 0xC3) {
      if (sn < 6) return false;
      precision = seg[0];
      rows = (seg[1] << 8) | seg[2];
      cols = (seg[3] << 8) | seg[4];
      if (seg[5] != 1) return false;  // single component only
    } else if (marker == 0xC4) {
      size_t p = 0;
      while (p + 17 <= sn) {
        int id = seg[p] & 0x0F;
        int counts[17] = {0};
        int total = 0;
        for (int l = 1; l <= 16; ++l) { counts[l] = seg[p + l]; total += counts[l]; }
        if (p + 17 + total > sn || total > 256) return false;
        HTab& t = tabs[id & 3];
        int code = 0, k = 0;
        for (int l = 1; l <= 16; ++l) {
          t.valptr[l] = k;
          t.mincode[l] = code;
          code += counts[l];
          t.maxcode[l] = code - 1;     // -1 if none at this length
          if (!counts[l]) t.maxcode[l] = -1;
          code <<= 1;
          for (int c = 0; c < counts[l]; ++c, ++k) t.vals[k] = seg[p + 17 + k];
        }
        t.set = true;
        p += 17 + total;
      }
    } else if (marker == 0xDA) {
      if (sn < 6 || seg[0] != 1) return false;
      table_id = (seg[2] >> 4) & 3;
      predictor = seg[3];
      pt = seg[5] & 0x0F;
      scan_off = off + seglen;
      break;
    } else if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
               marker != 0xC8 && marker != 0xCC) {
      return false;  // a non-lossless SOF
    }
    off += seglen;
  }
  if (!scan_off || !rows || !cols || !tabs[table_id].set) return false;
  if (predictor < 1 || predictor > 7) return false;
  // T.81 B.2.2/B.2.3: lossless P in [2,16], Al < P — out-of-range values
  // would make `1 << (precision - 1 - pt)` a negative-count shift (UB,
  // silent wrong pixels on x86)
  if (precision < 2 || precision > 16 || pt >= precision) return false;
  if (expect_rows && (rows != expect_rows || cols != expect_cols)) return false;

  HTab& t = tabs[table_id];
  BitReader br{data + scan_off, n - scan_off};
  size_t count = static_cast<size_t>(rows) * cols;
  std::vector<int32_t> diffs(count);
  for (size_t i = 0; i < count; ++i) {
    if (restart_interval && i && i % static_cast<size_t>(restart_interval) == 0) {
      if (!br.skip_restart()) return false;  // byte-align + FFD0..D7
    }
    int code = br.read_bit();
    int l = 1;
    while (l <= 16 && (t.maxcode[l] < 0 || code > t.maxcode[l])) {
      code = (code << 1) | br.read_bit();
      ++l;
    }
    if (l > 16 || !br.ok) return false;
    int sym = t.vals[t.valptr[l] + (code - t.mincode[l])];
    if (sym > 16) return false;  // T.81: SSSS is 0..16; a hostile DHT
                                 // value would shift past int width (UB)
    if (sym == 0) diffs[i] = 0;
    else if (sym == 16) diffs[i] = 32768;
    else {
      int v = br.read_bits(sym);
      if (v < (1 << (sym - 1))) v -= (1 << sym) - 1;
      diffs[i] = v;
    }
    if (!br.ok) return false;  // incl. the LAST sample: a truncated
                               // stream must fail, not return garbage
  }

  out->resize(count);
  int def = 1 << (precision - 1 - pt);
  auto px_at = [&](size_t idx) { return static_cast<int32_t>((*out)[idx]); };
  for (int y = 0; y < rows; ++y) {
    for (int x = 0; x < cols; ++x) {
      size_t i = static_cast<size_t>(y) * cols + x;
      int32_t px;
      if ((y == 0 && x == 0) ||
          (restart_interval &&
           i % static_cast<size_t>(restart_interval) == 0))
        px = def;  // T.81 H.2.2: prediction resets at restart boundaries
      else if (x == 0) px = px_at(i - cols);
      else if (y == 0) px = px_at(i - 1);
      else switch (predictor) {
        case 1: px = px_at(i - 1); break;
        case 2: px = px_at(i - cols); break;
        case 3: px = px_at(i - cols - 1); break;
        case 4: px = px_at(i - 1) + px_at(i - cols) - px_at(i - cols - 1); break;
        case 5: px = px_at(i - 1) + ((px_at(i - cols) - px_at(i - cols - 1)) >> 1); break;
        case 6: px = px_at(i - cols) + ((px_at(i - 1) - px_at(i - cols - 1)) >> 1); break;
        default: px = (px_at(i - 1) + px_at(i - cols)) >> 1; break;
      }
      (*out)[i] = static_cast<uint16_t>((px + diffs[i]) & 0xFFFF);
    }
  }
  if (pt) for (auto& v : *out) v = static_cast<uint16_t>(v << pt);
  return true;
}

// Encapsulated pixel data (PS3.5 A.4): concatenate fragment items after
// the Basic Offset Table.
bool collect_fragments(const uint8_t* v, size_t len, std::vector<uint8_t>* out) {
  size_t off = 0;
  bool first = true;
  while (off + 8 <= len) {
    uint16_t g = rd16(v + off), e = rd16(v + off + 2);
    uint32_t l = rd32(v + off + 4);
    off += 8;
    if (g != 0xFFFE) return false;
    if (e == 0xE0DD) break;
    if (e != 0xE000 || off + l > len) return false;
    if (first) first = false;  // BOT dropped
    else out->insert(out->end(), v + off, v + off + l);
    off += l;
  }
  return true;
}

// --- JPEG-LS (ITU-T T.87) decoder -------------------------------------------
// Fast path for DICOM transfer syntaxes 1.2.840.10008.1.2.4.80/.81; a
// line-for-line mirror of the pure-Python reference codec
// cadx_tpu/data/jls.py (the parity oracle — bit-identity pinned in
// tests/test_jls.py::test_native_matches_python). Single component,
// 2..16-bit, NEAR >= 0, default or LSE-preset parameters.

struct JlsBitReader {
  // MSB-first with T.87 A.1 FF stuffing: the byte after any 0xFF data
  // byte carries only 7 bits (its MSB is a stuffed 0; 0x80+ = marker).
  const uint8_t* d;
  size_t n;
  size_t pos;
  uint32_t acc = 0;
  int nleft = 0;
  bool prev_ff = false;
  bool ok = true;

  int bit() {
    if (nleft == 0) {
      if (pos >= n) { ok = false; return 0; }
      uint8_t b = d[pos++];
      if (prev_ff) {
        if (b & 0x80) { ok = false; return 0; }
        acc = b; nleft = 7; prev_ff = false;
      } else {
        acc = b; nleft = 8; prev_ff = (b == 0xFF);
      }
    }
    nleft--;
    return (acc >> nleft) & 1;
  }
  int bits(int k) {
    int v = 0;
    for (int i = 0; i < k; ++i) v = (v << 1) | bit();
    return v;
  }
};

static const int kJlsJ[32] = {0, 0, 0, 0, 1, 1, 1, 1, 2, 2,  2,  2,
                              3, 3, 3, 3, 4, 4, 5, 5, 6, 6,  7,  7,
                              8, 9, 10, 11, 12, 13, 14, 15};

struct JlsParams {
  int maxval, near, reset, t1, t2, t3, range, qbpp, bpp, limit;
};

static bool jls_make_params(int maxval, int near, int reset, int pt1,
                            int pt2, int pt3, JlsParams* p) {
  if (maxval < 1 || maxval > 65535) return false;
  if (near < 0 || near > std::min(255, maxval / 2)) return false;
  p->maxval = maxval;
  p->near = near;
  p->reset = reset > 0 ? reset : 64;
  if (pt1 || pt2 || pt3) {
    p->t1 = pt1; p->t2 = pt2; p->t3 = pt3;
  } else {  // C.2.4.1.1.1 defaults
    auto clamp = [&](long long i, int lo) {
      return (i > maxval || i < lo) ? lo : static_cast<int>(i);
    };
    if (maxval >= 128) {
      int factor = (std::min(maxval, 4095) + 128) / 256;
      p->t1 = clamp(1LL * factor * (3 - 2) + 2 + 3 * near, near + 1);
      p->t2 = clamp(1LL * factor * (7 - 3) + 3 + 5 * near, p->t1);
      p->t3 = clamp(1LL * factor * (21 - 4) + 4 + 7 * near, p->t2);
    } else {
      int factor = 256 / (maxval + 1);
      p->t1 = clamp(std::max(2, 3 / factor + 3 * near), near + 1);
      p->t2 = clamp(std::max(3, 7 / factor + 5 * near), p->t1);
      p->t3 = clamp(std::max(4, 21 / factor + 7 * near), p->t2);
    }
  }
  p->range = (maxval + 2 * near) / (2 * near + 1) + 1;
  p->qbpp = 1;
  while ((1 << p->qbpp) < p->range) p->qbpp++;
  p->bpp = 2;
  while ((1 << p->bpp) < maxval + 1) p->bpp++;
  p->limit = 2 * (p->bpp + std::max(8, p->bpp));
  return true;
}

static inline int jls_quantize(int d, const JlsParams& p) {
  if (d <= -p.t3) return -4;
  if (d <= -p.t2) return -3;
  if (d <= -p.t1) return -2;
  if (d < -p.near) return -1;
  if (d <= p.near) return 0;
  if (d < p.t1) return 1;
  if (d < p.t2) return 2;
  if (d < p.t3) return 3;
  return 4;
}

static inline int jls_golomb(JlsBitReader* r, int k, int limit, int qbpp) {
  int high = 0;
  while (r->ok && r->bit() == 0) {
    if (++high > limit) { r->ok = false; return 0; }
  }
  if (!r->ok) return 0;
  if (high < limit - qbpp - 1) {
    // hostile LSE presets can drive k past the int width (UBSAN fuzz
    // finding): a valid stream's k never exceeds qbpp (<= 16) + a few
    // growth steps — reject first, then compute wide
    if (k > 26) { r->ok = false; return 0; }
    long long v = static_cast<long long>(high) << k;
    if (k) v |= r->bits(k);
    if (v > (1 << 30)) { r->ok = false; return 0; }
    return static_cast<int>(v);
  }
  if (high == limit - qbpp - 1) return r->bits(qbpp) + 1;
  r->ok = false;
  return 0;
}

static bool jls_decode_scan(JlsBitReader* r, int h, int w,
                            const JlsParams& p, std::vector<uint16_t>* out) {
  const int near = p.near, maxval = p.maxval, range = p.range;
  const long long wrap = 1LL * range * (2 * near + 1);
  long long a[367];
  long long b[365] = {0};
  int c[365] = {0}, nc[367], nn[2] = {0, 0};
  const long long a0 = std::max(2, (range + 32) / 64);
  for (int i = 0; i < 367; ++i) { a[i] = a0; nc[i] = 1; }
  int run_index = 0;
  std::vector<int> prev(w + 2, 0), cur(w + 2, 0);
  out->assign(static_cast<size_t>(h) * w, 0);
  for (int y = 0; y < h; ++y) {
    cur[0] = prev[1];
    prev[w + 1] = prev[w];
    int i = 1;
    while (i <= w) {
      int ra = cur[i - 1], rb = prev[i], rc = prev[i - 1], rd = prev[i + 1];
      int d1 = rd - rb, d2 = rb - rc, d3 = rc - ra;
      if (std::abs(d1) <= near && std::abs(d2) <= near &&
          std::abs(d3) <= near) {
        // ---- run mode (A.7) ----
        int runval = ra;
        bool interrupted = false;
        for (;;) {
          if (!r->ok) return false;
          if (r->bit()) {
            int seg = 1 << kJlsJ[run_index];
            int fill = std::min(seg, w - i + 1);
            for (int f = 0; f < fill; ++f) cur[i++] = runval;
            if (fill == seg && run_index < 31) run_index++;
            if (i > w) break;
          } else {
            int cnt = kJlsJ[run_index] ? r->bits(kJlsJ[run_index]) : 0;
            if (cnt > w - i + 1) return false;
            for (int f = 0; f < cnt; ++f) cur[i++] = runval;
            interrupted = true;
            break;
          }
        }
        if (!interrupted) continue;
        // ---- run interruption sample (A.7.2) ----
        rb = prev[i];
        int ritype = std::abs(runval - rb) <= near ? 1 : 0;
        int px = ritype ? runval : rb;
        int sign = (ritype == 0 && runval > rb) ? -1 : 1;
        int q = 365 + ritype;
        long long temp = a[q] + (ritype ? (nc[q] >> 1) : 0);
        int k = 0;
        while ((static_cast<long long>(nc[q]) << k) < temp) k++;
        int emerr = jls_golomb(r, k, p.limit - kJlsJ[run_index] - 1, p.qbpp);
        if (!r->ok) return false;
        int t = emerr + ritype;
        bool flip = (k == 0 && 2 * nn[ritype] < nc[q]);
        int err;
        if (flip) err = (t & 1) ? (t + 1) / 2 : -(t / 2);
        else err = !(t & 1) ? t / 2 : -((t + 1) / 2);
        if (err < 0) nn[ritype]++;
        a[q] += (emerr + 1 - ritype) >> 1;
        if (nc[q] == p.reset) { a[q] >>= 1; nc[q] >>= 1; nn[ritype] >>= 1; }
        nc[q]++;
        long long rx = px + 1LL * sign * err * (2 * near + 1);
        if (rx < -near) rx += wrap;
        else if (rx > maxval + near) rx -= wrap;
        if (rx < 0) rx = 0;
        else if (rx > maxval) rx = maxval;
        if (run_index > 0) run_index--;
        cur[i++] = static_cast<int>(rx);
        continue;
      }
      // ---- regular mode (A.4-A.6) ----
      int q1 = jls_quantize(d1, p), q2 = jls_quantize(d2, p),
          q3 = jls_quantize(d3, p);
      int q = 81 * q1 + 9 * q2 + q3;
      int sign = 1;
      if (q < 0) { q = -q; sign = -1; }
      int px;
      if (rc >= std::max(ra, rb)) px = std::min(ra, rb);
      else if (rc <= std::min(ra, rb)) px = std::max(ra, rb);
      else px = ra + rb - rc;
      px += sign * c[q];
      if (px < 0) px = 0;
      else if (px > maxval) px = maxval;
      int k = 0;
      while ((static_cast<long long>(nc[q]) << k) < a[q]) k++;
      int merr = jls_golomb(r, k, p.limit, p.qbpp);
      if (!r->ok) return false;
      int err;
      if (near == 0 && k == 0 && 2 * b[q] <= -nc[q]) {
        err = (merr & 1) ? (merr - 1) / 2 : -(merr / 2) - 1;
      } else {
        err = !(merr & 1) ? merr / 2 : -((merr + 1) / 2);
      }
      // variable update + bias cancellation (A.6)
      b[q] += 1LL * err * (2 * near + 1);
      a[q] += std::abs(err);
      if (nc[q] == p.reset) {
        a[q] >>= 1;
        b[q] = b[q] >= 0 ? (b[q] >> 1) : -((1 - b[q]) >> 1);
        nc[q] >>= 1;
      }
      nc[q]++;
      if (b[q] <= -nc[q]) {
        if (c[q] > -128) c[q]--;
        b[q] += nc[q];
        if (b[q] <= -nc[q]) b[q] = -nc[q] + 1;
      } else if (b[q] > 0) {
        if (c[q] < 127) c[q]++;
        b[q] -= nc[q];
        if (b[q] > 0) b[q] = 0;
      }
      long long rx = px + 1LL * sign * err * (2 * near + 1);
      if (rx < -near) rx += wrap;
      else if (rx > maxval + near) rx -= wrap;
      if (rx < 0) rx = 0;
      else if (rx > maxval) rx = maxval;
      cur[i++] = static_cast<int>(rx);
    }
    for (int x = 0; x < w; ++x)
      (*out)[static_cast<size_t>(y) * w + x] = static_cast<uint16_t>(cur[x + 1]);
    std::swap(prev, cur);
  }
  return true;
}

bool jls_decode(const uint8_t* data, size_t n, int expect_rows,
                int expect_cols, std::vector<uint16_t>* out) {
  if (n < 4 || data[0] != 0xFF || data[1] != 0xD8) return false;
  size_t pos = 2;
  int precision = 0, h = 0, w = 0;
  int lse_maxval = 0, t1 = 0, t2 = 0, t3 = 0, reset = 64;
  bool have_sof = false;
  while (pos + 4 <= n) {
    if (data[pos] != 0xFF) return false;
    while (pos + 1 < n && data[pos + 1] == 0xFF) pos++;  // FF fill
    uint8_t marker = data[pos + 1];
    pos += 2;
    if (marker == 0xD9) return false;  // EOI before scan
    if (marker >= 0xD0 && marker <= 0xD7) return false;  // restarts
    if (pos + 2 > n) return false;
    size_t seglen = (data[pos] << 8) | data[pos + 1];
    if (seglen < 2 || pos + seglen > n) return false;
    const uint8_t* seg = data + pos + 2;
    size_t sn = seglen - 2;
    if (marker == 0xF7) {  // SOF55
      if (sn < 6) return false;
      precision = seg[0];
      h = (seg[1] << 8) | seg[2];
      w = (seg[3] << 8) | seg[4];
      if (seg[5] != 1) return false;  // multi-component
      if (h == 0 || precision < 2 || precision > 16) return false;
      have_sof = true;
    } else if (marker == 0xF8) {  // LSE
      if (sn < 1) return false;
      if (seg[0] != 1) return false;  // only preset-parameters ID
      if (sn < 11) return false;
      lse_maxval = (seg[1] << 8) | seg[2];
      t1 = (seg[3] << 8) | seg[4];
      t2 = (seg[5] << 8) | seg[6];
      t3 = (seg[7] << 8) | seg[8];
      reset = (seg[9] << 8) | seg[10];
    } else if (marker == 0xDA) {  // SOS
      if (!have_sof || sn < 4) return false;
      int ns = seg[0];
      if (ns != 1 || sn < static_cast<size_t>(3 + 2 * ns)) return false;
      int near = seg[1 + 2 * ns];
      int ilv = seg[2 + 2 * ns];
      if (ilv != 0) return false;
      pos += seglen;
      int maxval = lse_maxval ? lse_maxval : (1 << precision) - 1;
      JlsParams p;
      if (!jls_make_params(maxval, near, reset, t1, t2, t3, &p)) return false;
      if (h != expect_rows || w != expect_cols) return false;
      JlsBitReader r{data, n, pos};
      return jls_decode_scan(&r, h, w, p, out);
    }
    pos += seglen;
  }
  return false;
}

// Area-average resize (integer-binned), matching resize_area semantics
// closely enough for data loading; exact for integer factors.
void resize_area_f32(const uint16_t* src, int sh, int sw, float* dst, int dh,
                     int dw) {
  for (int y = 0; y < dh; ++y) {
    int y0 = static_cast<int>(static_cast<int64_t>(y) * sh / dh);
    int y1 = static_cast<int>(static_cast<int64_t>(y + 1) * sh / dh);
    if (y1 <= y0) y1 = y0 + 1;
    for (int x = 0; x < dw; ++x) {
      int x0 = static_cast<int>(static_cast<int64_t>(x) * sw / dw);
      int x1 = static_cast<int>(static_cast<int64_t>(x + 1) * sw / dw);
      if (x1 <= x0) x1 = x0 + 1;
      double acc = 0.0;
      for (int yy = y0; yy < y1; ++yy)
        for (int xx = x0; xx < x1; ++xx) acc += src[yy * sw + xx];
      dst[y * dw + x] =
          static_cast<float>(acc / ((y1 - y0) * static_cast<double>(x1 - x0)));
    }
  }
}

struct Batch {
  std::vector<float> data;    // [batch, H, W]
  std::vector<int32_t> labels;
  std::vector<int32_t> ok;    // per-item success flags
  int count = 0;
  int64_t start = 0;          // index of slot 0 in the epoch's path list
};

struct LoaderState {
  std::vector<std::string> paths;
  std::vector<int32_t> labels;
  int batch_size = 0;
  int out_h = 0;
  int out_w = 0;
  int normalize = 1;  // divide by per-image max

  std::deque<Batch> ready;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  size_t next_index = 0;
  size_t max_ready = 4;
  size_t total_batches = 0;
  size_t consumed = 0;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::mutex index_mu;
};

void worker_loop(LoaderState* st) {
  while (!st->stop.load()) {
    size_t start;
    {
      std::lock_guard<std::mutex> lk(st->index_mu);
      if (st->next_index >= st->paths.size()) return;
      start = st->next_index;
      st->next_index += st->batch_size;
    }
    size_t end = std::min(start + st->batch_size, st->paths.size());
    Batch b;
    b.count = static_cast<int>(end - start);
    b.start = static_cast<int64_t>(start);
    b.data.assign(static_cast<size_t>(st->batch_size) * st->out_h * st->out_w, 0.f);
    b.labels.assign(st->batch_size, -1);
    b.ok.assign(st->batch_size, 0);
    for (size_t i = start; i < end; ++i) {
      std::ifstream f(st->paths[i], std::ios::binary);
      std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                               std::istreambuf_iterator<char>());
      DicomImage img = parse_dicom(buf.data(), buf.size());
      size_t slot = i - start;
      if (!img.ok) continue;  // graceful per-item skip, like the reference
      float* dst = b.data.data() + slot * st->out_h * st->out_w;
      resize_area_f32(img.pixels.data(), img.rows, img.cols, dst, st->out_h,
                      st->out_w);
      if (st->normalize) {
        float mx = 1e-8f;
        for (int k = 0; k < st->out_h * st->out_w; ++k)
          mx = std::max(mx, dst[k]);
        for (int k = 0; k < st->out_h * st->out_w; ++k) dst[k] /= mx;
      }
      b.labels[slot] = st->labels[i];
      b.ok[slot] = 1;
    }
    {
      std::unique_lock<std::mutex> lk(st->mu);
      st->cv_space.wait(lk, [st] {
        return st->ready.size() < st->max_ready || st->stop.load();
      });
      if (st->stop.load()) return;
      st->ready.push_back(std::move(b));
    }
    st->cv_ready.notify_one();
  }
}

}  // namespace

namespace {
// single-entry parse cache: the ctypes API reads files via an info call
// followed by a pixels call, which would otherwise parse (and for
// compressed syntaxes fully DECODE) every file twice. Keyed by
// (path, size, mtime) so rewritten files never serve stale pixels.
std::mutex g_parse_cache_mu;
std::string g_parse_cache_key;
DicomImage g_parse_cache_img;

std::string file_cache_key(const char* path, const std::vector<uint8_t>& buf) {
  std::string key = std::string(path) + "|" + std::to_string(buf.size());
  // stat identity: a rewritten file with identical size/head/tail bytes
  // must still miss the cache (round-3 advisor finding)
  struct stat st;
  if (stat(path, &st) == 0) {
    key += "|" + std::to_string(static_cast<long long>(st.st_mtime)) + "." +
           std::to_string(static_cast<long long>(st.st_ino));
#ifdef __linux__
    key += "." + std::to_string(static_cast<long long>(st.st_mtim.tv_nsec));
#endif
  }
  return key;
}

bool parse_dicom_cached(const char* path, DicomImage* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  // stat identity + cheap content fingerprint: first/last 64 bytes (the
  // meta group and pixel tail differ whenever the image data changes)
  std::string key = file_cache_key(path, buf);
  size_t head = std::min<size_t>(64, buf.size());
  key.append(reinterpret_cast<const char*>(buf.data()), head);
  if (buf.size() > 64)
    key.append(reinterpret_cast<const char*>(buf.data() + buf.size() - 64), 64);
  {
    std::lock_guard<std::mutex> lk(g_parse_cache_mu);
    if (g_parse_cache_key == key && g_parse_cache_img.ok) {
      *out = g_parse_cache_img;
      return true;
    }
  }
  *out = parse_dicom(buf.data(), buf.size());
  std::lock_guard<std::mutex> lk(g_parse_cache_mu);
  g_parse_cache_key = key;
  g_parse_cache_img = *out;
  return true;
}
}  // namespace

// ---------------------------------------------------------------------------
// JPEG 2000 tier-1 (EBCOT code-block) decoder — the hot loop of
// cadx_tpu/data/j2k.py ported to C++ (the pure-Python pass loop costs
// ~10s for a 512x512 image; real mammograms are ~4Kx3K). Faithful port
// of the Python reference (which is oracle-tested against OpenJPEG);
// bit-identity native==python is pinned by tests/test_j2k.py.
// ---------------------------------------------------------------------------

namespace j2k {

struct QeRow { uint16_t qe; uint8_t nmps, nlps, sw; };
static const QeRow kQe[47] = {
    {0x5601, 1, 1, 1},  {0x3401, 2, 6, 0},   {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0}, {0x0521, 5, 29, 0},  {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},  {0x5401, 8, 14, 0},  {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0}, {0x3001, 11, 17, 0}, {0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0}, {0x1601, 29, 21, 0}, {0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0}, {0x5101, 17, 15, 0}, {0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0}, {0x3401, 20, 18, 0}, {0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0}, {0x2401, 23, 20, 0}, {0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0}, {0x1801, 26, 23, 0}, {0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0}, {0x1201, 29, 26, 0}, {0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0}, {0x09C1, 32, 29, 0}, {0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0}, {0x0441, 35, 32, 0}, {0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0}, {0x0141, 38, 35, 0}, {0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0}, {0x0049, 41, 38, 0}, {0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0}, {0x0009, 44, 41, 0}, {0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0}, {0x5601, 46, 46, 0},
};
constexpr int kCtxUni = 18, kCtxRl = 17, kNCtx = 19;

struct MQDec {
  const uint8_t* d;
  long long n, bp;
  uint32_t c, a;
  int ct;
  uint8_t idx[kNCtx], mps[kNCtx];

  void reset_ctx() {
    std::memset(idx, 0, sizeof(idx));
    std::memset(mps, 0, sizeof(mps));
    idx[kCtxUni] = 46;
    idx[kCtxRl] = 3;
    idx[0] = 4;
  }
  uint8_t at(long long i) const { return i < n ? d[i] : 0xFF; }
  void bytein() {
    uint8_t b = at(bp);
    if (b == 0xFF) {
      uint8_t b1 = at(bp + 1);
      if (b1 > 0x8F) {
        c += 0xFF00;
        ct = 8;
      } else {
        bp += 1;
        c += static_cast<uint32_t>(b1) << 9;
        ct = 7;
      }
    } else {
      bp += 1;
      c += static_cast<uint32_t>(at(bp)) << 8;
      ct = 8;
    }
  }
  void init(const uint8_t* data, long long len) {
    d = data;
    n = len;
    bp = 0;
    c = static_cast<uint32_t>(at(0)) << 16;
    bytein();
    c <<= 7;
    ct -= 7;
    a = 0x8000;
  }
  int decode(int cx) {
    uint32_t qe = kQe[idx[cx]].qe;
    a -= qe;
    int dbit;
    if (((c >> 16) & 0xFFFF) < qe) {
      if (a < qe) {
        dbit = mps[cx];
        idx[cx] = kQe[idx[cx]].nmps;
      } else {
        dbit = 1 - mps[cx];
        if (kQe[idx[cx]].sw) mps[cx] = 1 - mps[cx];
        idx[cx] = kQe[idx[cx]].nlps;
      }
      a = qe;
    } else {
      c -= qe << 16;
      if (a & 0x8000) return mps[cx];
      if (a < qe) {
        dbit = 1 - mps[cx];
        if (kQe[idx[cx]].sw) mps[cx] = 1 - mps[cx];
        idx[cx] = kQe[idx[cx]].nlps;
      } else {
        dbit = mps[cx];
        idx[cx] = kQe[idx[cx]].nmps;
      }
    }
    do {
      if (ct == 0) bytein();
      a = (a << 1) & 0xFFFF;
      c <<= 1;
      ct -= 1;
    } while (!(a & 0x8000));
    return dbit;
  }
};

struct RawDec {  // bypass-mode raw reader with 0xFF stuffing
  const uint8_t* d;
  long long n, bp;
  uint8_t buf;
  int ct;
  void init(const uint8_t* data, long long len) {
    d = data;
    n = len;
    bp = 0;
    buf = 0;
    ct = 0;
  }
  int read() {
    if (ct == 0) {
      uint8_t prev = buf;
      buf = bp < n ? d[bp] : 0xFF;
      bp += 1;
      ct = prev == 0xFF ? 7 : 8;
    }
    ct -= 1;
    return (buf >> ct) & 1;
  }
};

// significance context (Table D.1); kind: 0 = LL/LH, 1 = HL, 2 = HH
inline int sig_ctx(int kind, int h, int v, int d) {
  if (kind == 1) std::swap(h, v);
  if (kind != 2) {
    if (h == 2) return 8;
    if (h == 1) return v >= 1 ? 7 : (d >= 1 ? 6 : 5);
    if (v == 2) return 4;
    if (v == 1) return 3;
    return d >= 2 ? 2 : d;
  }
  int hv = h + v;
  if (d >= 3) return 8;
  if (d == 2) return hv >= 1 ? 7 : 6;
  if (d == 1) return hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
  return hv >= 2 ? 2 : hv;
}

inline void sign_ctx(int hc, int vc, int* cx, int* xorbit) {
  static const int tab[3][3][2] = {
      // hc=-1            hc=0           hc=1      (vc rows: -1, 0, 1)
      {{13, 1}, {12, 1}, {11, 1}},  // hc == -1
      {{10, 1}, {9, 0}, {10, 0}},   // hc == 0
      {{11, 0}, {12, 0}, {13, 0}},  // hc == 1
  };
  *cx = tab[hc + 1][vc + 1][0];
  *xorbit = tab[hc + 1][vc + 1][1];
}

struct BlockDec {
  int w, h, kind, cbstyle, bp_start;
  bool causal;
  std::vector<uint8_t> sig, sgnneg;  // (h+2)x(w+2) padded
  std::vector<uint8_t> visited, refined;  // h x w
  std::vector<int64_t> mag;               // h x w
  MQDec mq;
  RawDec raw;
  bool use_raw = false;

  int pad() const { return w + 2; }
  inline int nb_counts(int y, int x, int* hs, int* vs, int* ds) const {
    int ys = y + 1, xs = x + 1, p = pad();
    const uint8_t* s = sig.data();
    int vn = s[(ys - 1) * p + xs], vs_ = s[(ys + 1) * p + xs];
    int dn = s[(ys - 1) * p + xs - 1] + s[(ys - 1) * p + xs + 1];
    int dsn = s[(ys + 1) * p + xs - 1] + s[(ys + 1) * p + xs + 1];
    // VSC (stripe-causal) hides only FUTURE (south) stripes: mask south
    // contributions at each stripe's last row. North rows belong to the
    // already-coded previous stripe and stay visible (T.800 D.5;
    // OpenJPEG masks T1_SIG_S/SE/SW at j==k+3 only).
    if (causal && (y % 4) == 3) vs_ = 0, dsn = 0;
    *hs = s[ys * p + xs - 1] + s[ys * p + xs + 1];
    *vs = vn + vs_;
    *ds = dn + dsn;
    return 0;
  }
  inline int bit(int cx) { return use_raw ? raw.read() : mq.decode(cx); }
  inline int uni() { return use_raw ? raw.read() : mq.decode(kCtxUni); }

  void make_sig(int y, int x, int bp) {
    mag[y * w + x] |= 1LL << bp;
    int ys = y + 1, xs = x + 1, p = pad();
    auto contrib = [&](int yy, int xx) -> int {
      if (!sig[yy * p + xx]) return 0;
      return sgnneg[yy * p + xx] ? -1 : 1;
    };
    int vup = contrib(ys - 1, xs), vdn = contrib(ys + 1, xs);
    if (causal && (y % 4) == 3) vdn = 0;  // VSC: south-only masking
    int hc = contrib(ys, xs - 1) + contrib(ys, xs + 1);
    int vc = vup + vdn;
    hc = hc < -1 ? -1 : (hc > 1 ? 1 : hc);
    vc = vc < -1 ? -1 : (vc > 1 ? 1 : vc);
    int cx, xorbit;
    sign_ctx(hc, vc, &cx, &xorbit);
    // in a raw (bypass) segment the sign bit is coded directly with no
    // prediction/xor (T.800 D.6, as OpenJPEG's t1 raw sigpass does);
    // the MQ path applies the Table-D.3 prediction
    int neg = use_raw ? raw.read() : (mq.decode(cx) ^ xorbit);
    sig[ys * p + xs] = 1;
    sgnneg[ys * p + xs] = static_cast<uint8_t>(neg);
  }

  void spp(int bp) {  // significance propagation
    for (int y0 = 0; y0 < h; y0 += 4) {
      int y1 = std::min(y0 + 4, h);
      for (int x = 0; x < w; ++x)
        for (int y = y0; y < y1; ++y) {
          if (sig[(y + 1) * pad() + x + 1] || visited[y * w + x]) continue;
          int hs, vs, ds;
          nb_counts(y, x, &hs, &vs, &ds);
          if (hs + vs + ds == 0) continue;
          if (bit(sig_ctx(kind, hs, vs, ds))) make_sig(y, x, bp);
          visited[y * w + x] = 1;
        }
    }
  }

  void mrp(int bp) {  // magnitude refinement
    for (int y0 = 0; y0 < h; y0 += 4) {
      int y1 = std::min(y0 + 4, h);
      for (int x = 0; x < w; ++x)
        for (int y = y0; y < y1; ++y) {
          if (!sig[(y + 1) * pad() + x + 1] || visited[y * w + x]) continue;
          int cx;
          if (refined[y * w + x]) {
            cx = 16;
          } else {
            int hs, vs, ds;
            nb_counts(y, x, &hs, &vs, &ds);
            cx = (hs + vs + ds) ? 15 : 14;
          }
          mag[y * w + x] |= static_cast<int64_t>(bit(cx)) << bp;
          refined[y * w + x] = 1;
          visited[y * w + x] = 1;
        }
    }
  }

  void cup(int bp) {  // cleanup with run-length mode
    int p = pad();
    for (int y0 = 0; y0 < h; y0 += 4) {
      int y1 = std::min(y0 + 4, h);
      for (int x = 0; x < w; ++x) {
        int y = y0;
        while (y < y1) {
          if (y == y0 && y1 - y0 == 4) {
            bool all_zero = true;
            for (int yk = y0; yk < y1; ++yk) {
              if (visited[yk * w + x] || sig[(yk + 1) * p + x + 1]) {
                all_zero = false;
                break;
              }
              // zero-context check with the same VSC masking as normal
              // context formation (OpenJPEG's clnpass vsc flag masking)
              int hs, vs, ds;
              nb_counts(yk, x, &hs, &vs, &ds);
              if (hs || vs || ds) {
                all_zero = false;
                break;
              }
            }
            if (all_zero) {
              if (bit(kCtxRl) == 0) {
                y = y1;
                continue;
              }
              int r2 = (uni() << 1) | uni();
              y = y0 + r2;
              make_sig(y, x, bp);
              ++y;
              continue;
            }
          }
          if (!visited[y * w + x] && !sig[(y + 1) * p + x + 1]) {
            int hs, vs, ds;
            nb_counts(y, x, &hs, &vs, &ds);
            if (bit(sig_ctx(kind, hs, vs, ds))) make_sig(y, x, bp);
          }
          ++y;
        }
      }
    }
  }
};

}  // namespace j2k

extern "C" {

// --- single-file API -------------------------------------------------------

// Parse a DICOM file; returns 0 on success. rows/cols/bits written out.
int cadx_dicom_info(const char* path, int* rows, int* cols, int* bits) try {
  DicomImage img;
  if (!parse_dicom_cached(path, &img)) return 1;
  if (!img.ok) return 2;
  *rows = img.rows;
  *cols = img.cols;
  *bits = img.bits;
  return 0;
} catch (...) {
  return 9;
}

// Read pixel data as uint16 into caller-allocated buffer of rows*cols.
int cadx_dicom_pixels(const char* path, uint16_t* out, int capacity) try {
  DicomImage img;
  if (!parse_dicom_cached(path, &img)) return 1;
  if (!img.ok) return 2;
  if (static_cast<int>(img.pixels.size()) > capacity) return 3;
  std::memcpy(out, img.pixels.data(), img.pixels.size() * 2);
  return 0;
} catch (...) {
  return 9;
}

// Decode a raw JPEG-lossless (SOF3) frame into a caller buffer of
// rows*cols uint16. Returns 0 on success.
int cadx_decode_jpeg_lossless(const uint8_t* data, long long len,
                              uint16_t* out_buf, int rows, int cols) try {
  std::vector<uint16_t> px;
  if (!jpeg_lossless_decode(data, static_cast<size_t>(len), rows, cols, &px))
    return 1;
  if (px.size() != static_cast<size_t>(rows) * cols) return 2;
  std::memcpy(out_buf, px.data(), px.size() * 2);
  return 0;
} catch (...) {
  // bad_alloc (hostile dims) must not unwind through the C ABI
  return 9;
}

// Decode a JPEG-LS frame into rows*cols uint16. Returns 0 on success.
int cadx_decode_jls(const uint8_t* data, long long len, uint16_t* out_buf,
                    int rows, int cols) try {
  std::vector<uint16_t> px;
  if (!jls_decode(data, static_cast<size_t>(len), rows, cols, &px)) return 1;
  if (px.size() != static_cast<size_t>(rows) * cols) return 2;
  std::memcpy(out_buf, px.data(), px.size() * 2);
  return 0;
} catch (...) {
  return 9;
}

// Decode a DICOM RLE frame into rows*cols uint16. Returns 0 on success.
int cadx_decode_rle(const uint8_t* data, long long len, uint16_t* out_buf,
                    int rows, int cols, int bits) try {
  std::vector<uint16_t> px;
  if (!rle_decode(data, static_cast<size_t>(len), rows, cols, bits, &px))
    return 1;
  std::memcpy(out_buf, px.data(), px.size() * 2);
  return 0;
} catch (...) {
  return 9;
}

// --- prefetching batch loader ----------------------------------------------

void* cadx_loader_create(const char** paths, const int32_t* labels, int n,
                         int batch_size, int out_h, int out_w, int n_workers,
                         int normalize) {
  if (batch_size <= 0 || out_h <= 0 || out_w <= 0 || n < 0)
    return nullptr;  // a zero batch_size would divide by zero below
  auto* st = new LoaderState();
  st->paths.assign(paths, paths + n);
  st->labels.assign(labels, labels + n);
  st->batch_size = batch_size;
  st->out_h = out_h;
  st->out_w = out_w;
  st->normalize = normalize;
  st->total_batches = (st->paths.size() + batch_size - 1) / batch_size;
  int workers = std::max(1, n_workers);
  for (int i = 0; i < workers; ++i)
    st->workers.emplace_back(worker_loop, st);
  return st;
}

// Fetch the next ready batch. Returns the number of SLOTS filled for this
// batch (including failed parses, which have ok_out=0 and labels_out=-1 —
// callers must filter on ok_out); returns 0 when the epoch is exhausted.
// Buffers must hold batch_size*H*W floats / ints.
// cadx_loader_next + the batch's starting index in the path list, so the
// Python wrapper can map failed slots back to file paths (it rescues
// formats this parser doesn't decode — e.g. JPEG 2000 — via the pure-
// Python reader instead of silently skipping them).
int cadx_loader_next2(void* handle, float* data_out, int32_t* labels_out,
                      int32_t* ok_out, int64_t* start_out) {
  auto* st = static_cast<LoaderState*>(handle);
  std::unique_lock<std::mutex> lk(st->mu);
  if (st->consumed >= st->total_batches) return 0;  // epoch exhausted
  // every claimed batch range is eventually pushed, so this always wakes
  st->cv_ready.wait(lk, [st] { return !st->ready.empty() || st->stop.load(); });
  if (st->ready.empty()) return 0;
  Batch b = std::move(st->ready.front());
  st->ready.pop_front();
  st->consumed++;
  lk.unlock();
  st->cv_space.notify_one();
  std::memcpy(data_out, b.data.data(), b.data.size() * sizeof(float));
  std::memcpy(labels_out, b.labels.data(), b.labels.size() * sizeof(int32_t));
  std::memcpy(ok_out, b.ok.data(), b.ok.size() * sizeof(int32_t));
  *start_out = b.start;
  return b.count;
}

// Decode one JPEG 2000 code-block (EBCOT tier-1). blob = concatenated
// coded bytes; segments (seg_bytes/seg_passes/seg_raw) delimit codeword
// terminations exactly as cadx_tpu/data/j2k.py computes them. kind:
// 0 = LL/LH, 1 = HL, 2 = HH. Writes h*w signed coefficients (magnitude
// bits as decoded — the caller applies mid-point reconstruction).
// Returns 0 on success.
int cadx_j2k_decode_block(const uint8_t* blob, long long blob_len,
                          const int64_t* seg_bytes,
                          const int32_t* seg_passes,
                          const int32_t* seg_raw, int n_segs, int w, int h,
                          int bp_start, int kind, int cbstyle,
                          int64_t* out) try {
  if (w <= 0 || h <= 0 || bp_start < 0 || bp_start > 62) return 1;
  int n_passes = 0;
  for (int i = 0; i < n_segs; ++i) n_passes += seg_passes[i];
  if (n_passes <= 0) {
    std::memset(out, 0, sizeof(int64_t) * w * h);
    return 0;
  }
  // pass schedule: pass 0 = cleanup at bp_start, then SPP/MRP/CUP per
  // lower plane
  std::vector<int> ptype(n_passes), pbp(n_passes);
  ptype[0] = 2;
  pbp[0] = bp_start;
  {
    int bp = bp_start, k = 1;
    while (k < n_passes) {
      bp -= 1;
      if (bp < 0) return 2;  // more passes than bit-planes: corrupt
      for (int t = 0; t < 3 && k < n_passes; ++t, ++k) {
        ptype[k] = t;
        pbp[k] = bp;
      }
    }
  }
  j2k::BlockDec bd;
  bd.w = w;
  bd.h = h;
  bd.kind = kind;
  bd.cbstyle = cbstyle;
  bd.bp_start = bp_start;
  bd.causal = (cbstyle & 8) != 0;
  bd.sig.assign((h + 2) * (w + 2), 0);
  bd.sgnneg.assign((h + 2) * (w + 2), 0);
  bd.visited.assign(h * w, 0);
  bd.refined.assign(h * w, 0);
  bd.mag.assign(static_cast<size_t>(h) * w, 0);
  bd.mq.reset_ctx();
  const bool reset_ctx = cbstyle & 2;
  const bool segsym = cbstyle & 32;

  long long pos = 0;
  int k = 0;
  for (int s = 0; s < n_segs && k < n_passes; ++s) {
    long long len = seg_bytes[s];
    if (len < 0 || pos + len > blob_len) return 3;
    bd.use_raw = seg_raw[s] != 0;
    if (bd.use_raw)
      bd.raw.init(blob + pos, len);
    else
      bd.mq.init(blob + pos, len);  // contexts persist across segments
    for (int i = 0; i < seg_passes[s] && k < n_passes; ++i, ++k) {
      int t = ptype[k], bp = pbp[k];
      if (t == 0)
        bd.spp(bp);
      else if (t == 1)
        bd.mrp(bp);
      else {
        bd.cup(bp);
        if (segsym && !bd.use_raw)
          for (int j = 0; j < 4; ++j) bd.mq.decode(j2k::kCtxUni);
        std::fill(bd.visited.begin(), bd.visited.end(), 0);
      }
      if (reset_ctx) bd.mq.reset_ctx();
    }
    pos += len;
  }
  const int p = w + 2;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int64_t m = bd.mag[static_cast<size_t>(y) * w + x];
      out[static_cast<size_t>(y) * w + x] =
          bd.sgnneg[(y + 1) * p + x + 1] ? -m : m;
    }
  return 0;
} catch (...) {
  // bad_alloc from hostile code-block dims must not unwind the C ABI
  return 9;
}

int cadx_loader_next(void* handle, float* data_out, int32_t* labels_out,
                     int32_t* ok_out) {
  int64_t start_unused = 0;
  return cadx_loader_next2(handle, data_out, labels_out, ok_out,
                           &start_unused);
}

// One 1D inverse 5/3 lifting pass (T.800 F.3.8) over a 2D plane, along
// rows (axis=1) or columns (axis=0) — the hot loop of
// cadx_tpu/data/j2k.py::_idwt53_1d (bit-identity pinned by
// tests/test_j2k.py). parity = u0&1 of the merged signal (0: even
// samples come from `low`). Symmetric extension of i+-1 only maps
// -1 -> 1 and n -> n-2, handled inline. All >> on negatives are
// arithmetic (floor), matching numpy int64 semantics.
int cadx_idwt53_1d(const int64_t* low, const int64_t* high, int n_low,
                   int n_high, int other, int parity, int axis,
                   int64_t* out) {
  const int n = n_low + n_high;
  if (n < 2 || other <= 0 || axis < 0 || axis > 1) return 1;
  const int p_low = parity, p_high = 1 - parity;
  auto sym = [n](int i) { return i < 0 ? 1 : (i >= n ? n - 2 : i); };
  if (axis == 0) {
    // low: (n_low, other), high: (n_high, other), out: (n, other)
    // step 1 (low rows): out[g] = low - floor((H[g-1] + H[g+1] + 2)/4)
    for (int i = 0; i < n_low; ++i) {
      const int g = 2 * i + p_low;
      const int64_t* hl = high + static_cast<size_t>((sym(g - 1) - p_high) / 2) * other;
      const int64_t* hr = high + static_cast<size_t>((sym(g + 1) - p_high) / 2) * other;
      const int64_t* lo = low + static_cast<size_t>(i) * other;
      int64_t* o = out + static_cast<size_t>(g) * other;
      for (int j = 0; j < other; ++j)
        o[j] = lo[j] - ((hl[j] + hr[j] + 2) >> 2);
    }
    // step 2 (high rows): out[g] = high + floor((x[g-1] + x[g+1])/2)
    for (int i = 0; i < n_high; ++i) {
      const int g = 2 * i + p_high;
      const int64_t* xl = out + static_cast<size_t>(sym(g - 1)) * other;
      const int64_t* xr = out + static_cast<size_t>(sym(g + 1)) * other;
      const int64_t* hi = high + static_cast<size_t>(i) * other;
      int64_t* o = out + static_cast<size_t>(g) * other;
      for (int j = 0; j < other; ++j) o[j] = hi[j] + ((xl[j] + xr[j]) >> 1);
    }
  } else {
    // low: (other, n_low), high: (other, n_high), out: (other, n)
    for (int r = 0; r < other; ++r) {
      const int64_t* lo = low + static_cast<size_t>(r) * n_low;
      const int64_t* hi = high + static_cast<size_t>(r) * n_high;
      int64_t* o = out + static_cast<size_t>(r) * n;
      for (int i = 0; i < n_low; ++i) {
        const int g = 2 * i + p_low;
        o[g] = lo[i] - ((hi[(sym(g - 1) - p_high) / 2] +
                         hi[(sym(g + 1) - p_high) / 2] + 2) >>
                        2);
      }
      for (int i = 0; i < n_high; ++i) {
        const int g = 2 * i + p_high;
        o[g] = hi[i] + ((o[sym(g - 1)] + o[sym(g + 1)]) >> 1);
      }
    }
  }
  return 0;
}

void cadx_loader_destroy(void* handle) {
  auto* st = static_cast<LoaderState*>(handle);
  st->stop.store(true);
  st->cv_space.notify_all();
  st->cv_ready.notify_all();
  for (auto& t : st->workers)
    if (t.joinable()) t.join();
  delete st;
}

}  // extern "C"
