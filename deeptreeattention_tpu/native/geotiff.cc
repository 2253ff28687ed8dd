// Native GeoTIFF decode path for the tile-inference hot loop.
//
// Replaces the role GDAL plays in the reference (windowed raster reads under
// rasterio, reference src/patches.py:5-83) with a small multithreaded
// decoder: parse classic TIFF IFDs, decode strips/tiles (none/deflate/
// packbits/LZW, horizontal predictor), serve arbitrary pixel windows, and —
// the throughput API — extract batches of model-ready float32 patches
// (window read -> band clip -> per-pixel min-max -> nearest resize) in
// parallel across a thread pool, so the host can keep a TPU fed from raw
// tiles without a Python loop.
//
// Exposed as a C ABI consumed by ctypes (deeptreeattention_tpu/geo/native.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <list>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

struct Segment {
  uint64_t offset = 0;
  uint64_t count = 0;
};

enum DType : int32_t {
  DT_UINT8 = 0,
  DT_INT16 = 1,
  DT_UINT16 = 2,
  DT_INT32 = 3,
  DT_UINT32 = 4,
  DT_FLOAT32 = 5,
  DT_FLOAT64 = 6,
  DT_INT8 = 7,
};

size_t dtype_size(int32_t dt) {
  switch (dt) {
    case DT_UINT8:
    case DT_INT8:
      return 1;
    case DT_INT16:
    case DT_UINT16:
      return 2;
    case DT_INT32:
    case DT_UINT32:
    case DT_FLOAT32:
      return 4;
    default:
      return 8;
  }
}

struct Tiff {
  FILE* fh = nullptr;
  std::mutex io_mu;
  bool big_endian = false;

  int64_t width = 0, height = 0, bands = 1;
  int32_t dtype = DT_UINT8;
  int compression = 1;
  int planar = 1;
  int predictor = 1;
  bool tiled = false;
  int64_t tile_w = 0, tile_l = 0;
  int64_t rows_per_strip = 0;
  std::vector<Segment> segments;

  // georeferencing
  double transform[6] = {1, 0, 0, 0, 1, 0};  // a,b,c,d,e,f
  int32_t epsg = 0;
  double nodata = 0;
  int has_nodata = 0;

  // decoded-segment LRU cache: windowed reads cluster heavily within tiles,
  // so re-inflating a ~1 MB tile per 11x11 window would dominate runtime.
  std::mutex cache_mu;
  std::unordered_map<size_t, std::shared_ptr<std::vector<uint8_t>>> cache;
  std::list<size_t> lru;
  std::unordered_map<size_t, std::list<size_t>::iterator> lru_pos;
  size_t cache_bytes = 0;
  size_t cache_cap = 512ull << 20;  // 512 MB default
};

uint64_t rd_u(const uint8_t* p, int n, bool be) {
  uint64_t v = 0;
  if (be) {
    for (int i = 0; i < n; i++) v = (v << 8) | p[i];
  } else {
    for (int i = n - 1; i >= 0; i--) v = (v << 8) | p[i];
  }
  return v;
}

double rd_double(const uint8_t* p, bool be) {
  uint64_t bits = rd_u(p, 8, be);
  double d;
  memcpy(&d, &bits, 8);
  return d;
}

struct TagValue {
  uint16_t type = 0;
  std::vector<double> nums;
  std::string text;
};

bool read_exact(FILE* fh, uint64_t off, void* dst, size_t n) {
  if (fseeko(fh, (off_t)off, SEEK_SET) != 0) return false;
  return fread(dst, 1, n, fh) == n;
}

size_t type_size(uint16_t t) {
  switch (t) {
    case 1: case 2: case 6: case 7: return 1;
    case 3: case 8: return 2;
    case 4: case 9: case 11: return 4;
    case 5: case 10: case 12: return 8;
    default: return 1;
  }
}

bool parse_ifd(Tiff* t, uint64_t ifd_off, std::map<uint16_t, TagValue>* tags) {
  uint8_t buf2[2];
  if (!read_exact(t->fh, ifd_off, buf2, 2)) return false;
  uint64_t n = rd_u(buf2, 2, t->big_endian);
  std::vector<uint8_t> raw(n * 12);
  if (!read_exact(t->fh, ifd_off + 2, raw.data(), raw.size())) return false;

  for (uint64_t i = 0; i < n; i++) {
    const uint8_t* e = raw.data() + i * 12;
    uint16_t tag = (uint16_t)rd_u(e, 2, t->big_endian);
    uint16_t typ = (uint16_t)rd_u(e + 2, 2, t->big_endian);
    uint64_t count = rd_u(e + 4, 4, t->big_endian);
    size_t total = type_size(typ) * count;
    if (total > (64ull << 20)) continue;  // corrupt count: no 64MB+ tags

    std::vector<uint8_t> data(total);
    if (total <= 4) {
      memcpy(data.data(), e + 8, total);
    } else {
      uint64_t ptr = rd_u(e + 8, 4, t->big_endian);
      if (!read_exact(t->fh, ptr, data.data(), total)) continue;
    }

    TagValue v;
    v.type = typ;
    if (typ == 2) {
      v.text.assign((const char*)data.data(), total);
    } else {
      for (uint64_t k = 0; k < count; k++) {
        const uint8_t* p = data.data() + k * type_size(typ);
        double num = 0;
        switch (typ) {
          case 1: num = (double)rd_u(p, 1, t->big_endian); break;
          case 3: num = (double)rd_u(p, 2, t->big_endian); break;
          case 4: num = (double)rd_u(p, 4, t->big_endian); break;
          case 6: num = (double)(int8_t)rd_u(p, 1, t->big_endian); break;
          case 8: num = (double)(int16_t)rd_u(p, 2, t->big_endian); break;
          case 9: num = (double)(int32_t)rd_u(p, 4, t->big_endian); break;
          case 5: {
            uint64_t a = rd_u(p, 4, t->big_endian), b = rd_u(p + 4, 4, t->big_endian);
            // zero denominator is spec-undefined -> NaN (numpy-codec parity)
            num = b ? (double)a / (double)b
                    : std::numeric_limits<double>::quiet_NaN();
            break;
          }
          case 11: {
            uint32_t bits = (uint32_t)rd_u(p, 4, t->big_endian);
            float f;
            memcpy(&f, &bits, 4);
            num = f;
            break;
          }
          case 12: num = rd_double(p, t->big_endian); break;
          default: num = 0;
        }
        v.nums.push_back(num);
      }
    }
    (*tags)[tag] = std::move(v);
  }
  return true;
}

int dtype_from(int bps, int fmt) {
  if (bps == 8) return fmt == 2 ? DT_INT8 : DT_UINT8;
  if (bps == 16) return fmt == 2 ? DT_INT16 : DT_UINT16;
  if (bps == 32) return fmt == 3 ? DT_FLOAT32 : (fmt == 2 ? DT_INT32 : DT_UINT32);
  if (bps == 64 && fmt == 3) return DT_FLOAT64;
  return -1;  // int64/uint64/unknown: fail open -> numpy codec handles
}

// ---------------------------------------------------------------------------
// decompressors
// ---------------------------------------------------------------------------

bool inflate_zlib(const uint8_t* src, size_t n, uint8_t* dst, size_t out_n) {
  uLongf out_len = out_n;
  return uncompress(dst, &out_len, src, n) == Z_OK;
}

void packbits_decode(const uint8_t* src, size_t n, uint8_t* dst, size_t out_n) {
  size_t i = 0, o = 0;
  while (i < n && o < out_n) {
    int8_t c = (int8_t)src[i++];
    if (c >= 0) {
      size_t run = (size_t)c + 1;
      run = std::min(run, out_n - o);
      if (i + run > n) run = n - i;
      memcpy(dst + o, src + i, run);
      i += run;
      o += run;
    } else if (c != -128) {
      size_t run = (size_t)(1 - c);
      run = std::min(run, out_n - o);
      if (i >= n) break;
      memset(dst + o, src[i++], run);
      o += run;
    }
  }
}

void lzw_decode(const uint8_t* src, size_t n, uint8_t* dst, size_t out_n) {
  // TIFF LZW: MSB-first codes, early change.
  static const int CLEAR = 256, EOI = 257;
  std::vector<std::string> table;
  auto reset = [&]() {
    table.clear();
    table.reserve(4096);
    for (int i = 0; i < 256; i++) table.push_back(std::string(1, (char)i));
    table.push_back("");  // 256
    table.push_back("");  // 257
  };
  reset();
  int nbits = 9;
  uint32_t acc = 0;
  int bits = 0;
  int prev = -1;
  size_t o = 0;
  for (size_t i = 0; i < n && o < out_n; i++) {
    acc = (acc << 8) | src[i];
    bits += 8;
    while (bits >= nbits && o < out_n) {
      int code = (int)((acc >> (bits - nbits)) & ((1u << nbits) - 1));
      bits -= nbits;
      if (code == CLEAR) {
        reset();
        nbits = 9;
        prev = -1;
        continue;
      }
      if (code == EOI) return;
      std::string entry;
      if (prev < 0) {
        entry = table[code];
      } else if (code < (int)table.size() && !(code >= 256 && table[code].empty() && code < 258)) {
        entry = table[code];
        table.push_back(table[prev] + entry.substr(0, 1));
      } else {
        entry = table[prev] + table[prev].substr(0, 1);
        table.push_back(entry);
      }
      size_t take = std::min(entry.size(), out_n - o);
      memcpy(dst + o, entry.data(), take);
      o += take;
      prev = code;
      if ((int)table.size() == (1 << nbits) - 1 && nbits < 12) nbits++;
    }
  }
}

// decode one segment into seg_h x seg_w x bands_in_seg native-dtype buffer
bool decode_segment(Tiff* t, size_t idx, int64_t seg_h, int64_t seg_w,
                    int64_t bands_in_seg, std::vector<uint8_t>* out) {
  const Segment& s = t->segments[idx];
  size_t nbytes = (size_t)seg_h * seg_w * bands_in_seg * dtype_size(t->dtype);
  out->resize(nbytes);

  std::vector<uint8_t> raw(s.count);
  {
    std::lock_guard<std::mutex> lk(t->io_mu);
    if (!read_exact(t->fh, s.offset, raw.data(), raw.size())) return false;
  }

  switch (t->compression) {
    case 1:
      memcpy(out->data(), raw.data(), std::min(nbytes, raw.size()));
      break;
    case 8:
    case 32946:
      if (!inflate_zlib(raw.data(), raw.size(), out->data(), nbytes)) return false;
      break;
    case 32773:
      packbits_decode(raw.data(), raw.size(), out->data(), nbytes);
      break;
    case 5:
      lzw_decode(raw.data(), raw.size(), out->data(), nbytes);
      break;
    default:
      return false;
  }

  // byte swap big-endian samples to host little-endian
  size_t esz = dtype_size(t->dtype);
  if (t->big_endian && esz > 1) {
    uint8_t* p = out->data();
    for (size_t i = 0; i < nbytes; i += esz) {
      std::reverse(p + i, p + i + esz);
    }
  }

  if (t->predictor == 2 && esz <= 4) {
    // horizontal differencing: cumulative sum along each row per band
    // layout: [seg_h, seg_w, bands]
    for (int64_t r = 0; r < seg_h; r++) {
      uint8_t* row = out->data() + (size_t)r * seg_w * bands_in_seg * esz;
      for (int64_t c = 1; c < seg_w; c++) {
        for (int64_t b = 0; b < bands_in_seg; b++) {
          uint8_t* cur = row + ((size_t)c * bands_in_seg + b) * esz;
          uint8_t* prv = row + ((size_t)(c - 1) * bands_in_seg + b) * esz;
          if (esz == 1) {
            *cur = (uint8_t)(*cur + *prv);
          } else if (esz == 2) {
            uint16_t a, bb;
            memcpy(&a, cur, 2);
            memcpy(&bb, prv, 2);
            a = (uint16_t)(a + bb);
            memcpy(cur, &a, 2);
          } else {
            uint32_t a, bb;
            memcpy(&a, cur, 4);
            memcpy(&bb, prv, 4);
            a += bb;
            memcpy(cur, &a, 4);
          }
        }
      }
    }
  }
  return true;
}

std::shared_ptr<std::vector<uint8_t>> decode_segment_cached(
    Tiff* t, size_t idx, int64_t seg_h, int64_t seg_w, int64_t bands_in_seg) {
  {
    std::lock_guard<std::mutex> lk(t->cache_mu);
    auto it = t->cache.find(idx);
    if (it != t->cache.end()) {
      t->lru.erase(t->lru_pos[idx]);
      t->lru.push_front(idx);
      t->lru_pos[idx] = t->lru.begin();
      return it->second;
    }
  }
  auto buf = std::make_shared<std::vector<uint8_t>>();
  if (!decode_segment(t, idx, seg_h, seg_w, bands_in_seg, buf.get()))
    return nullptr;
  std::lock_guard<std::mutex> lk(t->cache_mu);
  if (!t->cache.count(idx)) {
    t->cache[idx] = buf;
    t->lru.push_front(idx);
    t->lru_pos[idx] = t->lru.begin();
    t->cache_bytes += buf->size();
    while (t->cache_bytes > t->cache_cap && t->lru.size() > 1) {
      size_t victim = t->lru.back();
      t->lru.pop_back();
      t->cache_bytes -= t->cache[victim]->size();
      t->cache.erase(victim);
      t->lru_pos.erase(victim);
    }
  }
  return t->cache[idx];
}

template <typename T>
void scatter_segment(const uint8_t* seg, int64_t seg_h, int64_t seg_w,
                     int64_t bands_in_seg, int64_t seg_r0, int64_t seg_c0,
                     int64_t r0, int64_t c0, int64_t h, int64_t w,
                     int64_t out_bands, int64_t band_off, uint8_t* out) {
  // out layout: [out_bands, h, w] (band-major)
  const T* src = (const T*)seg;
  T* dst = (T*)out;
  int64_t rs = std::max(r0 - seg_r0, (int64_t)0);
  int64_t re = std::min(r0 + h - seg_r0, seg_h);
  int64_t cs = std::max(c0 - seg_c0, (int64_t)0);
  int64_t ce = std::min(c0 + w - seg_c0, seg_w);
  for (int64_t r = rs; r < re; r++) {
    for (int64_t b = 0; b < bands_in_seg; b++) {
      T* drow = dst + ((band_off + b) * h + (seg_r0 + r - r0)) * w + (seg_c0 + cs - c0);
      const T* srow = src + ((size_t)r * seg_w + cs) * bands_in_seg + b;
      for (int64_t c = cs; c < ce; c++) {
        *drow++ = *srow;
        srow += bands_in_seg;
      }
    }
  }
}

void scatter(Tiff* t, const std::vector<uint8_t>& seg, int64_t seg_h, int64_t seg_w,
             int64_t bands_in_seg, int64_t seg_r0, int64_t seg_c0, int64_t r0,
             int64_t c0, int64_t h, int64_t w, int64_t band_off, uint8_t* out) {
  switch (dtype_size(t->dtype)) {
    case 1:
      scatter_segment<uint8_t>(seg.data(), seg_h, seg_w, bands_in_seg, seg_r0,
                               seg_c0, r0, c0, h, w, t->bands, band_off, out);
      break;
    case 2:
      scatter_segment<uint16_t>(seg.data(), seg_h, seg_w, bands_in_seg, seg_r0,
                                seg_c0, r0, c0, h, w, t->bands, band_off, out);
      break;
    case 4:
      scatter_segment<uint32_t>(seg.data(), seg_h, seg_w, bands_in_seg, seg_r0,
                                seg_c0, r0, c0, h, w, t->bands, band_off, out);
      break;
    default:
      scatter_segment<uint64_t>(seg.data(), seg_h, seg_w, bands_in_seg, seg_r0,
                                seg_c0, r0, c0, h, w, t->bands, band_off, out);
  }
}

// read window [r0:r0+h, c0:c0+w] clamped; out is pre-zeroed [bands, h, w]
bool read_window(Tiff* t, int64_t r0, int64_t c0, int64_t h, int64_t w,
                 uint8_t* out) {
  int64_t rc0 = std::max(r0, (int64_t)0), cc0 = std::max(c0, (int64_t)0);
  int64_t rc1 = std::min(r0 + h, t->height), cc1 = std::min(c0 + w, t->width);
  if (rc1 <= rc0 || cc1 <= cc0) return true;  // fully outside: stays zero

  int64_t planes = (t->planar == 2) ? t->bands : 1;
  int64_t bands_in_seg = (t->planar == 2) ? 1 : t->bands;

  if (t->tiled) {
    int64_t across = (t->width + t->tile_w - 1) / t->tile_w;
    int64_t down = (t->height + t->tile_l - 1) / t->tile_l;
    int64_t per_plane = across * down;
    for (int64_t pl = 0; pl < planes; pl++) {
      for (int64_t tr = rc0 / t->tile_l; tr <= (rc1 - 1) / t->tile_l; tr++) {
        for (int64_t tc = cc0 / t->tile_w; tc <= (cc1 - 1) / t->tile_w; tc++) {
          size_t idx = (size_t)(pl * per_plane + tr * across + tc);
          auto seg_p = decode_segment_cached(t, idx, t->tile_l, t->tile_w, bands_in_seg);
          if (!seg_p) return false;
          const std::vector<uint8_t>& seg = *seg_p;
          scatter(t, seg, t->tile_l, t->tile_w, bands_in_seg, tr * t->tile_l,
                  tc * t->tile_w, r0, c0, h, w, pl * bands_in_seg, out);
        }
      }
    }
  } else {
    int64_t strips = (t->height + t->rows_per_strip - 1) / t->rows_per_strip;
    for (int64_t pl = 0; pl < planes; pl++) {
      for (int64_t s = rc0 / t->rows_per_strip; s <= (rc1 - 1) / t->rows_per_strip; s++) {
        int64_t top = s * t->rows_per_strip;
        int64_t seg_h = std::min(t->rows_per_strip, t->height - top);
        size_t idx = (size_t)(pl * strips + s);
        auto seg_p = decode_segment_cached(t, idx, seg_h, t->width, bands_in_seg);
        if (!seg_p) return false;
        const std::vector<uint8_t>& seg = *seg_p;
        scatter(t, seg, seg_h, t->width, bands_in_seg, top, 0, r0, c0, h, w,
                pl * bands_in_seg, out);
      }
    }
  }
  return true;
}

template <typename T>
void window_to_patch(const uint8_t* win, int64_t bands, int64_t h, int64_t w,
                     int64_t clip, int64_t size, float* out) {
  // win: [bands, h, w] native; out: [size, size, bands - 2*clip] float32
  // chain: band clip -> per-pixel min-max over bands -> nearest resize
  const T* src = (const T*)win;
  int64_t b0 = (bands > 3) ? clip : 0;
  int64_t nb = (bands > 3) ? bands - 2 * clip : bands;
  for (int64_t orow = 0; orow < size; orow++) {
    int64_t r = orow * h / size;
    for (int64_t ocol = 0; ocol < size; ocol++) {
      int64_t c = ocol * w / size;
      float lo = 3.4e38f, hi = -3.4e38f;
      const T* px = src + (size_t)(b0 * h + r) * w + c;
      for (int64_t b = 0; b < nb; b++) {
        float v = (float)px[(size_t)b * h * w];
        lo = std::min(lo, v);
        hi = std::max(hi, v);
      }
      float rng = hi - lo;
      float inv = rng == 0.f ? 0.f : 1.f / rng;
      float* dst = out + ((size_t)orow * size + ocol) * nb;
      for (int64_t b = 0; b < nb; b++) {
        float v = (float)px[(size_t)b * h * w];
        dst[b] = (v - lo) * inv;
      }
    }
  }
}

}  // namespace

extern "C" {

static void* dta_tiff_open_impl(const char* path) {
  FILE* fh = fopen(path, "rb");
  if (!fh) return nullptr;
  uint8_t hdr[8];
  if (fread(hdr, 1, 8, fh) != 8) {
    fclose(fh);
    return nullptr;
  }
  Tiff* t = new Tiff();
  t->fh = fh;
  if (hdr[0] == 'I' && hdr[1] == 'I') t->big_endian = false;
  else if (hdr[0] == 'M' && hdr[1] == 'M') t->big_endian = true;
  else { delete t; fclose(fh); return nullptr; }
  if (rd_u(hdr + 2, 2, t->big_endian) != 42) { delete t; fclose(fh); return nullptr; }

  uint64_t ifd = rd_u(hdr + 4, 4, t->big_endian);
  std::map<uint16_t, TagValue> tags;
  if (!parse_ifd(t, ifd, &tags)) { delete t; fclose(fh); return nullptr; }

  auto num = [&](uint16_t tag, double dflt) {
    auto it = tags.find(tag);
    return (it != tags.end() && !it->second.nums.empty()) ? it->second.nums[0] : dflt;
  };
  t->width = (int64_t)num(256, 0);
  t->height = (int64_t)num(257, 0);
  t->bands = (int64_t)num(277, 1);
  int bps = (int)num(258, 8);
  int fmt = (int)num(339, 1);
  t->dtype = dtype_from(bps, fmt);
  t->compression = (int)num(259, 1);
  t->planar = (int)num(284, 1);
  t->predictor = (int)num(317, 1);
  // fail open (-> loud numpy-codec path) rather than decode garbage or
  // divide by zero: unsupported dtype/predictor, degenerate geometry
  if (t->dtype < 0 || t->width <= 0 || t->height <= 0 ||
      (t->predictor != 1 &&
       !(t->predictor == 2 && dtype_size(t->dtype) <= 4))) {
    delete t; fclose(fh); return nullptr;
  }

  if (tags.count(324)) {
    t->tiled = true;
    t->tile_w = (int64_t)num(322, 0);
    t->tile_l = (int64_t)num(323, 0);
    if (t->tile_w <= 0 || t->tile_l <= 0 || !tags.count(325)) {
      delete t; fclose(fh); return nullptr;
    }
    auto& offs = tags[324].nums;
    auto& cnts = tags[325].nums;
    if (cnts.size() < offs.size()) { delete t; fclose(fh); return nullptr; }
    for (size_t i = 0; i < offs.size(); i++)
      t->segments.push_back({(uint64_t)offs[i], (uint64_t)cnts[i]});
  } else if (tags.count(273)) {
    t->rows_per_strip = (int64_t)num(278, t->height);
    if (t->rows_per_strip <= 0 || !tags.count(279)) {
      delete t; fclose(fh); return nullptr;
    }
    auto& offs = tags[273].nums;
    auto& cnts = tags[279].nums;
    if (cnts.size() < offs.size()) { delete t; fclose(fh); return nullptr; }
    for (size_t i = 0; i < offs.size(); i++)
      t->segments.push_back({(uint64_t)offs[i], (uint64_t)cnts[i]});
  } else {
    delete t;
    fclose(fh);
    return nullptr;
  }

  if (tags.count(33550) && tags.count(33922) &&
      tags[33550].nums.size() >= 2 && tags[33922].nums.size() >= 6) {
    double sx = tags[33550].nums[0], sy = tags[33550].nums[1];
    auto& tp = tags[33922].nums;
    double west = tp[3] - tp[0] * sx;
    double north = tp[4] + tp[1] * sy;
    t->transform[0] = sx; t->transform[2] = west;
    t->transform[4] = -sy; t->transform[5] = north;
  }
  if (tags.count(34735)) {
    auto& k = tags[34735].nums;
    for (size_t i = 4; i + 3 < k.size(); i += 4) {
      // ProjectedCSTypeGeoKey, else GeographicTypeGeoKey (4326-style files)
      if ((int)k[i] == 3072) t->epsg = (int32_t)k[i + 3];
      else if ((int)k[i] == 2048 && t->epsg == 0) t->epsg = (int32_t)k[i + 3];
    }
  }
  if (tags.count(42113)) {
    try {
      t->nodata = std::stod(tags[42113].text);
      t->has_nodata = 1;
    } catch (...) {}
  }
  return t;
}

void* dta_tiff_open(const char* path) {
  // no C++ exception may cross the C ABI: bad_alloc/etc. on corrupt files
  // become a clean nullptr (-> numpy-codec fallback raises in Python)
  try {
    return dta_tiff_open_impl(path);
  } catch (...) {
    return nullptr;
  }
}

// info: [width, height, bands, dtype, epsg, has_nodata]
void dta_tiff_info(void* handle, int64_t* info, double* transform, double* nodata) {
  Tiff* t = (Tiff*)handle;
  info[0] = t->width;
  info[1] = t->height;
  info[2] = t->bands;
  info[3] = t->dtype;
  info[4] = t->epsg;
  info[5] = t->has_nodata;
  memcpy(transform, t->transform, 6 * sizeof(double));
  *nodata = t->nodata;
}

// out must hold bands*h*w elements of the tiff dtype; boundless zero fill
int dta_tiff_read_window(void* handle, int64_t r0, int64_t c0, int64_t h,
                         int64_t w, void* out) {
  Tiff* t = (Tiff*)handle;
  memset(out, 0, (size_t)t->bands * h * w * dtype_size(t->dtype));
  return read_window(t, r0, c0, h, w, (uint8_t*)out) ? 0 : 1;
}

// N model-ready patches: for each (row, col) anchor, read win_h x win_w
// window, band-clip, per-pixel min-max over bands, nearest-resize to
// size x size. out: [n, size, size, out_bands] float32. Parallel.
int dta_tiff_read_patches(void* handle, const int64_t* rowcols, int64_t n,
                          int64_t win_h, int64_t win_w, int64_t clip,
                          int64_t size, float* out) {
  Tiff* t = (Tiff*)handle;
  int64_t nb = (t->bands > 3) ? t->bands - 2 * clip : t->bands;
  size_t win_bytes = (size_t)t->bands * win_h * win_w * dtype_size(t->dtype);
  size_t patch_elems = (size_t)size * size * nb;

  int workers = std::min((int64_t)std::thread::hardware_concurrency(), n);
  workers = std::max(workers, 1);
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);

  auto work = [&]() {
    std::vector<uint8_t> win(win_bytes);
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      memset(win.data(), 0, win_bytes);
      if (!read_window(t, rowcols[2 * i], rowcols[2 * i + 1], win_h, win_w,
                       win.data())) {
        err.store(1);
        continue;
      }
      float* dst = out + (size_t)i * patch_elems;
      switch (dtype_size(t->dtype)) {
        case 1:
          window_to_patch<uint8_t>(win.data(), t->bands, win_h, win_w, clip, size, dst);
          break;
        case 2:
          if (t->dtype == DT_INT16)
            window_to_patch<int16_t>(win.data(), t->bands, win_h, win_w, clip, size, dst);
          else
            window_to_patch<uint16_t>(win.data(), t->bands, win_h, win_w, clip, size, dst);
          break;
        case 4:
          if (t->dtype == DT_FLOAT32)
            window_to_patch<float>(win.data(), t->bands, win_h, win_w, clip, size, dst);
          else if (t->dtype == DT_INT32)
            window_to_patch<int32_t>(win.data(), t->bands, win_h, win_w, clip, size, dst);
          else
            window_to_patch<uint32_t>(win.data(), t->bands, win_h, win_w, clip, size, dst);
          break;
        default:
          window_to_patch<double>(win.data(), t->bands, win_h, win_w, clip, size, dst);
      }
    }
  };

  std::vector<std::thread> pool;
  for (int i = 0; i < workers; i++) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return err.load();
}

void dta_tiff_close(void* handle) {
  Tiff* t = (Tiff*)handle;
  if (t) {
    fclose(t->fh);
    delete t;
  }
}

// ---------------------------------------------------------------------------
// parallel deflate for the GeoTIFF writer (geo/tiff.py write path).
// data: concatenated raw segments; offsets/sizes index into it. Each output
// segment is written at out + i * out_stride; out_sizes[i] receives the
// compressed length (or 0 on failure). Returns the number of failures.
// out_stride must be >= compressBound(max segment size).
// ---------------------------------------------------------------------------
int dta_deflate_segments(const uint8_t* data, const int64_t* offsets,
                         const int64_t* sizes, int n_segments, int level,
                         int workers, uint8_t* out, int64_t out_stride,
                         int64_t* out_sizes) {
  if (workers < 1) workers = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n_segments) return;
      uLongf out_len = (uLongf)out_stride;
      int rc = compress2(out + (int64_t)i * out_stride, &out_len,
                         data + offsets[i], (uLong)sizes[i], level);
      if (rc == Z_OK) {
        out_sizes[i] = (int64_t)out_len;
      } else {
        out_sizes[i] = 0;
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int i = 0; i < workers; i++) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Parallel raw-deflate decompression: segment i (at data+offsets[i],
// sizes[i] bytes of zlib stream) inflates into out + i*out_stride.
// out_sizes[i] receives the inflated byte count (0 on failure). Used by the
// in-house HDF5 reader (geo/hdf5.py) where every chunk's decompressed size
// is known up front (full chunk dims x itemsize).
int dta_inflate_segments(const uint8_t* data, const int64_t* offsets,
                         const int64_t* sizes, int n_segments, int workers,
                         uint8_t* out, int64_t out_stride,
                         int64_t* out_sizes) {
  if (workers < 1) workers = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n_segments) return;
      uLongf out_len = (uLongf)out_stride;
      int rc = uncompress(out + (int64_t)i * out_stride, &out_len,
                          data + offsets[i], (uLong)sizes[i]);
      if (rc == Z_OK) {
        out_sizes[i] = (int64_t)out_len;
      } else {
        out_sizes[i] = 0;
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int i = 0; i < workers; i++) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
