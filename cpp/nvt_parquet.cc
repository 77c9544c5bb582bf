// Native parquet column-chunk encoder for the shuffled-write hot path.
//
// TPU-native framework counterpart of the reference's write phase: the
// reference leans on cudf's GPU parquet encoder for to_parquet
// (reference bench/examples/MultiGPUBench.md "Output-File Count"); on a
// TPU VM the encode runs on the host cores, so it must be speed-of-light
// C++ — arrow's single-threaded encoder measured 2.0M rows/s on the
// 40-column Criteo output profile while this encoder targets >3x that by
//   * fusing the shuffle window's gather INTO the encode (the separate
//     permute-landing pass was 0.35 us/row of the stream's budget),
//   * scalar-but-tight DELTA_BINARY_PACKED / BYTE_STREAM_SPLIT kernels,
//   * zstd only where it pays (floats/strings; delta-packed ints ship raw).
//
// C ABI (ctypes; see nvtabular_tpu/io/native_parquet.py):
//   nvtpq_open(path)                     -> handle (writes "PAR1")
//   nvtpq_write_column(handle, srcs, npieces, gidx, n, dtype, enc, codec,
//                      level, out_meta[4]) -> 0 ok
//   nvtpq_tell(handle)                   -> current file offset
//   nvtpq_close(handle)                  -> 0 ok (no footer: Python appends
//                                           the thrift FileMetaData)
//
// Pages are DataPage V1, REQUIRED columns only (no def/rep levels); one
// page per column chunk per row group. Thrift compact PageHeaders are
// emitted inline here; the (cold) footer is Python's job.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <type_traits>
#include <vector>

#include <unistd.h>

#include <zstd.h>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

// ---------------------------------------------------------------- thrift
// Minimal thrift compact-protocol writer (just what PageHeader needs).
struct ThriftBuf {
  std::vector<uint8_t> buf;
  int16_t last_fid = 0;

  void u8(uint8_t b) { buf.push_back(b); }
  void uleb(uint64_t v) {
    while (v >= 0x80) {
      u8(static_cast<uint8_t>(v) | 0x80);
      v >>= 7;
    }
    u8(static_cast<uint8_t>(v));
  }
  static uint64_t zigzag(int64_t v) {
    return (static_cast<uint64_t>(v) << 1) ^ static_cast<uint64_t>(v >> 63);
  }
  // compact types: I32=5, STRUCT=12
  void field_i32(int16_t fid, int32_t v) {
    field_header(fid, 5);
    uleb(zigzag(v));
  }
  void field_struct(int16_t fid) { field_header(fid, 12); }
  void field_header(int16_t fid, uint8_t type) {
    int delta = fid - last_fid;
    if (delta >= 1 && delta <= 15) {
      u8(static_cast<uint8_t>((delta << 4) | type));
    } else {
      u8(type);
      uleb(zigzag(fid));
    }
    last_fid = fid;
  }
  void stop() { u8(0); }
};

// Encodings / codecs (parquet.thrift enum values).
constexpr int kEncPlain = 0;
constexpr int kEncDelta = 5;
constexpr int kEncByteStreamSplit = 9;
constexpr int kCodecUncompressed = 0;
constexpr int kCodecZstd = 6;

// PageHeader{type=DATA_PAGE(0), uncompressed_page_size, compressed_page_size,
//            data_page_header{num_values, encoding, def=RLE(3), rep=RLE(3)}}
void write_page_header(ThriftBuf* t, int64_t uncomp, int64_t comp,
                       int64_t num_values, int encoding) {
  t->field_i32(1, 0);  // type = DATA_PAGE
  t->field_i32(2, static_cast<int32_t>(uncomp));
  t->field_i32(3, static_cast<int32_t>(comp));
  t->field_struct(5);  // data_page_header
  int16_t outer = t->last_fid;
  t->last_fid = 0;
  t->field_i32(1, static_cast<int32_t>(num_values));
  t->field_i32(2, encoding);
  t->field_i32(3, 3);  // definition_level_encoding = RLE (unused: REQUIRED)
  t->field_i32(4, 3);  // repetition_level_encoding = RLE
  t->stop();
  t->last_fid = outer;
  t->stop();
}

// ---------------------------------------------------------------- handle
struct Writer {
  FILE* f = nullptr;
  int64_t offset = 0;
  std::vector<uint8_t> scratch;   // gathered column values
  std::vector<uint8_t> scratch2;  // fused-op outputs (codes / piped floats)
  std::vector<uint8_t> enc;       // encoded page body
  std::vector<uint8_t> comp;      // compressed page body
};

// --------------------------------------------------------------- fused ops
// Per-column transform applied between the shuffle gather and the page
// encode (the write_dataset fused stream: raw batches reach the file
// workers, which gather their shard and transform it IN the encode pass —
// the execution shape of the reference's lazy to_parquet, where dask
// materializes the workflow transform inside the write task, reference
// nvtabular/workflow/workflow.py:239-248). The transform itself is the
// SERVING library's kernels (nvt_cat_encode_* / nvt_cont_pipe_*), invoked
// through function pointers resolved by ctypes at spec-build time, so the
// fused stream's output is bit-identical to the two-phase host transform.
struct NvtpqOp {  // POD — layout mirrored by ctypes in io/native_parquet.py
  int32_t kind;      // 0=none, 1=cat probe, 2=cont pipe
  int32_t in_dtype;  // raw source dtype: 0=int32 1=int64 2=float32 3=float64
  const void* fn;    // serving symbol (cat encode / cont pipe) address
  void* table;       // cat table handle (kind 1)
  int32_t null_index;
  int32_t oov_index;
  int32_t offset;
  int32_t has_fill;
  double fill, lo, hi, sub, div;  // cont stage params (kind 2)
  int32_t has_lo, has_hi, do_log, has_norm;
};

typedef void (*CatEncodeI32Fn)(void*, const int32_t*, const uint8_t*, int64_t,
                               int32_t, int32_t, int32_t, int32_t*);
typedef void (*CatEncodeI64Fn)(void*, const int64_t*, const uint8_t*, int64_t,
                               int32_t, int32_t, int32_t, int32_t*);
typedef void (*ContPipeF32Fn)(const float*, float*, int64_t, int, float, int,
                              float, int, float, int, int, float, float);
typedef void (*ContPipeF64Fn)(const double*, double*, int64_t, int, double,
                              int, double, int, double, int, int, double,
                              double);

inline int dtype_size(int dtype) { return (dtype == 0 || dtype == 2) ? 4 : 8; }

// ------------------------------------------------------------- gathering
// gidx entries pack (piece << 48) | row, in DESTINATION order: the shuffle
// window's permutation is applied here, fused with the encode, instead of
// a separate landing pass over every column.
constexpr int64_t kRowMask = (int64_t(1) << 48) - 1;

template <typename T>
void gather_into(T* dst, const void* const* srcs, int npieces,
                 const int64_t* gidx, int64_t n) {
  int64_t i = 0;
#if defined(__AVX512F__)
  // hardware gather, 8 lanes of absolute ADDRESSES (base=nullptr, scale=1):
  // the piece base pointer is itself gathered from a small table by the
  // entry's piece bits, so mixed-piece windows stay fully vectorized.
  // Measured ~20% over the scalar loop on shuffle-window-sized pools.
  if (sizeof(T) == 4 && npieces <= 256) {
    alignas(64) int64_t bases[256];
    for (int p = 0; p < npieces; p++)
      bases[p] = reinterpret_cast<int64_t>(srcs[p]);
    const __m512i rowmask = _mm512_set1_epi64(kRowMask);
    if (npieces == 1) {
      const __m512i vbase = _mm512_set1_epi64(bases[0]);
      for (; i + 8 <= n; i += 8) {
        __m512i g = _mm512_loadu_si512(gidx + i);
        __m512i addr = _mm512_add_epi64(
            vbase, _mm512_slli_epi64(_mm512_and_si512(g, rowmask), 2));
        _mm256_storeu_si256(reinterpret_cast<__m256i*>(dst + i),
                            _mm512_i64gather_epi32(addr, nullptr, 1));
      }
    } else {
      for (; i + 8 <= n; i += 8) {
        __m512i g = _mm512_loadu_si512(gidx + i);
        __m512i vbases = _mm512_i64gather_epi64(
            _mm512_slli_epi64(_mm512_srli_epi64(g, 48), 3), bases, 1);
        __m512i addr = _mm512_add_epi64(
            vbases, _mm512_slli_epi64(_mm512_and_si512(g, rowmask), 2));
        _mm256_storeu_si256(reinterpret_cast<__m256i*>(dst + i),
                            _mm512_i64gather_epi32(addr, nullptr, 1));
      }
    }
  }
#endif
  if (npieces == 1) {
    const T* s = static_cast<const T*>(srcs[0]);
    for (; i < n; i++) dst[i] = s[gidx[i] & kRowMask];
  } else {
    for (; i < n; i++) {
      int64_t g = gidx[i];
      dst[i] = static_cast<const T*>(srcs[g >> 48])[g & kRowMask];
    }
  }
}

template <typename T>
const T* gather(Writer* w, const void* const* srcs, int npieces,
                const int64_t* gidx, int64_t n) {
  if (gidx == nullptr && npieces == 1) return static_cast<const T*>(srcs[0]);
  w->scratch.resize(static_cast<size_t>(n) * sizeof(T));
  T* dst = reinterpret_cast<T*>(w->scratch.data());
  gather_into(dst, srcs, npieces, gidx, n);
  return dst;
}

// PLAIN fused: gather straight into the page body — ONE pass (random load +
// sequential store) instead of gather-to-scratch + memcpy. The plain float
// columns are ~1/3 of the Criteo write window; the scratch round trip was
// half their cost.
template <typename T>
void plain_gathered(std::vector<uint8_t>* out, const void* const* srcs,
                    int npieces, const int64_t* gidx, int64_t n) {
  out->resize(static_cast<size_t>(n) * sizeof(T));
  T* dst = reinterpret_cast<T*>(out->data());
  if (gidx == nullptr && npieces == 1)
    std::memcpy(dst, srcs[0], static_cast<size_t>(n) * sizeof(T));
  else
    gather_into(dst, srcs, npieces, gidx, n);
}

// ------------------------------------------------------- DELTA_BINARY_PACKED
// Spec: parquet-format Encodings.md. Block = 128 values, 4 miniblocks of 32.
// Deltas use two's-complement wraparound arithmetic; decode reverses it.
constexpr int kBlock = 128;
constexpr int kMiniblocks = 4;
constexpr int kMini = kBlock / kMiniblocks;  // 32

inline void put_uleb(std::vector<uint8_t>* out, uint64_t v) {
  while (v >= 0x80) {
    out->push_back(static_cast<uint8_t>(v) | 0x80);
    v >>= 7;
  }
  out->push_back(static_cast<uint8_t>(v));
}
inline void put_zz(std::vector<uint8_t>* out, int64_t v) {
  put_uleb(out, (static_cast<uint64_t>(v) << 1) ^ static_cast<uint64_t>(v >> 63));
}

inline int bit_width(uint64_t v) {
  return v == 0 ? 0 : 64 - __builtin_clzll(v);
}

// Pack `count` values of `width` bits each, LSB-first little-endian.
inline void bitpack(std::vector<uint8_t>* out, const uint64_t* vals, int count,
                    int width) {
  if (width == 0) return;
  size_t bytes = (static_cast<size_t>(count) * width + 7) / 8;
  size_t base = out->size();
  out->resize(base + bytes, 0);
  uint8_t* dst = out->data() + base;
#if defined(__AVX512F__)
  // pair-combine for the full-miniblock common case: adjacent lanes merge
  // into 16 values of 2*width bits (two permutes + a variable shift), so
  // the serial accumulator chain below runs HALF the iterations — the
  // chain, not the shifts, is the pack's cost (measured 1.67 -> 1.18
  // ns/val on Criteo-width miniblocks, bit-identical output).
  if (count == kMini && width < 32) {
    alignas(64) uint64_t comb[16];
    const __m512i wv = _mm512_set1_epi64(width);
    const __m512i evens = _mm512_setr_epi64(0, 2, 4, 6, 8, 10, 12, 14);
    const __m512i odds = _mm512_setr_epi64(1, 3, 5, 7, 9, 11, 13, 15);
    for (int half = 0; half < 2; half++) {
      const __m512i a = _mm512_loadu_si512(vals + half * 16);
      const __m512i b = _mm512_loadu_si512(vals + half * 16 + 8);
      const __m512i lo = _mm512_permutex2var_epi64(a, evens, b);
      const __m512i hi = _mm512_permutex2var_epi64(a, odds, b);
      _mm512_store_si512(comb + half * 8,
                         _mm512_or_si512(lo, _mm512_sllv_epi64(hi, wv)));
    }
    const int w2 = width * 2;
    uint64_t acc = 0;
    int nbits = 0;
    for (int i = 0; i < 16; i++) {
      acc |= comb[i] << nbits;
      nbits += w2;
      if (nbits >= 64) {
        std::memcpy(dst, &acc, 8);
        dst += 8;
        nbits -= 64;
        acc = nbits ? comb[i] >> (w2 - nbits) : 0;
      }
    }
    if (nbits > 0) std::memcpy(dst, &acc, (nbits + 7) / 8);
    return;
  }
#endif
  if (width <= 32) {
    // 64-bit accumulate + whole-word stores: the byte-at-a-time loop this
    // replaces issued width/8 dependent stores per value and dominated the
    // int-column encode (the shuffled-write hot loop). resize() above
    // over-allocates nothing, so spill through a local word and memcpy the
    // exact tail.
    uint64_t acc = 0;
    int nbits = 0;
    for (int i = 0; i < count; i++) {
      acc |= vals[i] << nbits;
      nbits += width;
      if (nbits >= 64) {
        std::memcpy(dst, &acc, 8);
        dst += 8;
        nbits -= 64;
        acc = nbits ? vals[i] >> (width - nbits) : 0;
      }
    }
    if (nbits > 0) {
      const int tail = (nbits + 7) / 8;
      std::memcpy(dst, &acc, tail);
    }
  } else if (width <= 56) {
    uint64_t acc = 0;
    int nbits = 0;
    for (int i = 0; i < count; i++) {
      acc |= vals[i] << nbits;
      nbits += width;
      while (nbits >= 8) {
        *dst++ = static_cast<uint8_t>(acc);
        acc >>= 8;
        nbits -= 8;
      }
    }
    if (nbits > 0) *dst = static_cast<uint8_t>(acc);
  } else {
    unsigned __int128 acc = 0;
    int nbits = 0;
    for (int i = 0; i < count; i++) {
      acc |= static_cast<unsigned __int128>(vals[i]) << nbits;
      nbits += width;
      while (nbits >= 8) {
        *dst++ = static_cast<uint8_t>(acc);
        acc >>= 8;
        nbits -= 8;
      }
    }
    if (nbits > 0) *dst = static_cast<uint8_t>(acc);
  }
}

// Src is any indexable value source: a raw `const T*` (sequential reads) or
// a GatherSrc (the shuffle window's fused random gather — one random load
// per value, block-buffered below so no value is loaded twice and no scratch
// column is materialized).
template <typename T, typename Src>
void delta_pack_src(std::vector<uint8_t>* out, Src v, int64_t n) {
  using UT = typename std::make_unsigned<T>::type;
  using ST = typename std::make_signed<T>::type;
  put_uleb(out, kBlock);
  put_uleb(out, kMiniblocks);
  put_uleb(out, static_cast<uint64_t>(n));
  if (n == 0) {
    put_zz(out, 0);
    return;
  }
  T prev = v[0];
  put_zz(out, static_cast<int64_t>(prev));
  int64_t ndeltas = n - 1;
  int64_t pos = 0;
  uint64_t deltas[kBlock];
  T cur[kBlock];
  while (pos < ndeltas) {
    int count = static_cast<int>(ndeltas - pos < kBlock ? ndeltas - pos : kBlock);
    v.load_block(cur, pos + 1, count);
    // deltas wrap within the COLUMN's width (spec: two's-complement
    // wraparound) so adjusted deltas fit bit_width(T) — an int32 page with
    // 33-bit deltas is rejected by readers
    ST mind = std::numeric_limits<ST>::max();
    UT udeltas[kBlock];
    for (int i = 0; i < count; i++) {
      UT du = static_cast<UT>(cur[i]) - static_cast<UT>(i ? cur[i - 1] : prev);
      udeltas[i] = du;
      ST d = static_cast<ST>(du);
      if (d < mind) mind = d;
    }
    prev = cur[count - 1];
    put_zz(out, static_cast<int64_t>(mind));
    for (int i = 0; i < count; i++)
      deltas[i] = static_cast<uint64_t>(
          static_cast<UT>(udeltas[i] - static_cast<UT>(mind)));
    // pad the trailing partial miniblock with adjusted-zero deltas
    for (int i = count; i < ((count + kMini - 1) / kMini) * kMini; i++)
      deltas[i] = 0;
    int used_minis = (count + kMini - 1) / kMini;
    uint8_t widths[kMiniblocks] = {0, 0, 0, 0};
    for (int m = 0; m < used_minis; m++) {
      uint64_t mx = 0;
      for (int i = m * kMini; i < (m + 1) * kMini; i++)
        if (deltas[i] > mx) mx = deltas[i];
      widths[m] = static_cast<uint8_t>(bit_width(mx));
    }
    // all miniblock widths are always listed, even for a partial block
    for (int m = 0; m < kMiniblocks; m++) out->push_back(widths[m]);
    for (int m = 0; m < used_minis; m++)
      bitpack(out, deltas + m * kMini, kMini, widths[m]);
    pos += count;
  }
}

template <typename T>
struct RawSrc {
  const T* p;
  inline T operator[](int64_t i) const { return p[i]; }
  inline void load_block(T* dst, int64_t start, int count) const {
    std::memcpy(dst, p + start, static_cast<size_t>(count) * sizeof(T));
  }
};

template <typename T>
struct GatherSrc {
  const void* const* srcs;
  int npieces;
  const int64_t* gidx;
  inline T operator[](int64_t i) const {
    int64_t g = gidx[i];
    const void* s = npieces == 1 ? srcs[0] : srcs[g >> 48];
    return static_cast<const T*>(s)[g & kRowMask];
  }
  inline void load_block(T* dst, int64_t start, int count) const {
    gather_into(dst, srcs, npieces, gidx + start, count);  // AVX-512 inside
  }
};

template <typename T>
void delta_pack_gathered(std::vector<uint8_t>* out, const void* const* srcs,
                         int npieces, const int64_t* gidx, int64_t n) {
  if (gidx == nullptr && npieces == 1)
    delta_pack_src<T, RawSrc<T>>(out, RawSrc<T>{static_cast<const T*>(srcs[0])},
                                 n);
  else
    delta_pack_src<T, GatherSrc<T>>(out, GatherSrc<T>{srcs, npieces, gidx}, n);
}

// ------------------------------------------------------ BYTE_STREAM_SPLIT
template <int W>
void byte_stream_split(std::vector<uint8_t>* out, const uint8_t* v, int64_t n) {
  size_t base = out->size();
  out->resize(base + static_cast<size_t>(n) * W);
  uint8_t* dst = out->data() + base;
  for (int b = 0; b < W; b++) {
    uint8_t* d = dst + static_cast<size_t>(b) * n;
    const uint8_t* s = v + b;
    for (int64_t i = 0; i < n; i++) d[i] = s[static_cast<size_t>(i) * W];
  }
}

// Gather the raw shard and run the fused op over it (see NvtpqOp above).
// Leaves the op output in w->scratch2 (int32 codes for kind 1; piped floats
// for kind 2), which the caller then encodes as a single raw piece.
// Shard-sized scratch stays L2-resident between the gather, the op, and the
// encode passes.
int apply_fused_op(Writer* w, const NvtpqOp* op, const void* const* srcs,
                   int npieces, const int64_t* gidx, int64_t n) {
  const int in_sz = dtype_size(op->in_dtype);
  w->scratch.resize(static_cast<size_t>(n) * in_sz);
  if (gidx == nullptr && npieces == 1) {
    std::memcpy(w->scratch.data(), srcs[0], static_cast<size_t>(n) * in_sz);
  } else if (in_sz == 4) {
    gather_into(reinterpret_cast<int32_t*>(w->scratch.data()), srcs, npieces,
                gidx, n);
  } else {
    gather_into(reinterpret_cast<int64_t*>(w->scratch.data()), srcs, npieces,
                gidx, n);
  }
  switch (op->kind) {
    case 1: {  // cat probe -> int32 codes
      w->scratch2.resize(static_cast<size_t>(n) * 4);
      int32_t* out = reinterpret_cast<int32_t*>(w->scratch2.data());
      if (op->in_dtype == 0) {
        reinterpret_cast<CatEncodeI32Fn>(const_cast<void*>(op->fn))(
            op->table, reinterpret_cast<const int32_t*>(w->scratch.data()),
            nullptr, n, op->null_index, op->oov_index, op->offset, out);
      } else if (op->in_dtype == 1) {
        reinterpret_cast<CatEncodeI64Fn>(const_cast<void*>(op->fn))(
            op->table, reinterpret_cast<const int64_t*>(w->scratch.data()),
            nullptr, n, op->null_index, op->oov_index, op->offset, out);
      } else {
        return 5;
      }
      return 0;
    }
    case 2: {  // cont pipe, in place over the gathered shard
      w->scratch2.swap(w->scratch);
      if (op->in_dtype == 2) {
        float* v = reinterpret_cast<float*>(w->scratch2.data());
        reinterpret_cast<ContPipeF32Fn>(const_cast<void*>(op->fn))(
            v, v, n, op->has_fill, static_cast<float>(op->fill), op->has_lo,
            static_cast<float>(op->lo), op->has_hi,
            static_cast<float>(op->hi), op->do_log, op->has_norm,
            static_cast<float>(op->sub), static_cast<float>(op->div));
      } else if (op->in_dtype == 3) {
        double* v = reinterpret_cast<double*>(w->scratch2.data());
        reinterpret_cast<ContPipeF64Fn>(const_cast<void*>(op->fn))(
            v, v, n, op->has_fill, op->fill, op->has_lo, op->lo, op->has_hi,
            op->hi, op->do_log, op->has_norm, op->sub, op->div);
      } else {
        return 5;
      }
      return 0;
    }
    default:
      return 5;
  }
}

// ------------------------------------------------------------- shuffle split
// splitmix64 finalizer — shared with nvtabular_tpu/io/native_parquet.py's
// numpy twin (hash_split); the two MUST stay bit-identical or a window whose
// files mix native/arrow writers would drop or duplicate rows.
inline uint64_t mix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

}  // namespace

extern "C" {

// Build this file's destination-order gather index for a shuffle window of
// WHOLE pieces (the streamed PER_WORKER/PER_PARTITION write path): row r of
// piece p belongs to file ((((r * PHI64) ^ seed) >> 32) * nfiles) >> 32 —
// a Fibonacci multiply-shift (well-mixed HIGH bits for sequential r) with
// a 32x32 range map, ~3ns/row vs ~25ns for the mix64 finalizer this
// replaces; every file worker evaluates the same predicate redundantly
// (nfiles evals/row total), so the split predicate IS the hot loop. The
// split is disjoint and exhaustive with no cross-thread coordination, and
// the selected rows are Fisher-Yates shuffled in place with shuffle_seed
// (mix64-chained — quality matters more than speed there: one eval per
// SELECTED row, not per (row, file)). Replaces the producer's numpy
// permutation + the worker's perm/scatter (all GIL-held) with one GIL-free
// call. Returns the selected row count; gidx must have capacity
// sum(piece_rows). MUST stay bit-identical to native_parquet.hash_split.
long long nvtpq_build_window_index(const long long* piece_rows,
                                   const unsigned long long* piece_seeds,
                                   int npieces, int nfiles, int file_k,
                                   unsigned long long shuffle_seed,
                                   long long* gidx) {
  constexpr uint64_t kPhi = 0x9E3779B97F4A7C15ULL;
  long long cnt = 0;
  for (int p = 0; p < npieces; p++) {
    const uint64_t seed = piece_seeds[p];
    const int64_t n = piece_rows[p];
    const int64_t base = static_cast<int64_t>(p) << 48;
    if (nfiles <= 1) {
      for (int64_t r = 0; r < n; r++) gidx[cnt++] = base | r;
    } else {
      const uint64_t nf = static_cast<uint64_t>(nfiles);
      for (int64_t r = 0; r < n; r++) {
        const uint64_t h = (static_cast<uint64_t>(r) * kPhi) ^ seed;
        if ((((h >> 32) * nf) >> 32) == static_cast<uint64_t>(file_k))
          gidx[cnt++] = base | r;
      }
    }
  }
  uint64_t s = shuffle_seed;
  for (long long i = cnt - 1; i > 0; i--) {
    s = mix64(s);
    const long long j = static_cast<long long>(s % static_cast<uint64_t>(i + 1));
    const int64_t tmp = gidx[i];
    gidx[i] = gidx[j];
    gidx[j] = tmp;
  }
  return cnt;
}

void* nvtpq_open(const char* path) {
  // NVT_PQ_KEEP_PAGES=1: overwrite an existing file IN PLACE ("r+b", no
  // truncate-at-open) so tmpfs/page-cache pages are REUSED instead of
  // freed and re-provisioned — on hosts that throttle first-touch of new
  // pages (thin-provisioned guest RAM), a rewrite loop over the same
  // files then never pays the provisioning cost. The file is truncated to
  // its true length at close, so no stale tail survives.
  const char* keep = std::getenv("NVT_PQ_KEEP_PAGES");
  FILE* f = nullptr;
  if (keep && keep[0] == '1') f = std::fopen(path, "r+b");
  if (!f) f = std::fopen(path, "wb");
  if (!f) return nullptr;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  if (std::fwrite("PAR1", 1, 4, f) != 4) {
    std::fclose(f);
    return nullptr;
  }
  Writer* w = new Writer();
  w->f = f;
  w->offset = 4;
  return w;
}

long long nvtpq_tell(void* h) { return static_cast<Writer*>(h)->offset; }

// dtype: 0=int32 1=int64 2=float32 3=float64
// encoding: kEncPlain / kEncDelta / kEncByteStreamSplit
// codec: kCodecUncompressed / kCodecZstd (level applies)
// out_meta: [page_offset, total_compressed_size, total_uncompressed_size,
//            header_bytes]
static int write_column_impl(Writer* w, const void* const* srcs, int npieces,
                             const int64_t* gi, long long n, int dtype,
                             int encoding, int codec, int level,
                             long long* out_meta) {
  w->enc.clear();

  switch (encoding) {
    case kEncDelta: {
      if (dtype == 0)
        delta_pack_gathered<int32_t>(&w->enc, srcs, npieces, gi, n);
      else if (dtype == 1)
        delta_pack_gathered<int64_t>(&w->enc, srcs, npieces, gi, n);
      else
        return 2;
      break;
    }
    case kEncByteStreamSplit: {
      if (dtype == 0 || dtype == 2)
        byte_stream_split<4>(
            &w->enc,
            reinterpret_cast<const uint8_t*>(
                gather<int32_t>(w, srcs, npieces, gi, n)),
            n);
      else
        byte_stream_split<8>(
            &w->enc,
            reinterpret_cast<const uint8_t*>(
                gather<int64_t>(w, srcs, npieces, gi, n)),
            n);
      break;
    }
    case kEncPlain: {
      if (dtype == 0 || dtype == 2)
        plain_gathered<int32_t>(&w->enc, srcs, npieces, gi, n);
      else
        plain_gathered<int64_t>(&w->enc, srcs, npieces, gi, n);
      break;
    }
    default:
      return 2;
  }

  int64_t uncomp = static_cast<int64_t>(w->enc.size());
  const uint8_t* body = w->enc.data();
  int64_t body_len = uncomp;
  if (codec == kCodecZstd) {
    size_t bound = ZSTD_compressBound(w->enc.size());
    w->comp.resize(bound);
    size_t got = ZSTD_compress(w->comp.data(), bound, w->enc.data(),
                               w->enc.size(), level);
    if (ZSTD_isError(got)) return 3;
    body = w->comp.data();
    body_len = static_cast<int64_t>(got);
  } else if (codec != kCodecUncompressed) {
    return 3;
  }

  ThriftBuf t;
  write_page_header(&t, uncomp, body_len, n, encoding);

  int64_t page_offset = w->offset;
  if (std::fwrite(t.buf.data(), 1, t.buf.size(), w->f) != t.buf.size())
    return 4;
  if (body_len > 0 &&
      std::fwrite(body, 1, static_cast<size_t>(body_len), w->f) !=
          static_cast<size_t>(body_len))
    return 4;
  w->offset += static_cast<int64_t>(t.buf.size()) + body_len;

  out_meta[0] = page_offset;
  out_meta[1] = static_cast<int64_t>(t.buf.size()) + body_len;
  out_meta[2] = static_cast<int64_t>(t.buf.size()) + uncomp;
  out_meta[3] = static_cast<int64_t>(t.buf.size());
  return 0;
}

int nvtpq_write_column(void* h, const void* const* srcs, int npieces,
                       const long long* gidx, long long n, int dtype,
                       int encoding, int codec, int level,
                       long long* out_meta) {
  return write_column_impl(static_cast<Writer*>(h), srcs, npieces,
                           reinterpret_cast<const int64_t*>(gidx), n, dtype,
                           encoding, codec, level, out_meta);
}

// Fused variant: gather the RAW shard, apply `op` (cat probe / cont pipe via
// the serving library's kernels — see NvtpqOp), then encode the op's output
// as this column's page. `dtype` is the OUTPUT dtype (int32 codes for cat;
// the pipe dtype for cont). op == NULL or kind 0 degrades to the plain path.
int nvtpq_write_column_op(void* h, const void* const* srcs, int npieces,
                          const long long* gidx, long long n, int dtype,
                          int encoding, int codec, int level,
                          const void* op_ptr, long long* out_meta) {
  Writer* w = static_cast<Writer*>(h);
  const NvtpqOp* op = static_cast<const NvtpqOp*>(op_ptr);
  const int64_t* gi = reinterpret_cast<const int64_t*>(gidx);
  if (op == nullptr || op->kind == 0)
    return write_column_impl(w, srcs, npieces, gi, n, dtype, encoding, codec,
                             level, out_meta);
  int rc = apply_fused_op(w, op, srcs, npieces, gi, n);
  if (rc != 0) return rc;
  const void* one[1] = {w->scratch2.data()};
  return write_column_impl(w, one, 1, nullptr, n, dtype, encoding, codec,
                           level, out_meta);
}

// layout guard for the ctypes mirror (io/native_parquet.py asserts at load)
long long nvtpq_op_sizeof() { return static_cast<long long>(sizeof(NvtpqOp)); }

int nvtpq_close(void* h) {
  Writer* w = static_cast<Writer*>(h);
  // drop any stale tail from a longer previous file (keep-pages mode);
  // the Python footer then appends at the true data end
  std::fflush(w->f);
  if (ftruncate(fileno(w->f), static_cast<off_t>(w->offset)) != 0) {
    std::fclose(w->f);
    delete w;
    return 1;
  }
  int rc = std::fclose(w->f) == 0 ? 0 : 1;
  delete w;
  return rc;
}

}  // extern "C"
