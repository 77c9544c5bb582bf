// Native serving kernels: hash-map Categorify encode + vectorized fill.
//
// C++ re-design of the reference's Triton inference extension
// (reference cpp/nvtabular/inference/categorify.cc:31-329 and fill.cc:32-106):
// the same encoding contract (NULL_INDEX=1, OOV=2.., codes from the
// frequency-sorted vocab) behind a plain C ABI consumed via ctypes —
// no pybind11 dependency in this environment.
//
// Cross-instance cache: tables are registered under a string name (the vocab
// artifact path); concurrent model instances share one table via a
// refcounted registry guarded by a mutex — the analog of the reference's
// weak_ptr cache (categorify.cc:267-285).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC nvt_serving.cc -o libnvt_serving.so

#include <sys/mman.h>

#include <algorithm>
#include <array>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <utility>
#include <vector>

#ifndef MADV_POPULATE_WRITE
#define MADV_POPULATE_WRITE 23  // linux 5.14+; EINVAL (harmless) before that
#endif

#if defined(__AVX512F__) && defined(__AVX512DQ__) && defined(__AVX512VL__)
#include <immintrin.h>
#define NVT_VEC_PROBE 1
#endif

namespace {

inline uint64_t mix64(uint64_t x) {
  // splitmix64 finalizer
  x ^= x >> 30;
  x *= 0xbf58476d1ce4e5b9ULL;
  x ^= x >> 27;
  x *= 0x94d049bb133111ebULL;
  x ^= x >> 31;
  return x;
}

#ifdef NVT_VEC_PROBE
// 8-lane splitmix64 finalizer — MUST stay bit-identical to mix64() above
// (the scalar build path and the vector probe address the same tables).
inline __m512i mix64_vec(__m512i x) {
  const __m512i c1 = _mm512_set1_epi64(static_cast<long long>(0xbf58476d1ce4e5b9ULL));
  const __m512i c2 = _mm512_set1_epi64(static_cast<long long>(0x94d049bb133111ebULL));
  x = _mm512_xor_si512(x, _mm512_srli_epi64(x, 30));
  x = _mm512_mullo_epi64(x, c1);
  x = _mm512_xor_si512(x, _mm512_srli_epi64(x, 27));
  x = _mm512_mullo_epi64(x, c2);
  x = _mm512_xor_si512(x, _mm512_srli_epi64(x, 31));
  return x;
}

inline bool vector_probe_enabled() {
  // read per call (once per COLUMN encode, not per value): keeps the knob
  // togglable in-process, which interleaved A/B measurement on this
  // noisy-page-provisioning VM requires
  const char* e = std::getenv("NVT_VECTOR_PROBE");
  return e == nullptr || std::atoi(e) != 0;
}
#endif

inline uint64_t hash_bytes(const char* data, size_t len) {
  // FNV-1a 64 then mixed
  uint64_t h = 1469598103934665603ULL;
  for (size_t i = 0; i < len; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= 1099511628211ULL;
  }
  return mix64(h);
}

inline uint64_t next_pow2(uint64_t n) {
  uint64_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

constexpr int64_t kEmpty = INT64_MIN;  // empty-slot sentinel for int keys

// 2MB-aligned anonymous mapping with MADV_HUGEPAGE for the hash tables:
// the encode/count hot loops are memory-latency bound and take one TLB
// miss + page walk per random probe on 4K pages — measured 40 -> 63 M
// probes/s per thread on a 128MB table once the mapping is huge-paged
// (THP is 'madvise' mode on the target hosts). Falls back to the heap
// when mmap fails.
//
// Global span pool: released HugeArray mappings are KEPT MAPPED and
// reused instead of munmap'd. The target VM's host thin-provisions guest
// RAM — first-touch of NEW pages throttles to ~100-170MB/s past a ~3.5GB
// burst, while already-backed pages recycle at full speed — so a fit's
// table-growth ladder that frees-and-remaps GBs pays seconds of host
// faulting unless the spans recycle. Reused spans carry stale bytes; the
// consumers below memset/fill explicitly (sequential writes, ~20GB/s).
struct SpanPool {
  std::mutex mu;
  std::multimap<size_t, void*> spans;  // raw_bytes -> base
  size_t total = 0;

  static size_t max_bytes() {
    static const size_t v = [] {
      const char* e = std::getenv("NVT_SPAN_POOL_MAX");
      return e ? static_cast<size_t>(std::atoll(e)) : (size_t(4) << 30);
    }();
    return v;
  }

  // a span of at least `need` bytes (and at most 1.5x — bounded waste)
  void* take(size_t need, size_t* got) {
    if (!max_bytes()) return nullptr;
    std::lock_guard<std::mutex> lock(mu);
    auto it = spans.lower_bound(need);
    if (it == spans.end() || it->first > need + need / 2) return nullptr;
    void* p = it->second;
    *got = it->first;
    total -= it->first;
    spans.erase(it);
    return p;
  }

  void give(void* p, size_t bytes) {
    if (max_bytes()) {
      std::lock_guard<std::mutex> lock(mu);
      if (total + bytes <= max_bytes()) {
        spans.emplace(bytes, p);
        total += bytes;
        return;
      }
    }
    munmap(p, bytes);
  }
};

inline SpanPool& span_pool() {
  static SpanPool* p = new SpanPool();  // leaked: outlives all arrays
  return *p;
}

template <typename T>
struct HugeArray {
  T* data = nullptr;
  size_t count = 0;
  void* raw = nullptr;
  size_t raw_bytes = 0;  // 0 => heap fallback, free() instead of munmap()
  bool pooled = false;   // span came from (and returns to) span_pool()
  std::thread pop_thread;  // background MADV_POPULATE_WRITE (see populate_async)
  std::shared_ptr<std::atomic<bool>> pop_cancel;

  HugeArray() = default;
  HugeArray(const HugeArray&) = delete;
  HugeArray& operator=(const HugeArray&) = delete;
  ~HugeArray() { release(); }

  void swap(HugeArray& o) noexcept {
    std::swap(data, o.data);
    std::swap(count, o.count);
    std::swap(raw, o.raw);
    std::swap(raw_bytes, o.raw_bytes);
    std::swap(pooled, o.pooled);
    pop_thread.swap(o.pop_thread);
    std::swap(pop_cancel, o.pop_cancel);
  }

  // Fault the mapping's pages in from a BACKGROUND thread. Demand faults on
  // the fit-scan threads serialize on the kernel's per-page bookkeeping —
  // measured: a 4-thread counter scan over right-sized fresh tables runs
  // 110M vals/s while the same scan over warm tables runs 356M; batching the
  // first-touch population through one madvise stream (~3.6 GB/s measured on
  // the target VM) moves that cost off the scan's critical path.
  // MADV_POPULATE_WRITE never alters page CONTENTS, so racing it with
  // concurrent writers is safe; pre-5.14 kernels return EINVAL and the
  // region simply demand-faults as before.
  void populate_async() {
    if (!raw_bytes || count * sizeof(T) < (size_t(16) << 20)) return;
    stop_populate();
    pop_cancel = std::make_shared<std::atomic<bool>>(false);
    auto cancel = pop_cancel;
    char* base = reinterpret_cast<char*>(data);
    const size_t bytes = count * sizeof(T);
    pop_thread = std::thread([base, bytes, cancel]() {
      constexpr size_t kChunk = size_t(32) << 20;
      for (size_t off = 0; off < bytes; off += kChunk) {
        if (cancel->load(std::memory_order_relaxed)) return;
        const size_t len = bytes - off < kChunk ? bytes - off : kChunk;
        if (madvise(base + off, len, MADV_POPULATE_WRITE) != 0) return;
      }
    });
  }

  void stop_populate() {
    if (pop_thread.joinable()) {
      pop_cancel->store(true, std::memory_order_relaxed);
      pop_thread.join();
    }
  }

  // want_huge=false skips the MADV_HUGEPAGE hint: fault-time synchronous
  // compaction costs up to seconds per 100MB under fragmentation, which
  // only pays off for LONG-LIVED probe tables (encode maps). Growth-heavy
  // transient tables (the fit counters, regrown every doubling) measured
  // 3.7s vs 0.17s for one 256MB growth step huge vs not.
  void assign(size_t n, const T& fill, bool want_huge = true) {
    release();
    constexpr size_t kAlign = size_t(1) << 21;
    constexpr size_t kHugeMin = size_t(16) << 20;  // heap below 16MB: the
    // counter's early doublings would otherwise churn mmap+collapse
    const size_t bytes = n * sizeof(T);
    const size_t span = ((bytes + kAlign - 1) / kAlign) * kAlign;
    size_t pooled_bytes = 0;
    void* p = bytes >= kHugeMin ? span_pool().take(span + kAlign, &pooled_bytes)
                                : nullptr;
    pooled = p != nullptr;
    if (!p && bytes >= kHugeMin)
      p = mmap(nullptr, span + kAlign, PROT_READ | PROT_WRITE,
               MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
    if (!p || p == MAP_FAILED) {
      data = static_cast<T*>(std::malloc(bytes));
      raw = data;
      raw_bytes = 0;
      pooled = false;
    } else {
      raw = p;
      raw_bytes = pooled ? pooled_bytes : span + kAlign;
      uintptr_t a = (reinterpret_cast<uintptr_t>(p) + kAlign - 1) & ~(kAlign - 1);
      data = reinterpret_cast<T*>(a);
      // hint BEFORE first touch: each 2MB fault then compacts
      // synchronously (one-time per table at build; cost tracks system
      // memory fragmentation, 1-10s per 100MB) — still far cheaper than
      // MADV_COLLAPSE after the fill (measured 17s: it defragments under
      // full memory pressure instead of at fault time). NVT_HUGEPAGES=0
      // opts out for fragmentation-sensitive deployments.
      // read per-call (not a static latch): build-heavy phases (fit,
      // end-to-end ETL) flip NVT_HUGEPAGES=0 in-process — the compaction
      // cost only amortizes for long-lived tables probed many times
      const char* e = std::getenv("NVT_HUGEPAGES");
      const bool use_huge = !(e && e[0] == '0');
      if (use_huge && want_huge) madvise(data, span, MADV_HUGEPAGE);
    }
    count = n;
    for (size_t i = 0; i < n; ++i) data[i] = fill;
  }

  // All-zero allocation WITHOUT an explicit fill pass: anonymous mmap pages
  // are kernel zero pages faulted lazily on first touch, so a fresh (or
  // regrown) table costs nothing for the slots that are never reached —
  // the fit counters use a zeroed count field as the empty-slot test so
  // their tables qualify. Heap fallback uses calloc for the same reason.
  void assign_zero(size_t n) {
    release();
    constexpr size_t kAlign = size_t(1) << 21;
    constexpr size_t kMmapMin = size_t(1) << 20;
    const size_t bytes = n * sizeof(T);
    const size_t span = ((bytes + kAlign - 1) / kAlign) * kAlign;
    size_t pooled_bytes = 0;
    void* p = bytes >= kMmapMin ? span_pool().take(span + kAlign, &pooled_bytes)
                                : nullptr;
    pooled = p != nullptr;
    if (!p && bytes >= kMmapMin)
      p = mmap(nullptr, span + kAlign, PROT_READ | PROT_WRITE,
               MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
    if (!p || p == MAP_FAILED) {
      data = static_cast<T*>(std::calloc(n ? n : 1, sizeof(T)));
      raw = data;
      raw_bytes = 0;
      pooled = false;
    } else {
      raw = p;
      raw_bytes = pooled ? pooled_bytes : span + kAlign;
      uintptr_t a = (reinterpret_cast<uintptr_t>(p) + kAlign - 1) & ~(kAlign - 1);
      data = reinterpret_cast<T*>(a);
      // a recycled span carries stale bytes: zero explicitly (sequential,
      // full-speed) — fresh mappings keep the lazy kernel-zero-page path
      if (pooled) std::memset(data, 0, bytes);
    }
    count = n;
  }

  void release() {
    stop_populate();  // join BEFORE unmapping — the thread touches the pages
    if (raw) {
      if (raw_bytes) {
        span_pool().give(raw, raw_bytes);  // keep backed pages mapped
      } else {
        std::free(raw);
      }
    }
    raw = nullptr;
    data = nullptr;
    count = 0;
    raw_bytes = 0;
    pooled = false;
  }

  T& operator[](size_t i) { return data[i]; }
  const T& operator[](size_t i) const { return data[i]; }
  size_t size() const { return count; }
};

// Open-addressing (linear probe) int64 -> int32 map. Key and value share a
// 16-byte entry so a probe touches ONE cache line; multi-million-key tables
// are memory-latency bound, so the encode loop prefetches a block of slots
// ahead (keeps ~16 misses in flight per core — measured ~4x on 2.8M-key
// Criteo-scale vocabs vs the naive per-element probe).
struct I64Map {
  struct Entry {
    int64_t key;
    int32_t val;
    int32_t pad_;
  };
  HugeArray<Entry> entries;
  uint64_t mask = 0;
  bool has_sentinel_key = false;  // a real key equal to kEmpty
  int32_t sentinel_val = 0;

  void build(const int64_t* in_keys, const int32_t* codes, int64_t n) {
    uint64_t cap = next_pow2(static_cast<uint64_t>(n) * 2 + 1);
    if (cap < 16) cap = 16;
    entries.assign(cap, Entry{kEmpty, 0, 0});
    mask = cap - 1;
    for (int64_t i = 0; i < n; ++i) {
      int64_t k = in_keys[i];
      if (k == kEmpty) {
        has_sentinel_key = true;
        sentinel_val = codes[i];
        continue;
      }
      uint64_t slot = mix64(static_cast<uint64_t>(k)) & mask;
      while (entries[slot].key != kEmpty) slot = (slot + 1) & mask;
      entries[slot].key = k;
      entries[slot].val = codes[i];
    }
  }

  inline uint64_t slot_of(int64_t k) const {
    return mix64(static_cast<uint64_t>(k)) & mask;
  }

  inline void prefetch(uint64_t slot) const {
    __builtin_prefetch(&entries[slot], 0, 1);
  }

  inline bool find_from(uint64_t slot, int64_t k, int32_t* out) const {
    while (true) {
      const Entry& e = entries[slot];
      if (e.key == k) { *out = e.val; return true; }
      if (e.key == kEmpty) return false;
      slot = (slot + 1) & mask;
    }
  }

  inline bool find(int64_t k, int32_t* out) const {
    if (k == kEmpty) {
      if (has_sentinel_key) { *out = sentinel_val; return true; }
      return false;
    }
    return find_from(slot_of(k), k, out);
  }
};

// int32-key variant of I64Map: 8-byte entries pack EIGHT slots per cache
// line, halving the table's footprint — the multi-million-key Criteo
// vocabularies (raw ids are int32) are DRAM-latency bound, and the smaller
// table roughly doubles the L3-resident fraction of the hot head. Chosen
// automatically by nvt_cat_create_i64 when every key fits int32.
struct I32Map {
  struct Entry {
    int32_t key;
    int32_t val;
  };
  HugeArray<Entry> entries;
  uint64_t mask = 0;
  bool has_sentinel_key = false;  // a real key equal to INT32_MIN
  int32_t sentinel_val = 0;

  static constexpr int32_t kEmpty32 = INT32_MIN;

  void build(const int64_t* in_keys, const int32_t* codes, int64_t n) {
    uint64_t cap = next_pow2(static_cast<uint64_t>(n) * 2 + 1);
    if (cap < 16) cap = 16;
    entries.assign(cap, Entry{kEmpty32, 0});
    mask = cap - 1;
    for (int64_t i = 0; i < n; ++i) {
      int32_t k = static_cast<int32_t>(in_keys[i]);
      if (k == kEmpty32) {
        has_sentinel_key = true;
        sentinel_val = codes[i];
        continue;
      }
      uint64_t slot = mix64(static_cast<uint64_t>(static_cast<uint32_t>(k))) & mask;
      while (entries[slot].key != kEmpty32) slot = (slot + 1) & mask;
      entries[slot].key = k;
      entries[slot].val = codes[i];
    }
  }

  inline uint64_t slot_of(int32_t k) const {
    return mix64(static_cast<uint64_t>(static_cast<uint32_t>(k))) & mask;
  }

  inline void prefetch(uint64_t slot) const {
    __builtin_prefetch(&entries[slot], 0, 1);
  }

  inline bool find_from(uint64_t slot, int32_t k, int32_t* out) const {
    while (true) {
      const Entry& e = entries[slot];
      if (e.key == k) { *out = e.val; return true; }
      if (e.key == kEmpty32) return false;
      slot = (slot + 1) & mask;
    }
  }
};

// Open-addressing string -> int32 map: keys stored as (offset,len) into a blob.
struct StrMap {
  std::string blob;
  std::vector<uint32_t> off;   // slot -> offset (UINT32_MAX = empty)
  std::vector<uint32_t> len;
  std::vector<int32_t> vals;
  uint64_t mask = 0;

  void build(const char* in_blob, const int64_t* offsets, const int32_t* codes, int64_t n) {
    blob.assign(in_blob, static_cast<size_t>(offsets[n]));
    uint64_t cap = next_pow2(static_cast<uint64_t>(n) * 2 + 1);
    if (cap < 16) cap = 16;
    off.assign(cap, UINT32_MAX);
    len.assign(cap, 0);
    vals.assign(cap, 0);
    mask = cap - 1;
    for (int64_t i = 0; i < n; ++i) {
      uint32_t o = static_cast<uint32_t>(offsets[i]);
      uint32_t l = static_cast<uint32_t>(offsets[i + 1] - offsets[i]);
      uint64_t slot = hash_bytes(blob.data() + o, l) & mask;
      while (off[slot] != UINT32_MAX) slot = (slot + 1) & mask;
      off[slot] = o;
      len[slot] = l;
      vals[slot] = codes[i];
    }
  }

  inline bool find(const char* s, uint32_t l, int32_t* out) const {
    uint64_t slot = hash_bytes(s, l) & mask;
    while (true) {
      uint32_t o = off[slot];
      if (o == UINT32_MAX) return false;
      if (len[slot] == l && std::memcmp(blob.data() + o, s, l) == 0) {
        *out = vals[slot];
        return true;
      }
      slot = (slot + 1) & mask;
    }
  }
};

struct Table {
  std::unique_ptr<I64Map> i64;
  std::unique_ptr<I32Map> i32;
  std::unique_ptr<StrMap> str;
};

using TablePtr = std::shared_ptr<Table>;

std::mutex g_mu;
std::unordered_map<std::string, std::weak_ptr<Table>> g_cache;

TablePtr* wrap(TablePtr p) { return new TablePtr(std::move(p)); }

// Encode integer values (TIn = int64 or int32 source width — the int32
// entry point saves the caller a full astype(int64) copy pass per column
// per batch). validity may be nullptr; oov_index is used for misses
// (single-OOV-bucket contract, matching the reference C++ kernel's
// "only one OOV bucket" restriction, categorify.cc:261-263).
//
// Slot-ordered probe pass for LARGE tables: random probes into a table
// far beyond L2 pay one uncovered memory round-trip each (and random
// access does not scale across this host's cores — see PCounter32). One
// counting sort of (slot, row) pairs by the slot's top bits turns the
// probe stream into an ASCENDING sweep of the table (hardware-prefetched,
// each ~table/1024 window L1-resident while probed); codes scatter back
// into the batch-sized `out` (L2-resident). Scratch is thread-local and
// reused across calls/columns.
template <typename TIn>
void encode_ints_i32_sorted(const I32Map& m, const TIn* vals,
                            const uint8_t* validity, int64_t n,
                            int32_t null_index, int32_t oov_index,
                            int32_t offset, int32_t* out) {
  constexpr int kGroups = 1024;
  thread_local std::vector<uint32_t> slots_tl;
  thread_local std::vector<uint32_t> order_slot_tl;
  thread_local std::vector<int32_t> order_row_tl;
  slots_tl.resize(n);
  order_slot_tl.resize(n);
  order_row_tl.resize(n);
  uint32_t* slots = slots_tl.data();
  uint32_t* oslot = order_slot_tl.data();
  int32_t* orow = order_row_tl.data();
  int shift = 0;
  for (uint64_t c = m.mask + 1; c > kGroups; c >>= 1) ++shift;
  std::vector<int32_t> hist(kGroups + 1, 0);
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (validity && !validity[i]) {
      out[i] = null_index + offset;
      continue;
    }
    const int64_t v = static_cast<int64_t>(vals[i]);
    if (sizeof(TIn) > 4 && (v < INT32_MIN || v > INT32_MAX)) {
      out[i] = oov_index + offset;
      continue;
    }
    const int32_t k = static_cast<int32_t>(v);
    if (k == I32Map::kEmpty32) {
      out[i] = (m.has_sentinel_key ? m.sentinel_val : oov_index) + offset;
      continue;
    }
    const uint32_t s = static_cast<uint32_t>(m.slot_of(k));
    slots[i] = s;
    ++hist[(s >> shift) + 1];
    ++kept;
  }
  (void)kept;
  for (int g = 0; g < kGroups; ++g) hist[g + 1] += hist[g];
  for (int64_t i = 0; i < n; ++i) {
    if (validity && !validity[i]) continue;
    const int64_t v = static_cast<int64_t>(vals[i]);
    if (sizeof(TIn) > 4 && (v < INT32_MIN || v > INT32_MAX)) continue;
    if (static_cast<int32_t>(v) == I32Map::kEmpty32) continue;
    const uint32_t s = slots[i];
    const int32_t pos = hist[s >> shift]++;
    oslot[pos] = s;
    orow[pos] = static_cast<int32_t>(i);
  }
  const int64_t total = hist[kGroups - 1];  // == kept after the prefix walk
  // NOTE: a vectorized (8-lane gather) variant of this resolve loop was
  // measured in-process vs the scalar sweep and removed: with slots
  // precomputed there is no hash ALU to hide, the ascending pattern is
  // already hardware-prefetched, and the extra value-gathers made it a
  // slight net loss on the big (memory-bound) tables this path serves.
  for (int64_t j = 0; j < total; ++j) {
    const int64_t i = orow[j];
    int32_t code;
    const bool hit =
        m.find_from(oslot[j], static_cast<int32_t>(vals[i]), &code);
    out[i] = (hit ? code : oov_index) + offset;
  }
}

#ifdef NVT_VEC_PROBE
// AVX-512 first-probe for int32 tables, no-validity batches (the encoded
// ETL hot path): 8 lanes hash (mix64_vec), gather their 8-byte entries,
// and resolve hits/empties in-register; only collided lanes (nonempty
// slot, wrong key — rare at load 0.5) and kEmpty32-valued queries fall to
// the scalar linear probe. ~2x on L2-resident vocabularies, where the
// scalar loop is ALU-bound on the hash chain rather than memory-bound.
void encode_i32_vec(const I32Map& m, const int32_t* vals, int64_t n,
                    int32_t oov_index, int32_t offset, int32_t* out) {
  const __m512i vmask = _mm512_set1_epi64(static_cast<long long>(m.mask));
  const __m512i vlow = _mm512_set1_epi64(0xffffffffLL);
  const __m512i vemptyk =
      _mm512_set1_epi64(static_cast<long long>(
          static_cast<uint32_t>(I32Map::kEmpty32)));
  const __m512i vbase =
      _mm512_set1_epi64(reinterpret_cast<long long>(&m.entries[0]));
  const __m512i voov = _mm512_set1_epi64(
      static_cast<long long>(oov_index + offset));
  const __m512i voff = _mm512_set1_epi64(static_cast<long long>(offset));
  alignas(64) uint64_t slot_arr[8];
  int64_t base = 0;
  for (; base + 8 <= n; base += 8) {
    const __m256i k32 =
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(vals + base));
    const __m512i kz = _mm512_cvtepu32_epi64(k32);
    const __m512i slot = _mm512_and_si512(mix64_vec(kz), vmask);
    const __m512i addr =
        _mm512_add_epi64(vbase, _mm512_slli_epi64(slot, 3));
    const __m512i e = _mm512_i64gather_epi64(addr, nullptr, 1);
    const __m512i ekey = _mm512_and_si512(e, vlow);
    const __mmask8 sent = _mm512_cmpeq_epi64_mask(kz, vemptyk);
    const __mmask8 hit =
        _mm512_cmpeq_epi64_mask(ekey, kz) & static_cast<__mmask8>(~sent);
    const __mmask8 empty =
        _mm512_cmpeq_epi64_mask(ekey, vemptyk) & static_cast<__mmask8>(~sent);
    const __m512i val =
        _mm512_add_epi64(_mm512_srai_epi64(e, 32), voff);
    const __m512i res = _mm512_mask_blend_epi64(hit, voov, val);
    const __mmask8 resolved = hit | empty;
    _mm256_mask_storeu_epi32(out + base, resolved,
                             _mm512_cvtepi64_epi32(res));
    uint8_t un = static_cast<uint8_t>(~resolved);
    if (un) {
      _mm512_store_si512(slot_arr, slot);
      do {
        const int lane = __builtin_ctz(un);
        un &= static_cast<uint8_t>(un - 1);
        const int64_t i = base + lane;
        const int32_t k = vals[i];
        int32_t code;
        bool found;
        if (k == I32Map::kEmpty32) {
          found = m.has_sentinel_key;
          code = m.sentinel_val;
        } else {
          // the gathered slot held a different, nonempty key: continue the
          // linear probe from the NEXT slot
          found = m.find_from((slot_arr[lane] + 1) & m.mask, k, &code);
        }
        out[i] = (found ? code : oov_index) + offset;
      } while (un);
    }
  }
  for (; base < n; base++) {
    const int32_t k = vals[base];
    int32_t code;
    bool found;
    if (k == I32Map::kEmpty32) {
      found = m.has_sentinel_key;
      code = m.sentinel_val;
    } else {
      found = m.find_from(m.slot_of(k), k, &code);
    }
    out[base] = (found ? code : oov_index) + offset;
  }
}
#endif

template <typename TIn>
void encode_ints_i32(const I32Map& m, const TIn* vals, const uint8_t* validity,
                     int64_t n, int32_t null_index, int32_t oov_index,
                     int32_t offset, int32_t* out) {
  // past ~L2-size tables and at batch-size n, the slot-ordered variant's
  // sequential sweep beats prefetched random probes (A/B: bench/ via
  // NVT_SORTED_PROBE=0|1; default threshold 8MB)
  static const int64_t kSortedMin = [] {
    const char* e = std::getenv("NVT_SORTED_PROBE_MIN_BYTES");
    return e ? std::atoll(e) : (int64_t(8) << 20);
  }();
  if (kSortedMin > 0 && n >= (int64_t(1) << 16) &&
      static_cast<int64_t>((m.mask + 1) * sizeof(I32Map::Entry)) >= kSortedMin) {
    encode_ints_i32_sorted(m, vals, validity, n, null_index, oov_index,
                           offset, out);
    return;
  }
#ifdef NVT_VEC_PROBE
  if constexpr (sizeof(TIn) == 4) {
    if (validity == nullptr && vector_probe_enabled()) {
      encode_i32_vec(m, reinterpret_cast<const int32_t*>(vals), n, oov_index,
                     offset, out);
      return;
    }
  }
#endif
  constexpr int64_t kBlock = 16;
  uint64_t slots[kBlock];
  bool in_range[kBlock];
  for (int64_t base = 0; base < n; base += kBlock) {
    const int64_t m_n = (n - base) < kBlock ? (n - base) : kBlock;
    for (int64_t j = 0; j < m_n; ++j) {
      const int64_t v = static_cast<int64_t>(vals[base + j]);
      // values outside int32 can't be in an int32-keyed vocab: OOV
      // (the check folds away when TIn is int32)
      const bool ok = sizeof(TIn) <= 4 ||
                      (v >= INT32_MIN && v <= INT32_MAX);
      in_range[j] = ok;
      const uint64_t s = m.slot_of(static_cast<int32_t>(v));
      slots[j] = s;
      if (ok) m.prefetch(s);
    }
    for (int64_t j = 0; j < m_n; ++j) {
      const int64_t i = base + j;
      if (validity && !validity[i]) {
        out[i] = null_index + offset;
        continue;
      }
      if (!in_range[j]) {
        out[i] = oov_index + offset;
        continue;
      }
      const int32_t k = static_cast<int32_t>(vals[i]);
      int32_t code;
      bool hit;
      if (k == I32Map::kEmpty32) {
        hit = m.has_sentinel_key;
        code = m.sentinel_val;
      } else {
        hit = m.find_from(slots[j], k, &code);
      }
      out[i] = (hit ? code : oov_index) + offset;
    }
  }
}

template <typename TIn>
void encode_ints(void* h, const TIn* vals, const uint8_t* validity,
                 int64_t n, int32_t null_index, int32_t oov_index,
                 int32_t offset, int32_t* out) {
  const Table& t = **static_cast<TablePtr*>(h);
  if (t.i32) {
    encode_ints_i32(*t.i32, vals, validity, n, null_index, oov_index, offset, out);
    return;
  }
  const I64Map& m = *t.i64;
  // blocked probe with software prefetch: hash+prefetch a block of slots,
  // then resolve — keeps a window of independent HBM misses in flight
  // instead of serializing on each probe's latency
  constexpr int64_t kBlock = 16;
  uint64_t slots[kBlock];
  for (int64_t base = 0; base < n; base += kBlock) {
    const int64_t m_n = (n - base) < kBlock ? (n - base) : kBlock;
    for (int64_t j = 0; j < m_n; ++j) {
      const uint64_t s = m.slot_of(static_cast<int64_t>(vals[base + j]));
      slots[j] = s;
      m.prefetch(s);
    }
    for (int64_t j = 0; j < m_n; ++j) {
      const int64_t i = base + j;
      if (validity && !validity[i]) {
        out[i] = null_index + offset;
        continue;
      }
      const int64_t k = static_cast<int64_t>(vals[i]);
      int32_t code;
      bool hit;
      if (k == kEmpty) {
        hit = m.has_sentinel_key;
        code = m.sentinel_val;
      } else {
        hit = m.find_from(slots[j], k, &code);
      }
      out[i] = (hit ? code : oov_index) + offset;
    }
  }
}

}  // namespace

extern "C" {

// Returns an existing cached table handle for `name`, or nullptr.
void* nvt_cat_lookup(const char* name) {
  std::lock_guard<std::mutex> lock(g_mu);
  auto it = g_cache.find(name);
  if (it == g_cache.end()) return nullptr;
  TablePtr p = it->second.lock();
  if (!p) {
    g_cache.erase(it);
    return nullptr;
  }
  return wrap(std::move(p));
}

void* nvt_cat_create_i64(const char* name, const int64_t* keys, const int32_t* codes,
                         int64_t n) {
  auto table = std::make_shared<Table>();
  bool fits32 = true;
  for (int64_t i = 0; i < n; ++i) {
    if (keys[i] < INT32_MIN || keys[i] > INT32_MAX) {
      fits32 = false;
      break;
    }
  }
  if (fits32) {
    // half-size entries (8B): multi-million-key probes are DRAM-latency
    // bound and the smaller table keeps more of the hot head in L3
    table->i32 = std::make_unique<I32Map>();
    table->i32->build(keys, codes, n);
  } else {
    table->i64 = std::make_unique<I64Map>();
    table->i64->build(keys, codes, n);
  }
  {
    std::lock_guard<std::mutex> lock(g_mu);
    g_cache[name] = table;
  }
  return wrap(std::move(table));
}

void* nvt_cat_create_str(const char* name, const char* blob, const int64_t* offsets,
                         const int32_t* codes, int64_t n) {
  auto table = std::make_shared<Table>();
  table->str = std::make_unique<StrMap>();
  table->str->build(blob, offsets, codes, n);
  {
    std::lock_guard<std::mutex> lock(g_mu);
    g_cache[name] = table;
  }
  return wrap(std::move(table));
}

void nvt_cat_release(void* h) { delete static_cast<TablePtr*>(h); }

void nvt_cat_encode_i64(void* h, const int64_t* vals, const uint8_t* validity,
                        int64_t n, int32_t null_index, int32_t oov_index,
                        int32_t offset, int32_t* out) {
  encode_ints(h, vals, validity, n, null_index, oov_index, offset, out);
}

// int32 source values probe directly (no host-side widening copy)
void nvt_cat_encode_i32(void* h, const int32_t* vals, const uint8_t* validity,
                        int64_t n, int32_t null_index, int32_t oov_index,
                        int32_t offset, int32_t* out) {
  encode_ints(h, vals, validity, n, null_index, oov_index, offset, out);
}

void nvt_cat_encode_str(void* h, const char* blob, const int64_t* offsets,
                        const uint8_t* validity, int64_t n, int32_t null_index,
                        int32_t oov_index, int32_t offset, int32_t* out) {
  const Table& t = **static_cast<TablePtr*>(h);
  const StrMap& m = *t.str;
  for (int64_t i = 0; i < n; ++i) {
    if (validity && !validity[i]) {
      out[i] = null_index + offset;
      continue;
    }
    const char* s = blob + offsets[i];
    uint32_t l = static_cast<uint32_t>(offsets[i + 1] - offsets[i]);
    int32_t code;
    out[i] = (m.find(s, l, &code) ? code : oov_index) + offset;
  }
}

// In-place NaN fill (reference fill.cc:32-106).
void nvt_fill_f32(float* vals, int64_t n, float fill) {
  for (int64_t i = 0; i < n; ++i) {
    if (vals[i] != vals[i]) vals[i] = fill;
  }
}

void nvt_fill_f64(double* vals, int64_t n, double fill) {
  for (int64_t i = 0; i < n; ++i) {
    if (vals[i] != vals[i]) vals[i] = fill;
  }
}

int64_t nvt_cache_size() {
  std::lock_guard<std::mutex> lock(g_mu);
  int64_t alive = 0;
  for (auto& kv : g_cache) {
    if (!kv.second.expired()) ++alive;
  }
  return alive;
}

// ---------------------------------------------------------------------------
// Fused elementwise continuous-column pipeline (out-of-place, single pass).
// The Python ops (FillMissing/Clip/LogOp/Normalize) each enable only their
// own stage, but the fused signature lets the host executor collapse a
// chain of them into ONE memory pass per column. Stage flags are loop
// invariants, so g++ -O3 hoists the branches and vectorizes each variant.
// Reference equivalents: fill.cc:32-106 (vectorized fill), plus the
// numpy/cupy elementwise chains in ops/{clip,logop,normalize}.py.

}  // extern "C" (templates need C++ linkage; wrappers reopen it below)

// Row gather by int64 indices (the shuffle permutation in the parquet
// writer — reference shuffles via cudf/dask sample_groups). numpy's fancy
// indexing holds the GIL; this releases it, so per-file writer threads
// permute columns concurrently. Blocked software prefetch: the index
// stream is random, each access a DRAM miss without it (same treatment as
// the hash probes above).
template <typename T>
static void gather_rows(const T* src, const int64_t* idx, T* out, int64_t n) {
  constexpr int64_t kBlock = 16;
  int64_t i = 0;
  for (; i + kBlock <= n; i += kBlock) {
    for (int64_t j = 0; j < kBlock; ++j)
      __builtin_prefetch(src + idx[i + j], 0, 0);
    for (int64_t j = 0; j < kBlock; ++j) out[i + j] = src[idx[i + j]];
  }
  for (; i < n; ++i) out[i] = src[idx[i]];
}

// Fused gather-scatter: out[pos[i]] = src[idx[i]] — ONE random-read +
// random-write pass. The shuffled parquet writer uses it to land rows of
// several buffered source batches directly in globally-permuted order,
// replacing three passes (piece gather, window concat, permute gather).
template <typename T>
static void gather_scatter_rows(const T* src, const int64_t* idx, T* out,
                                const int64_t* pos, int64_t n) {
  constexpr int64_t kBlock = 16;
  int64_t i = 0;
  for (; i + kBlock <= n; i += kBlock) {
    for (int64_t j = 0; j < kBlock; ++j) {
      __builtin_prefetch(src + idx[i + j], 0, 0);
      __builtin_prefetch(out + pos[i + j], 1, 0);
    }
    for (int64_t j = 0; j < kBlock; ++j) out[pos[i + j]] = src[idx[i + j]];
  }
  for (; i < n; ++i) out[pos[i]] = src[idx[i]];
}

// Multi-source gather: out[i] = srcs[g[i] >> 48][g[i] & kGatherRowMask] —
// the INVERSE formulation of the shuffled-writer flush. A random scatter
// pays read-for-ownership + writeback on every touched cache line (~2x the
// traffic of a read miss); gathering instead makes the random access a READ
// and the write sequential. The writer builds the packed piece/row index g
// once per flush window (one int64 scatter) and then gathers every column
// through it.
static constexpr int64_t kGatherRowMask = (int64_t(1) << 48) - 1;

template <typename T>
static void gather_multi_rows(const T* const* srcs, const int64_t* g, T* out,
                              int64_t n) {
  // software-pipelined: prefetch block i+1 while emitting block i, so the
  // random-read misses of the NEXT block overlap the stores of this one
  // (a same-block prefetch-then-use loop gives each load only ~kBlock
  // iterations of lead — not enough to hide a DRAM miss)
  constexpr int64_t kBlock = 32;
  int64_t i = 0;
  if (n >= 2 * kBlock) {
    for (int64_t j = 0; j < kBlock; ++j) {
      const int64_t e = g[j];
      __builtin_prefetch(srcs[e >> 48] + (e & kGatherRowMask), 0, 0);
    }
    for (; i + 2 * kBlock <= n; i += kBlock) {
      for (int64_t j = 0; j < kBlock; ++j) {
        const int64_t e = g[i + kBlock + j];
        __builtin_prefetch(srcs[e >> 48] + (e & kGatherRowMask), 0, 0);
      }
      for (int64_t j = 0; j < kBlock; ++j) {
        const int64_t e = g[i + j];
        out[i + j] = srcs[e >> 48][e & kGatherRowMask];
      }
    }
  }
  for (; i < n; ++i) {
    const int64_t e = g[i];
    out[i] = srcs[e >> 48][e & kGatherRowMask];
  }
}

// Two-pass bucketed permutation. Applying a random permutation in one pass
// is a DRAM-latency-bound random access per element (~60-70M elem/s
// measured, line-fill-buffer limited, prefetch-insensitive). Split it:
//   prep  (once per flush window): counting-sort source elements by
//         destination BUCKET (dest >> shift) → dest_slot[i] (the element's
//         slot in bucket-grouped scratch) and dpos[slot] (its final dest).
//   apply (per column): pass A reads sources in sequential order and
//         appends to ~n/2^shift bucket cursors (each cursor streams);
//         pass B walks scratch sequentially and scatters within one
//         bucket's dest range at a time (L1/L2-resident).
// Every access is streaming or cache-local.
static void permute_prep(const int64_t* pos, int64_t n, int32_t shift,
                         int32_t* dest_slot, int64_t* dpos) {
  const int64_t nb = ((n - 1) >> shift) + 1;
  std::vector<int64_t> cur(static_cast<size_t>(nb) + 1, 0);
  for (int64_t i = 0; i < n; ++i) cur[(pos[i] >> shift) + 1]++;
  for (int64_t b = 0; b < nb; ++b) cur[b + 1] += cur[b];
  for (int64_t i = 0; i < n; ++i) {
    const int64_t s = cur[pos[i] >> shift]++;
    dest_slot[i] = static_cast<int32_t>(s);
    dpos[s] = pos[i];
  }
}

template <typename T>
static void permute_apply(const T* const* srcs, const int64_t* gsrc,
                          const int32_t* dest_slot, const int64_t* dpos,
                          T* scratch, T* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t e = gsrc[i];
    scratch[dest_slot[i]] = srcs[e >> 48][e & kGatherRowMask];
  }
  for (int64_t s = 0; s < n; ++s) out[dpos[s]] = scratch[s];
}

extern "C" {

void nvt_permute_prep(const int64_t* pos, int64_t n, int32_t shift,
                      int32_t* dest_slot, int64_t* dpos) {
  permute_prep(pos, n, shift, dest_slot, dpos);
}

void nvt_permute_apply4(const void* const* srcs, const int64_t* gsrc,
                        const int32_t* dest_slot, const int64_t* dpos,
                        void* scratch, void* out, int64_t n) {
  permute_apply<int32_t>(reinterpret_cast<const int32_t* const*>(srcs), gsrc,
                         dest_slot, dpos, static_cast<int32_t*>(scratch),
                         static_cast<int32_t*>(out), n);
}

void nvt_permute_apply8(const void* const* srcs, const int64_t* gsrc,
                        const int32_t* dest_slot, const int64_t* dpos,
                        void* scratch, void* out, int64_t n) {
  permute_apply<int64_t>(reinterpret_cast<const int64_t* const*>(srcs), gsrc,
                         dest_slot, dpos, static_cast<int64_t*>(scratch),
                         static_cast<int64_t*>(out), n);
}

void nvt_permute_apply1(const void* const* srcs, const int64_t* gsrc,
                        const int32_t* dest_slot, const int64_t* dpos,
                        void* scratch, void* out, int64_t n) {
  permute_apply<uint8_t>(reinterpret_cast<const uint8_t* const*>(srcs), gsrc,
                         dest_slot, dpos, static_cast<uint8_t*>(scratch),
                         static_cast<uint8_t*>(out), n);
}

void nvt_gather_multi4(const void* const* srcs, const int64_t* g, void* out,
                       int64_t n) {
  gather_multi_rows<int32_t>(reinterpret_cast<const int32_t* const*>(srcs), g,
                             static_cast<int32_t*>(out), n);
}

void nvt_gather_multi8(const void* const* srcs, const int64_t* g, void* out,
                       int64_t n) {
  gather_multi_rows<int64_t>(reinterpret_cast<const int64_t* const*>(srcs), g,
                             static_cast<int64_t*>(out), n);
}

void nvt_gather_multi1(const void* const* srcs, const int64_t* g, void* out,
                       int64_t n) {
  gather_multi_rows<uint8_t>(reinterpret_cast<const uint8_t* const*>(srcs), g,
                             static_cast<uint8_t*>(out), n);
}

void nvt_gather_scatter4(const void* src, const int64_t* idx, void* out,
                         const int64_t* pos, int64_t n) {
  gather_scatter_rows<int32_t>(static_cast<const int32_t*>(src), idx,
                               static_cast<int32_t*>(out), pos, n);
}

void nvt_gather_scatter8(const void* src, const int64_t* idx, void* out,
                         const int64_t* pos, int64_t n) {
  gather_scatter_rows<int64_t>(static_cast<const int64_t*>(src), idx,
                               static_cast<int64_t*>(out), pos, n);
}

void nvt_gather_scatter1(const void* src, const int64_t* idx, void* out,
                         const int64_t* pos, int64_t n) {
  gather_scatter_rows<uint8_t>(static_cast<const uint8_t*>(src), idx,
                               static_cast<uint8_t*>(out), pos, n);
}

void nvt_gather4(const void* src, const int64_t* idx, void* out, int64_t n) {
  gather_rows<int32_t>(static_cast<const int32_t*>(src), idx,
                       static_cast<int32_t*>(out), n);
}

void nvt_gather8(const void* src, const int64_t* idx, void* out, int64_t n) {
  gather_rows<int64_t>(static_cast<const int64_t*>(src), idx,
                       static_cast<int64_t*>(out), n);
}

void nvt_gather1(const void* src, const int64_t* idx, void* out, int64_t n) {
  gather_rows<uint8_t>(static_cast<const uint8_t*>(src), idx,
                       static_cast<uint8_t*>(out), n);
}

}  // extern "C"

// The normalize stage is (v - sub) / div — the exact expression the Python
// Normalize/NormalizeMinMax transforms evaluate — so fused results match the
// unfused float rounding bit-for-bit (a scale/shift refactoring would not).
//
// log1p: glibc's scalar log1pf is a per-element libm call that blocks
// vectorization (measured 4.5x slower than numpy's SIMD log1p for the whole
// pass). This branch-free cephes-style version keeps the loop
// auto-vectorizable; measured accuracy ≤3 ULP vs numpy float32 log1p
// (neither is correctly rounded). Special cases (NaN, ±inf, v <= -1,
// tiny v) resolve through selects, not branches.

static inline float vec_logf_core(float u) {
  // cephes logf on u > 0 finite: u = m * 2^e, m in [sqrt(0.5), sqrt(2))
  int32_t iu;
  std::memcpy(&iu, &u, 4);
  int32_t e = ((iu >> 23) & 0xff) - 126;
  iu = (iu & 0x007fffff) | 0x3f000000;  // m in [0.5, 1)
  float m;
  std::memcpy(&m, &iu, 4);
  bool c = m < 0.70710678f;  // ternaries if-convert to blends under -O3
  m = c ? m + m : m;
  e = c ? e - 1 : e;
  float x = m - 1.0f;
  float z = x * x;
  float y = 7.0376836292e-2f;
  y = y * x - 1.1514610310e-1f;
  y = y * x + 1.1676998740e-1f;
  y = y * x - 1.2420140846e-1f;
  y = y * x + 1.4249322787e-1f;
  y = y * x - 1.6668057665e-1f;
  y = y * x + 2.0000714765e-1f;
  y = y * x - 2.4999993993e-1f;
  y = y * x + 3.3333331174e-1f;
  y = y * x * z;
  float fe = (float)e;
  y += fe * -2.12194440e-4f;
  y -= 0.5f * z;
  return x + y + fe * 0.693359375f;
}

static inline float vec_log1pf(float v) {
  float u = 1.0f + v;
  float d = u - 1.0f;
  float core = vec_logf_core(u);  // junk for u <= 0 / inf / nan — selected out
  // log(1+v) = log(u) * v/d corrects the rounding of 1+v (Eigen's scheme)
  float r = (d != 0.0f) ? core * (v / d) : v;  // d==0: log1p(v) == v exactly
  r = (u < 0.0f) ? std::numeric_limits<float>::quiet_NaN() : r;
  r = (u == 0.0f) ? -std::numeric_limits<float>::infinity() : r;
  r = (v == std::numeric_limits<float>::infinity()) ? v : r;
  r = (v != v) ? v : r;
  return r;
}

static inline float stage_log1p(float v) { return vec_log1pf(v); }
static inline double stage_log1p(double v) { return std::log1p(v); }

// Branch-free loop body: disabled stages run with NEUTRAL parameters that
// are bit-exact no-ops (fill=NaN keeps NaN; lo=-inf / hi=+inf never clip,
// including for NaN whose compares are false; (v - 0) / 1 == v exactly).
// Only the log stage needs a loop variant (no neutral parameter exists),
// hence the DO_LOG template. This is what lets g++ vectorize: the flag
// `if`s were reported as "control flow in loop" and blocked SIMD entirely
// (measured 8x once converted, bit-identical results — requires
// -fno-trapping-math so the select-away v/d divide may be speculated).
template <bool DO_LOG, typename T>
static void cont_pipe_impl(const T* in, T* out, int64_t n, T fill, T lo, T hi,
                           T sub, T div) {
  for (int64_t i = 0; i < n; ++i) {
    T v = in[i];
    v = (v != v) ? fill : v;
    v = (v < lo) ? lo : v;
    v = (v > hi) ? hi : v;
    if (DO_LOG) v = stage_log1p(v);
    v = (v - sub) / div;
    out[i] = v;
  }
}

template <typename T>
static void cont_pipe(const T* in, T* out, int64_t n, int has_fill, T fill,
                      int has_lo, T lo, int has_hi, T hi, int do_log1p,
                      int has_norm, T sub, T div) {
  const T qnan = std::numeric_limits<T>::quiet_NaN();
  const T inf = std::numeric_limits<T>::infinity();
  T f = has_fill ? fill : qnan;
  T l = has_lo ? lo : -inf;
  T h = has_hi ? hi : inf;
  T s = has_norm ? sub : T(0);
  T d = has_norm ? div : T(1);
  if (do_log1p) {
    cont_pipe_impl<true>(in, out, n, f, l, h, s, d);
  } else {
    cont_pipe_impl<false>(in, out, n, f, l, h, s, d);
  }
}

extern "C" {

void nvt_cont_pipe_f32(const float* in, float* out, int64_t n, int has_fill,
                       float fill, int has_lo, float lo, int has_hi, float hi,
                       int do_log1p, int has_norm, float sub, float div) {
  cont_pipe<float>(in, out, n, has_fill, fill, has_lo, lo, has_hi, hi,
                   do_log1p, has_norm, sub, div);
}

void nvt_cont_pipe_f64(const double* in, double* out, int64_t n, int has_fill,
                       double fill, int has_lo, double lo, int has_hi,
                       double hi, int do_log1p, int has_norm, double sub,
                       double div) {
  cont_pipe<double>(in, out, n, has_fill, fill, has_lo, lo, has_hi, hi,
                    do_log1p, has_norm, sub, div);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Single-pass streaming moments (Normalize/DataStats fit scan). The numpy
// formulation made ~10 full-column passes with float64 temporaries per
// batch (astype + where + isnan + 3 reductions + min/max lanes) and held
// the GIL throughout — it measured as the largest scan-side block of the
// multi-epoch fit (5.4s vs the 26-column counter's 4.4s). One fused pass:
// count/sum/sumsq/min/max/nulls, NaN treated as null (matching
// Column.is_null), float64 accumulation in 4 independent lanes so the adds
// don't serialize. Reference semantics: nvtabular/ops/moments.py:28-116.
// ---------------------------------------------------------------------------

namespace {

template <typename T>
static inline bool is_nan_val(T) { return false; }
static inline bool is_nan_val(float v) { return std::isnan(v); }
static inline bool is_nan_val(double v) { return std::isnan(v); }

// out[6] = {count, sum, sumsq, min, max, nulls}; count excludes masked-out
// and NaN elements, nulls counts them.
template <typename T>
static void moments_impl(const T* v, const uint8_t* validity, int64_t n,
                         double* out) {
  double s[4] = {0, 0, 0, 0};
  double ss[4] = {0, 0, 0, 0};
  double mn = std::numeric_limits<double>::infinity();
  double mx = -std::numeric_limits<double>::infinity();
  int64_t nulls = 0;
  for (int64_t i = 0; i < n; ++i) {
    const T raw = v[i];
    const bool ok = (validity == nullptr || validity[i]) && !is_nan_val(raw);
    const double x = ok ? static_cast<double>(raw) : 0.0;
    nulls += ok ? 0 : 1;
    s[i & 3] += x;
    ss[i & 3] += x * x;
    const double cand_mn = ok ? x : mn;
    const double cand_mx = ok ? x : mx;
    mn = cand_mn < mn ? cand_mn : mn;
    mx = cand_mx > mx ? cand_mx : mx;
  }
  out[0] = static_cast<double>(n - nulls);
  out[1] = s[0] + s[1] + s[2] + s[3];
  out[2] = ss[0] + ss[1] + ss[2] + ss[3];
  out[3] = mn;
  out[4] = mx;
  out[5] = static_cast<double>(nulls);
}

}  // namespace

extern "C" {

void nvt_moments_f32(const float* v, const uint8_t* validity, int64_t n,
                     double* out) {
  moments_impl(v, validity, n, out);
}
void nvt_moments_f64(const double* v, const uint8_t* validity, int64_t n,
                     double* out) {
  moments_impl(v, validity, n, out);
}
void nvt_moments_i32(const int32_t* v, const uint8_t* validity, int64_t n,
                     double* out) {
  moments_impl(v, validity, n, out);
}
void nvt_moments_i64(const int64_t* v, const uint8_t* validity, int64_t n,
                     double* out) {
  moments_impl(v, validity, n, out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Streaming value counter: the fit-time hot loop (vocabulary building).
// Open-addressing int64 -> count map with growth; one counter per column,
// single-writer (column-parallel via one thread per counter).
// ---------------------------------------------------------------------------

namespace {

struct Counter {
  struct Entry {
    int64_t key;
    int64_t cnt;  // cnt == 0 <=> empty slot (counts are always >= 1)
  };  // one cache line covers both fields of a slot
  HugeArray<Entry> entries;
  uint64_t mask = 0;
  uint64_t used = 0;

  explicit Counter(uint64_t cap) { reset(next_pow2(cap < 16 ? 16 : cap)); }

  // Emptiness rides the COUNT field, so a fresh table is all-zero bytes:
  // assign_zero maps kernel zero pages lazily instead of writing a
  // sentinel into every slot — regrowing a 357MB table no longer pays an
  // explicit fill pass (measured up to seconds per grow under memory
  // pressure), untouched regions never fault at all, and every int64 key
  // value (including INT64_MIN) is an ordinary key.
  void reset(uint64_t cap) {
    entries.assign_zero(cap);
    mask = cap - 1;
    used = 0;
  }

  void rehash_to(uint64_t cap) {
    HugeArray<Entry> old;
    old.swap(entries);
    reset(cap);
    // fault the new span in from a background thread while the migration
    // (and the batches that follow) insert into it — first-touch demand
    // faults on the insert threads were the dominant cold-scan cost
    entries.populate_async();
    // blocked prefetched migration: keys are unique, so insert at the
    // first empty slot without equality re-checks (same latency-hiding
    // pattern as nvt_counter_update; ~10x over the naive re-add)
    constexpr size_t kBlock = 32;
    const size_t n = old.size();
    for (size_t base = 0; base < n; base += kBlock) {
      const size_t end = base + kBlock < n ? base + kBlock : n;
      for (size_t i = base; i < end; ++i) {
        if (old[i].cnt != 0) {
          __builtin_prefetch(
              &entries[mix64(static_cast<uint64_t>(old[i].key)) & mask], 1, 1);
        }
      }
      for (size_t i = base; i < end; ++i) {
        if (old[i].cnt == 0) continue;
        uint64_t slot = mix64(static_cast<uint64_t>(old[i].key)) & mask;
        while (entries[slot].cnt != 0) slot = (slot + 1) & mask;
        entries[slot] = old[i];
        ++used;
      }
    }
  }

  void grow() {
    const uint64_t old_cap = mask + 1;
    // 4x once the table is large: growth (rehash = one random write per
    // entry, repeated every doubling) dominated the fit scan on
    // multi-million-key vocabularies — 4x halves the rehash passes and
    // the page-fault volume of the intermediate tables
    const uint64_t factor =
        old_cap * sizeof(Entry) >= (uint64_t(16) << 20) ? 4 : 2;
    rehash_to(old_cap * factor);
  }

  // Pre-size for n distinct keys (one rehash now instead of a growth
  // ladder mid-scan) — callers with a cardinality estimate (merge paths
  // know exact sizes; the fit can extrapolate from its first batch).
  void reserve(uint64_t n) {
    const uint64_t need = next_pow2(n + (n * 3) / 7 + 1);  // keep load < 0.7
    if (need > mask + 1) rehash_to(need);
  }

  inline void add(int64_t k, int64_t c) {
    if (c == 0) return;  // a zero count would read as an empty slot
    uint64_t slot = mix64(static_cast<uint64_t>(k)) & mask;
    while (true) {
      Entry& e = entries[slot];
      if (e.cnt == 0) {
        e.key = k;
        e.cnt = c;
        if (++used * 10 > (mask + 1) * 7) grow();
        return;
      }
      if (e.key == k) {
        e.cnt += c;
        return;
      }
      slot = (slot + 1) & mask;
    }
  }
};

// int32-key / uint32-count variant: 8-byte entries — the fit scan is
// DRAM-latency bound exactly like the encode probes, and halving the
// table doubles the cache-resident fraction (same rationale as I32Map).
// A count reaching 2^31 sets `promote`; the caller migrates the whole
// table into the 64-bit Counter and continues there (counts stay exact).
struct Counter32 {
  struct Entry {
    int32_t key;
    uint32_t cnt;  // cnt == 0 <=> empty slot
  };
  HugeArray<Entry> entries;
  uint64_t mask = 0;
  uint64_t used = 0;
  bool promote = false;

  static constexpr uint32_t kCntCap = 0x80000000u;  // 2^31

  explicit Counter32(uint64_t cap) { reset(next_pow2(cap < 16 ? 16 : cap)); }

  void reset(uint64_t cap) {
    entries.assign_zero(cap);
    mask = cap - 1;
    used = 0;
  }

  void rehash_to(uint64_t cap) {
    HugeArray<Entry> old;
    old.swap(entries);
    reset(cap);
    entries.populate_async();  // see Counter::rehash_to
    constexpr size_t kBlock = 32;
    const size_t n = old.size();
    for (size_t base = 0; base < n; base += kBlock) {
      const size_t end = base + kBlock < n ? base + kBlock : n;
      for (size_t i = base; i < end; ++i) {
        if (old[i].cnt != 0) {
          __builtin_prefetch(
              &entries[mix64(static_cast<uint64_t>(
                           static_cast<uint32_t>(old[i].key))) &
                       mask],
              1, 1);
        }
      }
      for (size_t i = base; i < end; ++i) {
        if (old[i].cnt == 0) continue;
        uint64_t slot =
            mix64(static_cast<uint64_t>(static_cast<uint32_t>(old[i].key))) & mask;
        while (entries[slot].cnt != 0) slot = (slot + 1) & mask;
        entries[slot] = old[i];
        ++used;
      }
    }
  }

  void grow() {
    const uint64_t old_cap = mask + 1;
    const uint64_t factor =
        old_cap * sizeof(Entry) >= (uint64_t(16) << 20) ? 4 : 2;
    rehash_to(old_cap * factor);
  }

  void reserve(uint64_t n) {
    const uint64_t need = next_pow2(n + (n * 3) / 7 + 1);
    if (need > mask + 1) rehash_to(need);
  }

  inline uint64_t slot_of(int32_t k) const {
    return mix64(static_cast<uint64_t>(static_cast<uint32_t>(k))) & mask;
  }

  // Insert/accumulate with a PRECOMPUTED home slot (must equal slot_of(k)
  // under the current mask) and capacity guaranteed by the caller — the
  // slot-ordered drain path (PCounter32::drain) pre-reserves so no grow
  // can occur mid-drain and precomputed slots stay valid.
  inline void add_at(uint64_t slot, int32_t k, uint32_t c) {
    while (true) {
      Entry& e = entries[slot];
      if (e.cnt == 0) {
        e.key = k;
        e.cnt = c;
        ++used;
        return;
      }
      if (e.key == k) {
        e.cnt += c;
        if (e.cnt >= kCntCap) promote = true;
        return;
      }
      slot = (slot + 1) & mask;
    }
  }


  inline void add(int32_t k, uint32_t c) {
    if (c == 0) return;
    uint64_t slot = slot_of(k);
    while (true) {
      Entry& e = entries[slot];
      if (e.cnt == 0) {
        e.key = k;
        e.cnt = c;
        if (++used * 10 > (mask + 1) * 7) grow();
        return;
      }
      if (e.key == k) {
        e.cnt += c;
        if (e.cnt >= kCntCap) promote = true;
        return;
      }
      slot = (slot + 1) & mask;
    }
  }
};

// Radix-partitioned streaming counter for HIGH-CARDINALITY int32 keys.
// The scarce resource on the target hosts is RANDOM DRAM/LLC access —
// measured 69M random cache-line loads/s on ONE thread with NEGATIVE
// scaling to 50M aggregate on four, while sequential streams run 56 GB/s.
// A flat table makes every upsert one random line (the Criteo-profile big
// columns are ~all-singleton, so there is no hot head to cache); this
// design makes the hot loop SEQUENTIAL instead:
//   update(): one streaming pass appends each value to one of 256 bucket
//             buffers by the TOP 8 bits of mix64 (256 open cache lines,
//             all appends sequential within a bucket),
//   drain():  a full buffer upserts into that bucket's PRIVATE Counter32
//             whose table holds only keys sharing the hash prefix —
//             total_keys/256 entries (~hundreds of KB), L2-resident for
//             the whole drain.
// Bucket index = mix64 >> 56 and Counter32 slots = mix64 & mask use
// DISJOINT hash bits, so per-bucket tables stay uniformly loaded.
struct PCounter32 {
  static constexpr int kBucketBits = 8;
  static constexpr int kNB = 1 << kBucketBits;
  // Buffer depth is the LOCALITY lever: a drain of B values into a table
  // of L cache lines refetches ~min(B, L) lines, so line reuse is B/L —
  // at 16K values vs the ~4K-line tables of a 4M-key column each line
  // absorbs ~4 upserts, and the slot-ordered sweep below turns those
  // fetches into an ascending walk the hardware prefetcher covers.
  static constexpr int kBufVals = 16384;  // 64KB buffer per bucket

  std::vector<std::unique_ptr<Counter32>> tables;
  // NOTE (round-5 measurements, all on the realistic 26-column scan):
  // an (hash, key)-packed 8-byte bucket entry that let the drain skip its
  // second mix64 was STRICTLY SLOWER (doubled append store traffic, halved
  // per-line buffering); a 64K-deep buffer was a steady-state wash;
  // a true-load drain (probe first, grow only for new keys) was 2x slower
  // than the worst-case reserve (see drain()); and 8-wide mix64_vec hash
  // passes in update()/drain() were ALSO ~1.5x slower end to end —
  // mullo_epi64 is an AVX-512 "heavy" instruction and four threads of it
  // downclock the whole socket, while the scalar hash chain pipelines
  // fine between the memory stalls it shares the loop with. The scalar
  // 4-byte-entry configuration below is the measured optimum.
  std::vector<int32_t> bufs;
  std::array<int32_t, kNB> fill{};
  std::vector<uint32_t> scratch_slots;   // drain scratch: slot per value
  std::vector<int32_t> scratch_vals;     // drain scratch: values slot-ordered
  std::vector<uint32_t> scratch_slots2;  // drain scratch: slots slot-ordered
  bool promote = false;  // some count crossed 2^31 — caller drains to 64-bit

  PCounter32()
      : tables(kNB),
        bufs(size_t(kNB) * kBufVals),
        scratch_slots(kBufVals),
        scratch_vals(kBufVals),
        scratch_slots2(kBufVals) {}

  static inline int bucket_of_hash(uint64_t h) {
    return static_cast<int>(h >> (64 - kBucketBits));
  }

  Counter32& table(int b) {
    if (!tables[b]) tables[b].reset(new Counter32(1024));
    return *tables[b];
  }

  // Slot-ordered drain: counting-sort the buffered values by the TOP bits
  // of their home slot (256 groups), then upsert group by group — the
  // table is swept front-to-back in ~S/256-slot windows instead of being
  // hit at random. Pre-reserving for used+n forbids growth mid-drain, so
  // the precomputed slots stay valid (Counter32::add_at contract).
  void drain(int b) {
    Counter32& t = table(b);
    const int32_t* v = &bufs[size_t(b) * kBufVals];
    const int n = fill[b];
    // The worst-case reserve (as if every buffered value were a new key)
    // looks wasteful — warm tables sit at load ~0.1-0.2 — but it is the
    // FAST configuration: a true-load (0.7) variant that probed first and
    // only grew for actually-new keys measured 2x SLOWER on the realistic
    // 26-column scan (3.6 vs 6.1M rows/s): sparse tables keep probe
    // chains at ~1 entry and the slot-ordered ascending sweep lets the
    // hardware prefetcher absorb the extra line traffic.
    t.reserve(t.used + static_cast<uint64_t>(n));
    const uint64_t cap = t.mask + 1;
    // group = slot's top 8 bits; shift 0 when the table is tiny
    int shift = 0;
    for (uint64_t c = cap; c > 256; c >>= 1) ++shift;
    int hist[257] = {0};
    for (int j = 0; j < n; ++j) {
      const uint32_t s = static_cast<uint32_t>(t.slot_of(v[j]));
      scratch_slots[j] = s;
      ++hist[(s >> shift) + 1];
    }
    for (int g = 0; g < 256; ++g) hist[g + 1] += hist[g];
    for (int j2 = 0; j2 < n; ++j2) {
      const uint32_t s = scratch_slots[j2];
      const int pos = hist[s >> shift]++;
      scratch_vals[pos] = v[j2];
      scratch_slots2[pos] = s;
    }
    for (int j2 = 0; j2 < n; ++j2)
      t.add_at(scratch_slots2[j2], scratch_vals[j2], 1);
    if (t.promote) promote = true;
    fill[b] = 0;
  }

  void update(const int32_t* vals, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
      const int32_t k = vals[i];
      const int b = bucket_of_hash(
          mix64(static_cast<uint64_t>(static_cast<uint32_t>(k))));
      int32_t& f = fill[b];
      bufs[size_t(b) * kBufVals + f] = k;
      if (++f == kBufVals) drain(b);
    }
  }

  void flush() {
    for (int b = 0; b < kNB; ++b)
      if (fill[b]) drain(b);
  }

  void add(int32_t k, uint32_t c) {
    Counter32& t = table(bucket_of_hash(
        mix64(static_cast<uint64_t>(static_cast<uint32_t>(k)))));
    t.add(k, c);
    if (t.promote) promote = true;
  }

  uint64_t size_flushed() {
    flush();
    uint64_t s = 0;
    for (auto& t : tables)
      if (t) s += t->used;
    return s;
  }

  void reserve(uint64_t n) {
    const uint64_t per = n / kNB + 1;
    if (per < 1024) return;  // per-bucket reserves below the initial cap are churn
    for (int b = 0; b < kNB; ++b) table(b).reserve(per);
  }
};

// LSD radix sort (16-bit digits, 4 passes — even, so the result lands back
// in the input buffer). Multi-million-entry vocabulary extracts spent ~2.5s
// in std::sort's comparison-driven branches; four sequential counting
// passes are memory-bound instead (~5x).
void radix_sort_u64(std::vector<uint64_t>& a) {
  const size_t n = a.size();
  if (n < (1 << 14)) {
    std::sort(a.begin(), a.end());
    return;
  }
  std::vector<uint64_t> tmp(n);
  uint64_t* src = a.data();
  uint64_t* dst = tmp.data();
  // 64-bit counts: a 2^32-entry extract would overflow uint32 histograms
  std::vector<uint64_t> hist(65537);
  for (int pass = 0; pass < 4; ++pass) {
    const int shift = pass * 16;
    std::fill(hist.begin(), hist.end(), 0u);
    for (size_t i = 0; i < n; ++i) ++hist[((src[i] >> shift) & 0xffff) + 1];
    for (int g = 0; g < 65536; ++g) hist[g + 1] += hist[g];
    for (size_t i = 0; i < n; ++i)
      dst[hist[(src[i] >> shift) & 0xffff]++] = src[i];
    std::swap(src, dst);
  }
}

// Vocabulary order (count DESC, key ASC) for 32-bit counter entries as ONE
// ascending u64 sort: code = (~cnt) << 32 | (key ^ sign-flip). cnt < 2^31
// is guaranteed (kCntCap promotes to the 64-bit counter first).
inline uint64_t vocab_code32(int32_t key, uint32_t cnt) {
  return (static_cast<uint64_t>(~cnt) << 32) |
         (static_cast<uint32_t>(key) ^ 0x80000000u);
}

void emit_sorted_codes32(std::vector<uint64_t>& codes, int64_t* keys_out,
                         int64_t* counts_out) {
  radix_sort_u64(codes);
  for (size_t i = 0; i < codes.size(); ++i) {
    const uint64_t code = codes[i];
    counts_out[i] = static_cast<int64_t>(~static_cast<uint32_t>(code >> 32));
    keys_out[i] = static_cast<int64_t>(static_cast<int32_t>(
        static_cast<uint32_t>(code) ^ 0x80000000u));
  }
}

}  // namespace

extern "C" {

// ---- partitioned counter (see PCounter32 above) ---------------------------

void* nvt_pcounter_create() { return new PCounter32(); }

int32_t nvt_pcounter_update(void* h, const int32_t* vals, int64_t n) {
  PCounter32& c = *static_cast<PCounter32*>(h);
  c.update(vals, n);
  return c.promote ? 1 : 0;
}

// merge-time adds: keys must fit int32, counts must stay below 2^31
// (the Python caller routes anything else through the 64-bit Counter)
int32_t nvt_pcounter_add(void* h, const int64_t* keys, const int64_t* counts,
                         int64_t n) {
  PCounter32& c = *static_cast<PCounter32*>(h);
  for (int64_t i = 0; i < n; ++i)
    c.add(static_cast<int32_t>(keys[i]), static_cast<uint32_t>(counts[i]));
  return c.promote ? 1 : 0;
}

void nvt_pcounter_reserve(void* h, int64_t n) {
  static_cast<PCounter32*>(h)->reserve(static_cast<uint64_t>(n > 0 ? n : 0));
}

int64_t nvt_pcounter_size(void* h) {
  return static_cast<int64_t>(static_cast<PCounter32*>(h)->size_flushed());
}

void nvt_pcounter_extract(void* h, int64_t* keys_out, int64_t* counts_out) {
  PCounter32& c = *static_cast<PCounter32*>(h);
  c.flush();
  int64_t j = 0;
  for (auto& t : c.tables) {
    if (!t) continue;
    for (size_t i = 0; i <= t->mask; ++i) {
      if (t->entries[i].cnt != 0) {
        keys_out[j] = t->entries[i].key;
        counts_out[j] = t->entries[i].cnt;
        ++j;
      }
    }
  }
}

void nvt_pcounter_extract_sorted(void* h, int64_t* keys_out,
                                 int64_t* counts_out) {
  PCounter32& c = *static_cast<PCounter32*>(h);
  c.flush();
  std::vector<uint64_t> codes;
  codes.reserve(c.size_flushed());
  for (auto& t : c.tables) {
    if (!t) continue;
    for (size_t i = 0; i <= t->mask; ++i)
      if (t->entries[i].cnt != 0)
        codes.push_back(vocab_code32(t->entries[i].key, t->entries[i].cnt));
  }
  emit_sorted_codes32(codes, keys_out, counts_out);
}

// migrate a flat 32-bit counter's contents into the partitioned one
// (the size-threshold crossover: the flat table has outgrown L2)
void nvt_counter32_drain_into_p(void* hp, void* h32) {
  PCounter32& dst = *static_cast<PCounter32*>(hp);
  Counter32& src = *static_cast<Counter32*>(h32);
  for (size_t i = 0; i <= src.mask; ++i)
    if (src.entries[i].cnt != 0)
      dst.add(src.entries[i].key, src.entries[i].cnt);
}

// promotion on count overflow: drain everything into the 64-bit Counter
void nvt_pcounter_drain_into(void* h64, void* hp) {
  Counter& dst = *static_cast<Counter*>(h64);
  PCounter32& src = *static_cast<PCounter32*>(hp);
  src.flush();
  for (auto& t : src.tables) {
    if (!t) continue;
    for (size_t i = 0; i <= t->mask; ++i)
      if (t->entries[i].cnt != 0)
        dst.add(static_cast<int64_t>(t->entries[i].key),
                static_cast<int64_t>(t->entries[i].cnt));
  }
}

void nvt_pcounter_free(void* h) { delete static_cast<PCounter32*>(h); }

void* nvt_counter32_create(int64_t initial_capacity) {
  auto* c = new Counter32(static_cast<uint64_t>(
      initial_capacity > 0 ? initial_capacity : 1024));
  c->entries.populate_async();  // no-op below 16MB
  return c;
}

// returns 1 when some count crossed 2^31: caller must drain into the
// 64-bit counter (counts are still exact at the moment of the signal)
int32_t nvt_counter32_update(void* h, const int32_t* vals, int64_t n) {
  Counter32& c = *static_cast<Counter32*>(h);
  constexpr int64_t kBlock = 16;
  for (int64_t base = 0; base < n; base += kBlock) {
    const int64_t m_n = (n - base) < kBlock ? (n - base) : kBlock;
    for (int64_t j = 0; j < m_n; ++j) {
      __builtin_prefetch(&c.entries[c.slot_of(vals[base + j])], 1, 1);
    }
    for (int64_t j = 0; j < m_n; ++j) c.add(vals[base + j], 1);
  }
  return c.promote ? 1 : 0;
}

void nvt_counter32_reserve(void* h, int64_t n) {
  static_cast<Counter32*>(h)->reserve(static_cast<uint64_t>(n > 0 ? n : 0));
}

int64_t nvt_counter32_size(void* h) {
  return static_cast<int64_t>(static_cast<Counter32*>(h)->used);
}

void nvt_counter32_extract(void* h, int64_t* keys_out, int64_t* counts_out) {
  Counter32& c = *static_cast<Counter32*>(h);
  int64_t j = 0;
  for (size_t i = 0; i <= c.mask; ++i) {
    if (c.entries[i].cnt != 0) {
      keys_out[j] = c.entries[i].key;
      counts_out[j] = c.entries[i].cnt;
      ++j;
    }
  }
}

void nvt_counter32_extract_sorted(void* h, int64_t* keys_out, int64_t* counts_out) {
  Counter32& c = *static_cast<Counter32*>(h);
  std::vector<uint64_t> codes;
  codes.reserve(c.used);
  for (size_t i = 0; i <= c.mask; ++i)
    if (c.entries[i].cnt != 0)
      codes.push_back(vocab_code32(c.entries[i].key, c.entries[i].cnt));
  emit_sorted_codes32(codes, keys_out, counts_out);
}

// migrate every (key, count) of the 32-bit counter into the 64-bit one
// (promotion on count overflow, or a merge that needs 64-bit keys)
void nvt_counter32_drain_into(void* h64, void* h32) {
  Counter& dst = *static_cast<Counter*>(h64);
  Counter32& src = *static_cast<Counter32*>(h32);
  for (size_t i = 0; i <= src.mask; ++i) {
    if (src.entries[i].cnt != 0) {
      dst.add(static_cast<int64_t>(src.entries[i].key),
              static_cast<int64_t>(src.entries[i].cnt));
    }
  }
}

void nvt_counter32_free(void* h) { delete static_cast<Counter32*>(h); }

void* nvt_counter_create(int64_t initial_capacity) {
  auto* c = new Counter(static_cast<uint64_t>(
      initial_capacity > 0 ? initial_capacity : 1024));
  c->entries.populate_async();  // no-op below 16MB
  return c;
}

void nvt_counter_update(void* h, const int64_t* vals, int64_t n) {
  Counter& c = *static_cast<Counter*>(h);
  // prefetch a block of target slots ahead of the serial adds (the fit
  // counter is memory-latency bound at multi-million-key vocabularies);
  // slots are only hints — a grow() mid-block just wastes the remainder
  constexpr int64_t kBlock = 16;
  for (int64_t base = 0; base < n; base += kBlock) {
    const int64_t m_n = (n - base) < kBlock ? (n - base) : kBlock;
    for (int64_t j = 0; j < m_n; ++j) {
      const int64_t k = vals[base + j];
      __builtin_prefetch(&c.entries[mix64(static_cast<uint64_t>(k)) & c.mask], 1, 1);
    }
    for (int64_t j = 0; j < m_n; ++j) c.add(vals[base + j], 1);
  }
}

// int32 input variant: the dominant real-world key width (hashed Criteo ids
// are int32). Converting in-register here skips the int32->int64 numpy copy
// the ctypes boundary otherwise forces (2MB of fresh-page writes per
// 256K-row column batch — measured as a material slice of the fit scan).
void nvt_counter_update32(void* h, const int32_t* vals, int64_t n) {
  Counter& c = *static_cast<Counter*>(h);
  constexpr int64_t kBlock = 16;
  for (int64_t base = 0; base < n; base += kBlock) {
    const int64_t m_n = (n - base) < kBlock ? (n - base) : kBlock;
    for (int64_t j = 0; j < m_n; ++j) {
      const int64_t k = vals[base + j];
      __builtin_prefetch(&c.entries[mix64(static_cast<uint64_t>(k)) & c.mask], 1, 1);
    }
    for (int64_t j = 0; j < m_n; ++j)
      c.add(static_cast<int64_t>(vals[base + j]), 1);
  }
}

void nvt_counter_add(void* h, const int64_t* keys, const int64_t* counts, int64_t n) {
  Counter& c = *static_cast<Counter*>(h);
  // same blocked prefetch as nvt_counter_update — merge-time adds are the
  // multi-host reduce hot loop (exchange_partial_counts re-adds shards)
  constexpr int64_t kBlock = 16;
  for (int64_t base = 0; base < n; base += kBlock) {
    const int64_t m_n = (n - base) < kBlock ? (n - base) : kBlock;
    for (int64_t j = 0; j < m_n; ++j) {
      const int64_t k = keys[base + j];
      __builtin_prefetch(&c.entries[mix64(static_cast<uint64_t>(k)) & c.mask], 1, 1);
    }
    for (int64_t j = 0; j < m_n; ++j) c.add(keys[base + j], counts[base + j]);
  }
}

void nvt_counter_reserve(void* h, int64_t n) {
  static_cast<Counter*>(h)->reserve(static_cast<uint64_t>(n > 0 ? n : 0));
}

int64_t nvt_counter_size(void* h) {
  return static_cast<int64_t>(static_cast<Counter*>(h)->used);
}

void nvt_counter_extract(void* h, int64_t* keys_out, int64_t* counts_out) {
  Counter& c = *static_cast<Counter*>(h);
  int64_t j = 0;
  for (size_t i = 0; i <= c.mask; ++i) {
    if (c.entries[i].cnt != 0) {
      keys_out[j] = c.entries[i].key;
      counts_out[j] = c.entries[i].cnt;
      ++j;
    }
  }
}

// Extract already in vocabulary order: count descending, key ascending —
// the exact order fit_finalize needs. One GIL-released C++ sort replaces
// extract + np.lexsort (two stable argsort passes over 64-bit lanes,
// measured ~4x slower than sorting the 16-byte entries in place).
void nvt_counter_extract_sorted(void* h, int64_t* keys_out, int64_t* counts_out) {
  Counter& c = *static_cast<Counter*>(h);
  std::vector<Counter::Entry> items;
  items.reserve(c.used);
  for (size_t i = 0; i <= c.mask; ++i) {
    if (c.entries[i].cnt != 0) items.push_back(c.entries[i]);
  }
  std::sort(items.begin(), items.end(),
            [](const Counter::Entry& a, const Counter::Entry& b) {
              if (a.cnt != b.cnt) return a.cnt > b.cnt;
              return a.key < b.key;
            });
  for (size_t i = 0; i < items.size(); ++i) {
    keys_out[i] = items[i].key;
    counts_out[i] = items[i].cnt;
  }
}

void nvt_counter_free(void* h) { delete static_cast<Counter*>(h); }

// ---------------------------------------------------------------------------
// Bucketed-cuckoo build for the device lookup tables (ops/lookup.py):
// 4-slot buckets, two hash choices, random-walk eviction. The hash MUST
// match lookup.py's _mix32 (murmur3 finalizer over uint32, seeds 0 and
// 0x9E3779B9) — the device kernel probes with the same function.
// ---------------------------------------------------------------------------

namespace {

inline uint32_t mix32(uint32_t h) {
  h ^= h >> 16;
  h *= 0x85EBCA6Bu;
  h ^= h >> 13;
  h *= 0xC2B2AE35u;
  h ^= h >> 16;
  return h;
}

constexpr uint32_t kCuckooSeed2 = 0x9E3779B9u;
constexpr int kSlots = 4;

}  // namespace

// packed: int32 [nb, 8] = [k0..k3, v0..v3]; caller allocates. Returns 1 on
// success, 0 when an eviction walk exceeds its budget (caller doubles nb).
int64_t nvt_cuckoo_build(const int32_t* keys, const int32_t* vals, int64_t n,
                         int64_t nb, int32_t* packed) {
  // modulo (not pow2 mask) range reduction: bucket counts are EXACT so the
  // packed table's bytes stay minimal — the device gather rate tracks the
  // operand size (lookup.py CuckooLookup docstring). Must match
  // lookup.py's `_mix32 % nb` bit for bit.
  const uint32_t nbu = static_cast<uint32_t>(nb);
  for (int64_t b = 0; b < nb; ++b) {
    for (int s = 0; s < kSlots; ++s) {
      packed[b * 8 + s] = 0;
      packed[b * 8 + kSlots + s] = -1;  // empty marker lives in the val lane
    }
  }
  uint64_t rng = 0x9E3779B97F4A7C15ULL;
  for (int64_t i = 0; i < n; ++i) {
    int32_t k = keys[i];
    int32_t v = vals[i];
    uint32_t u = static_cast<uint32_t>(k);
    uint32_t cb = mix32(u) % nbu;
    bool placed = false;
    for (int attempt = 0; attempt < 500; ++attempt) {
      int32_t* row = packed + static_cast<int64_t>(cb) * 8;
      int empty = -1;
      for (int s = 0; s < kSlots; ++s) {
        if (row[kSlots + s] == -1) {
          empty = s;
          break;
        }
      }
      if (empty >= 0) {
        row[empty] = k;
        row[kSlots + empty] = v;
        placed = true;
        break;
      }
      // evict a pseudo-random occupant and move to its alternate bucket
      rng = rng * 6364136223846793005ULL + 1442695040888963407ULL;
      int s = static_cast<int>((rng >> 33) & (kSlots - 1));
      int32_t ek = row[s];
      int32_t ev = row[kSlots + s];
      row[s] = k;
      row[kSlots + s] = v;
      k = ek;
      v = ev;
      u = static_cast<uint32_t>(k);
      uint32_t h1 = mix32(u) % nbu;
      uint32_t h2 = mix32(u ^ kCuckooSeed2) % nbu;
      cb = (cb == h1) ? h2 : h1;
    }
    if (!placed) return 0;
  }
  return 1;
}

}  // extern "C"
