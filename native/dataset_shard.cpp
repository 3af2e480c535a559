// dataset_shard: streaming multi-episode shard store.
//
// Packs many episode tensor-bundles into ONE file written incrementally
// (episodes are appended as they are generated — the dataset never has to
// fit in RAM) and read back via a single mmap. Each episode block reuses
// the episode_store.cpp bundle layout (magic + entry table + 64-byte
// aligned float32 payloads) with offsets relative to the BLOCK start, so
// the two formats share parsing logic conceptually; a footer index lists
// block offsets. The reference has no streaming story at all (one BSON
// per episode, src/data.jl:60-71).
//
// Format (little-endian):
//   magic   u64  0x5741564553485244 ("WAVESHRD")
//   idx_off u64  (byte offset of the footer index; 0 until ds_finish)
//   blocks: per episode, a WAVESTOR-style bundle (offsets block-relative)
//   footer @ idx_off: n_episodes u64, block_offset u64[n]
//
// C API (ctypes-friendly).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kShardMagic = 0x5741564553485244ULL;
constexpr uint64_t kBundleMagic = 0x5741564553544f52ULL;  // episode_store's
constexpr uint64_t kAlign = 64;

struct Entry {
  std::string name;
  std::vector<uint64_t> dims;
  uint64_t offset = 0;  // relative to block start
  uint64_t numel() const {
    uint64_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
};

struct Writer {
  FILE* f = nullptr;
  std::vector<uint64_t> block_offsets;
  uint64_t cursor = 16;  // after shard header
};

struct ShardReader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  std::vector<uint64_t> block_offsets;
  std::vector<std::vector<Entry>> episodes;
};

bool parse_bundle(const uint8_t* p, size_t size, std::vector<Entry>* out) {
  if (size < 16) return false;
  uint64_t magic, count;
  std::memcpy(&magic, p, 8);
  std::memcpy(&count, p + 8, 8);
  if (magic != kBundleMagic) return false;
  size_t off = 16;
  out->clear();
  for (uint64_t i = 0; i < count; ++i) {
    if (off + 4 > size) return false;
    uint32_t name_len;
    std::memcpy(&name_len, p + off, 4);
    off += 4;
    if (off + name_len + 4 > size) return false;
    Entry e;
    e.name.assign(reinterpret_cast<const char*>(p + off), name_len);
    off += name_len;
    uint32_t ndim;
    std::memcpy(&ndim, p + off, 4);
    off += 4;
    if (off + 8ull * ndim + 8 > size) return false;
    e.dims.resize(ndim);
    std::memcpy(e.dims.data(), p + off, 8ull * ndim);
    off += 8ull * ndim;
    std::memcpy(&e.offset, p + off, 8);
    off += 8;
    if (e.offset + e.numel() * 4 > size) return false;
    out->push_back(std::move(e));
  }
  return true;
}

}  // namespace

extern "C" {

// ---- streaming writer -------------------------------------------------------

void* ds_create(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  uint64_t magic = kShardMagic, idx_off = 0;
  if (std::fwrite(&magic, 8, 1, f) != 1 || std::fwrite(&idx_off, 8, 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  auto* w = new Writer;
  w->f = f;
  return w;
}

// Append one episode bundle; argument layout identical to ws_write.
// Returns the episode index, or -1 on error.
int64_t ds_append(void* h, uint64_t count, const char* names,
                  const uint32_t* ndims, const uint64_t* dims_flat,
                  const float* const* data) {
  auto* w = static_cast<Writer*>(h);
  std::vector<Entry> entries(count);
  const char* nm = names;
  const uint64_t* dp = dims_flat;
  uint64_t header = 16;
  for (uint64_t i = 0; i < count; ++i) {
    entries[i].name = nm;
    nm += entries[i].name.size() + 1;
    entries[i].dims.assign(dp, dp + ndims[i]);
    dp += ndims[i];
    header += 4 + entries[i].name.size() + 4 + 8ull * entries[i].dims.size() + 8;
  }
  uint64_t off = (header + kAlign - 1) / kAlign * kAlign;
  for (auto& e : entries) {
    e.offset = off;
    off += (e.numel() * 4 + kAlign - 1) / kAlign * kAlign;
  }

  // align the block start itself
  uint64_t block_start = (w->cursor + kAlign - 1) / kAlign * kAlign;
  if (std::fseek(w->f, (long)block_start, SEEK_SET) != 0) return -1;

  std::vector<uint8_t> head((size_t)((header + kAlign - 1) / kAlign * kAlign), 0);
  std::memcpy(head.data(), &kBundleMagic, 8);
  std::memcpy(head.data() + 8, &count, 8);
  size_t ho = 16;
  for (auto& e : entries) {
    uint32_t nl = (uint32_t)e.name.size();
    std::memcpy(head.data() + ho, &nl, 4);
    ho += 4;
    std::memcpy(head.data() + ho, e.name.data(), nl);
    ho += nl;
    uint32_t nd = (uint32_t)e.dims.size();
    std::memcpy(head.data() + ho, &nd, 4);
    ho += 4;
    std::memcpy(head.data() + ho, e.dims.data(), 8ull * nd);
    ho += 8ull * nd;
    std::memcpy(head.data() + ho, &e.offset, 8);
    ho += 8;
  }
  if (std::fwrite(head.data(), 1, head.size(), w->f) != head.size()) return -1;
  for (uint64_t i = 0; i < count; ++i) {
    long cur = std::ftell(w->f);
    for (; cur < (long)(block_start + entries[i].offset); ++cur)
      std::fputc(0, w->f);
    uint64_t bytes = entries[i].numel() * 4;
    if (std::fwrite(data[i], 1, bytes, w->f) != bytes) return -1;
  }
  w->cursor = (uint64_t)std::ftell(w->f);
  w->block_offsets.push_back(block_start);
  return (int64_t)w->block_offsets.size() - 1;
}

// Write the footer index + patch the header; frees the writer. 0 on success.
int ds_finish(void* h) {
  auto* w = static_cast<Writer*>(h);
  uint64_t idx_off = (w->cursor + kAlign - 1) / kAlign * kAlign;
  int rc = 0;
  if (std::fseek(w->f, (long)idx_off, SEEK_SET) != 0) rc = 1;
  uint64_t n = w->block_offsets.size();
  if (!rc && std::fwrite(&n, 8, 1, w->f) != 1) rc = 2;
  if (!rc && n &&
      std::fwrite(w->block_offsets.data(), 8, n, w->f) != n)
    rc = 3;
  if (!rc && std::fseek(w->f, 8, SEEK_SET) != 0) rc = 4;
  if (!rc && std::fwrite(&idx_off, 8, 1, w->f) != 1) rc = 5;
  std::fclose(w->f);
  delete w;
  return rc;
}

// ---- mmap reader -------------------------------------------------------------

void* dss_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* r = new ShardReader;
  r->fd = fd;
  r->base = static_cast<const uint8_t*>(base);
  r->size = st.st_size;
  bool ok = r->size >= 16;
  uint64_t magic = 0, idx_off = 0;
  if (ok) {
    std::memcpy(&magic, r->base, 8);
    std::memcpy(&idx_off, r->base + 8, 8);
    ok = magic == kShardMagic && idx_off != 0 && idx_off + 8 <= r->size;
  }
  uint64_t n = 0;
  if (ok) {
    std::memcpy(&n, r->base + idx_off, 8);
    // overflow-safe: a corrupt count must not wrap 8*n past size
    ok = n <= (r->size - idx_off - 8) / 8;
  }
  if (ok) {
    r->block_offsets.resize(n);
    std::memcpy(r->block_offsets.data(), r->base + idx_off + 8, 8 * n);
    r->episodes.resize(n);
    for (uint64_t i = 0; ok && i < n; ++i) {
      ok = r->block_offsets[i] < r->size &&
           parse_bundle(r->base + r->block_offsets[i],
                        r->size - r->block_offsets[i], &r->episodes[i]);
    }
  }
  if (!ok) {
    munmap(base, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  return r;
}

uint64_t dss_episodes(void* h) {
  return static_cast<ShardReader*>(h)->episodes.size();
}

uint64_t dss_count(void* h, uint64_t ep) {
  return static_cast<ShardReader*>(h)->episodes[ep].size();
}

const char* dss_name(void* h, uint64_t ep, uint64_t i) {
  return static_cast<ShardReader*>(h)->episodes[ep][i].name.c_str();
}

uint32_t dss_ndim(void* h, uint64_t ep, uint64_t i) {
  return (uint32_t)static_cast<ShardReader*>(h)->episodes[ep][i].dims.size();
}

void dss_dims(void* h, uint64_t ep, uint64_t i, uint64_t* out) {
  auto& e = static_cast<ShardReader*>(h)->episodes[ep][i];
  std::memcpy(out, e.dims.data(), 8ull * e.dims.size());
}

uint64_t dss_numel(void* h, uint64_t ep, uint64_t i) {
  return static_cast<ShardReader*>(h)->episodes[ep][i].numel();
}

// Zero-copy pointer into the mapped shard (valid until dss_close).
const float* dss_data(void* h, uint64_t ep, uint64_t i) {
  auto* r = static_cast<ShardReader*>(h);
  auto& e = r->episodes[ep][i];
  return reinterpret_cast<const float*>(r->base + r->block_offsets[ep] + e.offset);
}

void dss_read(void* h, uint64_t ep, uint64_t i, float* out) {
  auto* r = static_cast<ShardReader*>(h);
  std::memcpy(out, dss_data(h, ep, i), r->episodes[ep][i].numel() * 4);
}

void dss_close(void* h) {
  auto* r = static_cast<ShardReader*>(h);
  munmap(const_cast<uint8_t*>(r->base), r->size);
  ::close(r->fd);
  delete r;
}

}  // extern "C"
