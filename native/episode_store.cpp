// episode_store: fast binary tensor-bundle IO for episode datasets.
//
// The data-loading path of the framework (the reference stores episodes as
// BSON, src/data.jl:60-71; Python npz pays zlib + copy costs). This native
// store writes a simple packed format and reads it back via mmap with
// zero-copy into the caller's buffers.
//
// Format (little-endian):
//   magic  u64  0x5741564553544f52 ("WAVESTOR")
//   count  u64
//   repeat count times:
//     name_len u32, name bytes
//     ndim     u32, dims u64[ndim]
//     offset   u64 (byte offset of f32 data from file start)
//   ... raw float32 payloads (64-byte aligned)
//
// C API (ctypes-friendly), thread-safe for concurrent readers.
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

constexpr uint64_t kMagic = 0x5741564553544f52ULL;
constexpr uint64_t kAlign = 64;

struct Entry {
  std::string name;
  std::vector<uint64_t> dims;
  uint64_t offset = 0;
  uint64_t numel() const {
    uint64_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
};

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  std::vector<Entry> entries;
};

bool read_header(const uint8_t* p, size_t size, std::vector<Entry>* out) {
  if (size < 16) return false;
  uint64_t magic, count;
  std::memcpy(&magic, p, 8);
  std::memcpy(&count, p + 8, 8);
  if (magic != kMagic) return false;
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

// ---- writing ---------------------------------------------------------------

// names: concatenated NUL-separated names; ndims[i], dims flattened; data:
// array of pointers to float32 payloads. Returns 0 on success.
int ws_write(const char* path, uint64_t count, const char* names,
             const uint32_t* ndims, const uint64_t* dims_flat,
             const float* const* data) {
  std::vector<Entry> entries(count);
  const char* nm = names;
  const uint64_t* dp = dims_flat;
  // header size computation
  uint64_t header = 16;
  for (uint64_t i = 0; i < count; ++i) {
    entries[i].name = nm;
    nm += entries[i].name.size() + 1;
    entries[i].dims.assign(dp, dp + ndims[i]);
    dp += ndims[i];
    header += 4 + entries[i].name.size() + 4 + 8ull * ndims[i] + 8;
  }
  uint64_t off = (header + kAlign - 1) / kAlign * kAlign;
  for (auto& e : entries) {
    e.offset = off;
    off += (e.numel() * 4 + kAlign - 1) / kAlign * kAlign;
  }

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::vector<uint8_t> head((size_t)((header + kAlign - 1) / kAlign * kAlign), 0);
  std::memcpy(head.data(), &kMagic, 8);
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
  if (std::fwrite(head.data(), 1, head.size(), f) != head.size()) {
    std::fclose(f);
    return 2;
  }
  for (uint64_t i = 0; i < count; ++i) {
    // pad to the entry offset
    long cur = std::ftell(f);
    for (; cur < (long)entries[i].offset; ++cur) std::fputc(0, f);
    uint64_t bytes = entries[i].numel() * 4;
    if (std::fwrite(data[i], 1, bytes, f) != bytes) {
      std::fclose(f);
      return 3;
    }
  }
  std::fclose(f);
  return 0;
}

// ---- reading ---------------------------------------------------------------

void* ws_open(const char* path) {
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
  auto* r = new Reader;
  r->fd = fd;
  r->base = static_cast<const uint8_t*>(base);
  r->size = st.st_size;
  if (!read_header(r->base, r->size, &r->entries)) {
    munmap(base, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  return r;
}

uint64_t ws_count(void* h) { return static_cast<Reader*>(h)->entries.size(); }

const char* ws_name(void* h, uint64_t i) {
  return static_cast<Reader*>(h)->entries[i].name.c_str();
}

uint32_t ws_ndim(void* h, uint64_t i) {
  return (uint32_t)static_cast<Reader*>(h)->entries[i].dims.size();
}

void ws_dims(void* h, uint64_t i, uint64_t* out) {
  auto& e = static_cast<Reader*>(h)->entries[i];
  std::memcpy(out, e.dims.data(), 8ull * e.dims.size());
}

uint64_t ws_numel(void* h, uint64_t i) {
  return static_cast<Reader*>(h)->entries[i].numel();
}

// Zero-copy pointer into the mapped file (valid until ws_close).
const float* ws_data(void* h, uint64_t i) {
  auto* r = static_cast<Reader*>(h);
  return reinterpret_cast<const float*>(r->base + r->entries[i].offset);
}

// Copy into caller-owned buffer.
void ws_read(void* h, uint64_t i, float* out) {
  auto* r = static_cast<Reader*>(h);
  std::memcpy(out, ws_data(h, i), r->entries[i].numel() * 4);
}

void ws_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  munmap(const_cast<uint8_t*>(r->base), r->size);
  ::close(r->fd);
  delete r;
}

}  // extern "C"
