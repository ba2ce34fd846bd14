// Native LMDB reader: mmap + B+tree lookups for the data hot path.
//
// The reference's data loaders sit on liblmdb (a C library) via py-lmdb;
// this is the equivalent native layer for fudanocr_tpu: a read-only
// implementation of the LMDB 0.9.x on-disk format (little-endian 64-bit,
// 4096-byte pages) exposed through a minimal C ABI consumed with ctypes
// (fudanocr_tpu/data/lmdb_store.py picks it up when built).
//
// Supported: meta-page selection by txnid, branch/leaf traversal with
// binary search, F_BIGDATA overflow chains, ordered stats. Not supported
// (unused by the datasets): DUPSORT, LEAF2, writes.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0xBEEFC0DE;
constexpr uint64_t kInvalid = ~0ULL;
constexpr size_t kPageSize = 4096;
constexpr size_t kPageHdr = 16;

constexpr uint16_t P_BRANCH = 0x01;
constexpr uint16_t P_LEAF = 0x02;
constexpr uint16_t F_BIGDATA = 0x01;

#pragma pack(push, 1)
struct Db {
  uint32_t pad;
  uint16_t flags;
  uint16_t depth;
  uint64_t branch_pages, leaf_pages, overflow_pages, entries, root;
};
struct Meta {
  uint32_t magic, version;
  uint64_t address, mapsize;
  Db free_db, main_db;
  uint64_t last_pg, txnid;
};
struct PageHdr {
  uint64_t pgno;
  uint16_t pad, flags, lower, upper;
};
struct Node {
  uint16_t lo, hi, flags, ksize;
};
#pragma pack(pop)

struct Env {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  Db main;
};

inline const PageHdr* page(const Env* e, uint64_t pgno) {
  return reinterpret_cast<const PageHdr*>(e->map + pgno * kPageSize);
}

inline const uint16_t* ptrs(const PageHdr* p) {
  return reinterpret_cast<const uint16_t*>(
      reinterpret_cast<const uint8_t*>(p) + kPageHdr);
}

inline int nkeys(const PageHdr* p) { return (p->lower - kPageHdr) / 2; }

inline const Node* node(const PageHdr* p, int i) {
  return reinterpret_cast<const Node*>(
      reinterpret_cast<const uint8_t*>(p) + ptrs(p)[i]);
}

inline const uint8_t* node_key(const Node* n) {
  return reinterpret_cast<const uint8_t*>(n) + sizeof(Node);
}

inline uint64_t branch_pgno(const Node* n) {
  return uint64_t(n->lo) | (uint64_t(n->hi) << 16)
       | (uint64_t(n->flags) << 32);
}

int keycmp(const uint8_t* a, size_t alen, const uint8_t* b, size_t blen) {
  size_t m = alen < blen ? alen : blen;
  int c = memcmp(a, b, m);
  if (c) return c;
  return (alen > blen) - (alen < blen);
}

}  // namespace

extern "C" {

void* lmdb_open(const char* path) {
  Env* e = new Env();
  e->fd = open(path, O_RDONLY);
  if (e->fd < 0) { delete e; return nullptr; }
  struct stat st;
  fstat(e->fd, &st);
  e->size = size_t(st.st_size);
  e->map = static_cast<const uint8_t*>(
      mmap(nullptr, e->size, PROT_READ, MAP_SHARED, e->fd, 0));
  if (e->map == MAP_FAILED) { close(e->fd); delete e; return nullptr; }

  const Meta* m0 = reinterpret_cast<const Meta*>(e->map + kPageHdr);
  const Meta* m1 =
      reinterpret_cast<const Meta*>(e->map + kPageSize + kPageHdr);
  if (m0->magic != kMagic) {
    munmap(const_cast<uint8_t*>(e->map), e->size);
    close(e->fd);
    delete e;
    return nullptr;
  }
  e->main = (m1->txnid >= m0->txnid) ? m1->main_db : m0->main_db;
  return e;
}

void lmdb_close(void* env) {
  Env* e = static_cast<Env*>(env);
  if (!e) return;
  munmap(const_cast<uint8_t*>(e->map), e->size);
  close(e->fd);
  delete e;
}

uint64_t lmdb_entries(void* env) {
  return static_cast<Env*>(env)->main.entries;
}

// Returns pointer to value bytes inside the map (zero-copy) and sets
// *val_len; nullptr if the key is absent.
const uint8_t* lmdb_get(void* env, const uint8_t* key, uint32_t key_len,
                        uint64_t* val_len) {
  const Env* e = static_cast<Env*>(env);
  uint64_t pgno = e->main.root;
  if (pgno == kInvalid) return nullptr;

  for (int depth = 0; depth < 64; ++depth) {
    const PageHdr* p = page(e, pgno);
    int n = nkeys(p);
    if (p->flags & P_LEAF) {
      int lo = 0, hi = n - 1;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const Node* nd = node(p, mid);
        int c = keycmp(key, key_len, node_key(nd), nd->ksize);
        if (c == 0) {
          uint64_t dsize = uint64_t(nd->lo) | (uint64_t(nd->hi) << 16);
          *val_len = dsize;
          if (nd->flags & F_BIGDATA) {
            uint64_t ov;
            memcpy(&ov, node_key(nd) + nd->ksize, 8);
            return e->map + ov * kPageSize + kPageHdr;
          }
          return node_key(nd) + nd->ksize;
        }
        if (c > 0) lo = mid + 1; else hi = mid - 1;
      }
      return nullptr;
    }
    // branch: rightmost child with key <= target (node 0 key is empty)
    int lo = 1, hi = n - 1, idx = 0;
    while (lo <= hi) {
      int mid = (lo + hi) / 2;
      const Node* nd = node(p, mid);
      if (keycmp(node_key(nd), nd->ksize, key, key_len) <= 0) {
        idx = mid;
        lo = mid + 1;
      } else {
        hi = mid - 1;
      }
    }
    pgno = branch_pgno(node(p, idx));
  }
  return nullptr;
}

// Batched get: copies each value into out at the given offsets. Returns the
// number of keys found. out_lens[i] = value length or 0 if missing/too big.
uint32_t lmdb_get_batch(void* env, const uint8_t* keys,
                        const uint32_t* key_lens, uint32_t n_keys,
                        uint8_t* out, const uint64_t* out_offsets,
                        uint64_t out_capacity, uint64_t* out_lens) {
  uint32_t found = 0;
  const uint8_t* kp = keys;
  for (uint32_t i = 0; i < n_keys; ++i) {
    uint64_t vlen = 0;
    const uint8_t* v = lmdb_get(env, kp, key_lens[i], &vlen);
    kp += key_lens[i];
    if (v && out_offsets[i] + vlen <= out_capacity) {
      memcpy(out + out_offsets[i], v, vlen);
      out_lens[i] = vlen;
      ++found;
    } else {
      out_lens[i] = 0;
    }
  }
  return found;
}

// Batched zero-copy lookup: one FFI crossing for n_keys B+tree walks.
// Fills out_ptrs[i] with the absolute address of value i inside the map
// (0 if missing) and out_lens[i] with its length. The caller copies (or
// decodes in place) from those addresses; the mmap stays valid until
// lmdb_close. Keys arrive concatenated with per-key lengths.
uint32_t lmdb_get_ptrs(void* env, const uint8_t* keys,
                       const uint32_t* key_lens, uint32_t n_keys,
                       const uint8_t** out_ptrs, uint64_t* out_lens) {
  uint32_t found = 0;
  const uint8_t* kp = keys;
  for (uint32_t i = 0; i < n_keys; ++i) {
    uint64_t vlen = 0;
    const uint8_t* v = lmdb_get(env, kp, key_lens[i], &vlen);
    kp += key_lens[i];
    out_ptrs[i] = v;
    out_lens[i] = v ? vlen : 0;
    if (v) ++found;
  }
  return found;
}

}  // extern "C"
