// Memory pool: size-class free lists, quota, LRU accounting
// (C++ rebuild of reference rust/pygpukit-core/src/memory/{pool,block,
// size_class}.rs — pool.rs:106).

#include "pygpukit_native.h"

#include <cstdlib>
#include <cstring>
#include <list>
#include <map>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

// size classes from 256B to 256MB, powers of two (reference SIZE_CLASSES,
// memory/pool.py:86-98)
constexpr uint64_t kMinClass = 256;
constexpr uint64_t kMaxClass = 256ull << 20;

uint64_t size_class_of(uint64_t size) {
  uint64_t c = kMinClass;
  while (c < size && c < kMaxClass) c <<= 1;
  return c;
}

struct Block {
  uint64_t id = 0;
  uint64_t size = 0;        // rounded to class
  uint64_t requested = 0;
  void* host = nullptr;
  bool in_use = false;
  uint64_t lru_tick = 0;
};

struct Pool {
  std::mutex mu;
  uint64_t quota;
  uint64_t used = 0;        // bytes in live blocks (in_use)
  uint64_t free_bytes = 0;  // bytes parked in free lists
  uint64_t next_id = 1;
  uint64_t tick = 0;
  PkPoolStats stats{};
  std::unordered_map<uint64_t, Block> blocks;
  // size class -> free block ids (LIFO for cache warmth)
  std::map<uint64_t, std::vector<uint64_t>> free_lists;

  explicit Pool(uint64_t q) : quota(q) { stats.quota_bytes = q; }

  ~Pool() {
    for (auto& [id, b] : blocks) {
      if (b.host) std::free(b.host);
    }
  }

  uint64_t alloc(uint64_t size, bool host_backed) {
    std::lock_guard<std::mutex> lk(mu);
    uint64_t cls = size_class_of(size);

    // free-list reuse
    auto it = free_lists.find(cls);
    if (it != free_lists.end() && !it->second.empty()) {
      uint64_t id = it->second.back();
      it->second.pop_back();
      Block& b = blocks[id];
      b.in_use = true;
      b.requested = size;
      b.lru_tick = ++tick;
      free_bytes -= b.size;
      used += b.size;
      stats.reuses++;
      stats.allocations++;
      bump_peak();
      return id;
    }

    // quota check: evict free blocks LRU-first, then fail
    while (used + free_bytes + cls > quota && free_bytes > 0) {
      evict_one_locked();
    }
    if (used + cls > quota) {
      stats.failures++;
      return 0;
    }

    Block b;
    b.id = next_id++;
    b.size = cls;
    b.requested = size;
    b.in_use = true;
    b.lru_tick = ++tick;
    if (host_backed) {
      b.host = std::malloc(cls);
      if (!b.host) {
        stats.failures++;
        return 0;
      }
    }
    used += cls;
    stats.allocations++;
    bump_peak();
    uint64_t id = b.id;
    blocks.emplace(id, b);
    return id;
  }

  bool free_block(uint64_t id) {
    std::lock_guard<std::mutex> lk(mu);
    auto it = blocks.find(id);
    if (it == blocks.end() || !it->second.in_use) return false;
    Block& b = it->second;
    b.in_use = false;
    b.lru_tick = ++tick;
    used -= b.size;
    free_bytes += b.size;
    free_lists[b.size].push_back(id);
    stats.frees++;
    return true;
  }

  void evict_one_locked() {
    // LRU across all free lists
    uint64_t victim = 0, oldest = UINT64_MAX, victim_cls = 0;
    size_t victim_idx = 0;
    for (auto& [cls, ids] : free_lists) {
      for (size_t i = 0; i < ids.size(); i++) {
        const Block& b = blocks[ids[i]];
        if (b.lru_tick < oldest) {
          oldest = b.lru_tick;
          victim = ids[i];
          victim_cls = cls;
          victim_idx = i;
        }
      }
    }
    if (!victim) return;
    auto& ids = free_lists[victim_cls];
    ids.erase(ids.begin() + victim_idx);
    Block& b = blocks[victim];
    if (b.host) std::free(b.host);
    free_bytes -= b.size;
    stats.evictions++;
    blocks.erase(victim);
  }

  uint64_t trim(uint64_t bytes) {
    std::lock_guard<std::mutex> lk(mu);
    uint64_t before = free_bytes;
    while (free_bytes > 0 && before - free_bytes < bytes) {
      uint64_t fb = free_bytes;
      evict_one_locked();
      if (free_bytes == fb) break;
    }
    return before - free_bytes;
  }

  void bump_peak() {
    if (used > stats.peak_bytes) stats.peak_bytes = used;
  }
};

}  // namespace

extern "C" {

void* pk_pool_create(uint64_t quota_bytes) { return new Pool(quota_bytes); }

void pk_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

uint64_t pk_pool_alloc(void* pool, uint64_t size, int host_backed) {
  return static_cast<Pool*>(pool)->alloc(size, host_backed != 0);
}

int pk_pool_free(void* pool, uint64_t block_id) {
  return static_cast<Pool*>(pool)->free_block(block_id) ? 0 : -1;
}

void* pk_pool_host_ptr(void* pool, uint64_t block_id) {
  Pool* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->mu);
  auto it = p->blocks.find(block_id);
  return it == p->blocks.end() ? nullptr : it->second.host;
}

uint64_t pk_pool_block_size(void* pool, uint64_t block_id) {
  Pool* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->mu);
  auto it = p->blocks.find(block_id);
  return it == p->blocks.end() ? 0 : it->second.size;
}

int pk_pool_touch(void* pool, uint64_t block_id) {
  Pool* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->mu);
  auto it = p->blocks.find(block_id);
  if (it == p->blocks.end()) return -1;
  it->second.lru_tick = ++p->tick;
  return 0;
}

uint64_t pk_pool_trim(void* pool, uint64_t bytes) {
  return static_cast<Pool*>(pool)->trim(bytes);
}

void pk_pool_stats(void* pool, PkPoolStats* out) {
  Pool* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->mu);
  p->stats.used_bytes = p->used;
  p->stats.free_list_bytes = p->free_bytes;
  *out = p->stats;
}

const char* pk_version(void) { return "pygpukit-tpu-native 0.1.0"; }

}  // extern "C"
