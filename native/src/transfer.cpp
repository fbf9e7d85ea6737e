// Async transfer engine: worker threads + priority queue + callbacks
// (C++ rebuild of reference rust/pygpukit-core/src/transfer/{engine,pinned,
// operation}.rs — engine.rs:144 AsyncTransferEngine).
//
// Workers perform the host-side staging memcpy; the device upload/download
// happens in the callback on the Python/XLA side (mirroring the reference
// split where Rust owns queues and C++ owns cudaMemcpyAsync).

#include "pygpukit_native.h"

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

struct Op {
  uint64_t id;
  const void* src;
  void* dst;
  uint64_t bytes;
  int dir;
  int priority;          // lower value = higher priority
  uint64_t seq;
  PkTransferCallback cb;
  void* user;
};

struct OpCmp {
  bool operator()(const Op& a, const Op& b) const {
    if (a.priority != b.priority) return a.priority > b.priority;
    return a.seq > b.seq;  // FIFO within priority
  }
};

struct Engine {
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable done_cv;
  std::priority_queue<Op, std::vector<Op>, OpCmp> queue;
  std::unordered_set<uint64_t> in_flight;
  std::unordered_set<uint64_t> completed;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  uint64_t next_id = 1;
  uint64_t seq = 0;
  PkTransferStats stats{};

  explicit Engine(int n) {
    for (int i = 0; i < n; i++) {
      workers.emplace_back([this] { run(); });
    }
  }

  ~Engine() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }

  void run() {
    for (;;) {
      Op op;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        op = queue.top();
        queue.pop();
        in_flight.insert(op.id);
        stats.queue_depth = queue.size();
      }
      if (op.src && op.dst && op.bytes) {
        std::memcpy(op.dst, op.src, op.bytes);
      }
      if (op.cb) op.cb(op.id, op.user);
      {
        std::lock_guard<std::mutex> lk(mu);
        in_flight.erase(op.id);
        completed.insert(op.id);
        stats.completed++;
        if (op.dir == 0) stats.bytes_h2d += op.bytes;
        else stats.bytes_d2h += op.bytes;
        if (completed.size() > (1u << 16)) completed.clear();  // bound memory
      }
      done_cv.notify_all();
    }
  }

  uint64_t submit(const Op& proto) {
    std::lock_guard<std::mutex> lk(mu);
    Op op = proto;
    op.id = next_id++;
    op.seq = ++seq;
    queue.push(op);
    stats.submitted++;
    stats.queue_depth = queue.size();
    cv.notify_one();
    return op.id;
  }

  int wait(uint64_t id) {
    std::unique_lock<std::mutex> lk(mu);
    done_cv.wait(lk, [this, id] {
      return completed.count(id) > 0 ||
             (queue.empty() && in_flight.empty());
    });
    return completed.count(id) ? 0 : -1;
  }

  void sync() {
    std::unique_lock<std::mutex> lk(mu);
    done_cv.wait(lk, [this] { return queue.empty() && in_flight.empty(); });
  }
};

}  // namespace

extern "C" {

void* pk_transfer_create(int num_workers) {
  return new Engine(num_workers > 0 ? num_workers : 2);
}

void pk_transfer_destroy(void* t) { delete static_cast<Engine*>(t); }

uint64_t pk_transfer_submit(void* t, const void* src, void* dst,
                            uint64_t bytes, int dir, int priority,
                            PkTransferCallback cb, void* user) {
  Op op{};
  op.src = src;
  op.dst = dst;
  op.bytes = bytes;
  op.dir = dir;
  op.priority = priority;
  op.cb = cb;
  op.user = user;
  return static_cast<Engine*>(t)->submit(op);
}

int pk_transfer_wait(void* t, uint64_t op_id) {
  return static_cast<Engine*>(t)->wait(op_id);
}

void pk_transfer_sync(void* t) { static_cast<Engine*>(t)->sync(); }

void pk_transfer_stats(void* t, PkTransferStats* out) {
  Engine* e = static_cast<Engine*>(t);
  std::lock_guard<std::mutex> lk(e->mu);
  *out = e->stats;
}

}  // extern "C"
