// QoS scheduler + admission control + partitions
// (C++ rebuild of reference rust/pygpukit-core/src/scheduler/{core,qos,
// admission,partition,task}.rs — qos.rs:12, admission.rs:207, partition.rs:127).

#include "pygpukit_native.h"

#include <algorithm>
#include <deque>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Task {
  uint64_t id;
  PkTaskDesc desc;
  int32_t state = PK_TASK_PENDING;
  uint64_t seq;              // FIFO tiebreak
};

struct Partition {
  PkPartitionLimits limits;
  PkPartitionUsage usage{};
  bool alive = true;
};

// QoS policy table (reference qos.rs: priority, preemption, overcommit,
// bandwidth share per class)
struct QosPolicy {
  int base_priority;
  double overcommit;       // fraction of overcommit headroom usable
  double bandwidth_share;  // guaranteed fraction
};

constexpr QosPolicy kQos[3] = {
    /* GUARANTEED  */ {300, 0.0, 0.5},
    /* BURSTABLE   */ {200, 1.0, 0.3},
    /* BEST_EFFORT */ {100, 1.0, 0.2},
};

struct Sched {
  std::mutex mu;
  PkSchedConfig cfg;
  uint64_t next_task = 1;
  uint64_t next_part = 1;
  uint64_t seq = 0;
  uint64_t reserved = 0;          // memory reserved by queued+running tasks
  double bandwidth_reserved = 0;
  PkSchedStats stats{};
  std::unordered_map<uint64_t, Task> tasks;
  std::vector<uint64_t> queue;    // ids, selection scans by policy
  std::unordered_map<uint64_t, Partition> parts;

  explicit Sched(const PkSchedConfig& c) : cfg(c) {}

  uint64_t schedulable_memory(int32_t qos) const {
    double ratio = 1.0 + (cfg.overcommit_ratio - 1.0) * kQos[qos].overcommit;
    return static_cast<uint64_t>(cfg.total_memory * ratio);
  }

  PkAdmitResult admit(const PkTaskDesc& d) {
    PkAdmitResult r{};
    uint64_t limit = schedulable_memory(d.qos);
    r.available_memory = limit > reserved ? limit - reserved : 0;

    // typed rejections (reference admission.rs:10-36)
    if (d.memory_bytes > limit) {
      r.decision = PK_REJECT_MEMORY;
      return r;
    }
    if (cfg.total_bandwidth > 0 &&
        bandwidth_reserved + d.bandwidth > cfg.total_bandwidth) {
      r.decision = PK_REJECT_BANDWIDTH;
      return r;
    }
    if (queue.size() >= cfg.max_pending) {
      r.decision = PK_REJECT_QUEUE_FULL;
      return r;
    }
    // partition limits
    if (d.partition_id) {
      auto it = parts.find(d.partition_id);
      if (it == parts.end() || !it->second.alive) {
        r.decision = PK_REJECT_DEPS;
        return r;
      }
      const Partition& p = it->second;
      if (p.usage.memory_used + d.memory_bytes > p.limits.memory_bytes) {
        r.decision = PK_REJECT_MEMORY;
        return r;
      }
    }
    if (d.memory_bytes <= r.available_memory) {
      r.decision = PK_ADMIT_OK;
    } else {
      r.decision = PK_ADMIT_QUEUE;
      // deterministic ETA estimate: deficit / bandwidth heuristic
      double deficit = double(d.memory_bytes - r.available_memory);
      r.eta_seconds = cfg.total_bandwidth > 0
                          ? deficit / (cfg.total_bandwidth * 1e6)
                          : 0.1 * queue.size();
    }
    return r;
  }

  uint64_t submit(const PkTaskDesc& d, PkAdmitResult* out) {
    std::lock_guard<std::mutex> lk(mu);
    PkAdmitResult r = admit(d);
    if (out) *out = r;
    stats.submitted++;
    if (r.decision >= PK_REJECT_MEMORY) {
      stats.rejected++;
      Task t{next_task++, d, PK_TASK_REJECTED, ++seq};
      uint64_t id = t.id;
      tasks.emplace(id, t);
      if (d.partition_id) {
        auto it = parts.find(d.partition_id);
        if (it != parts.end()) it->second.usage.tasks_rejected++;
      }
      return id;
    }
    Task t{next_task++, d, PK_TASK_QUEUED, ++seq};
    uint64_t id = t.id;
    tasks.emplace(id, t);
    queue.push_back(id);
    stats.queued++;
    reserved += d.memory_bytes;
    bandwidth_reserved += d.bandwidth;
    if (d.partition_id) {
      auto it = parts.find(d.partition_id);
      if (it != parts.end()) {
        it->second.usage.memory_used += d.memory_bytes;
        it->second.usage.bandwidth_used += d.bandwidth;
        it->second.usage.tasks_admitted++;
      }
    }
    return id;
  }

  uint64_t next() {
    std::lock_guard<std::mutex> lk(mu);
    // order: QoS class ascending (GUARANTEED first), priority desc, FIFO
    int best = -1;
    for (size_t i = 0; i < queue.size(); i++) {
      const Task& t = tasks[queue[i]];
      if (best < 0) { best = int(i); continue; }
      const Task& b = tasks[queue[best]];
      int ta = t.desc.qos, tb = b.desc.qos;
      long pa = kQos[ta].base_priority + t.desc.priority;
      long pb = kQos[tb].base_priority + b.desc.priority;
      if (ta < tb || (ta == tb && (pa > pb || (pa == pb && t.seq < b.seq)))) {
        best = int(i);
      }
    }
    if (best < 0) return 0;
    uint64_t id = queue[best];
    queue.erase(queue.begin() + best);
    Task& t = tasks[id];
    t.state = PK_TASK_RUNNING;
    stats.queued--;
    stats.running++;
    return id;
  }

  int complete(uint64_t id, bool failed) {
    std::lock_guard<std::mutex> lk(mu);
    auto it = tasks.find(id);
    if (it == tasks.end()) return -1;
    Task& t = it->second;
    if (t.state != PK_TASK_RUNNING && t.state != PK_TASK_QUEUED) return -1;
    if (t.state == PK_TASK_QUEUED) {
      queue.erase(std::remove(queue.begin(), queue.end(), id), queue.end());
      stats.queued--;
    } else {
      stats.running--;
    }
    release_locked(t);
    t.state = failed ? PK_TASK_FAILED : PK_TASK_COMPLETED;
    if (failed) stats.failed++; else stats.completed++;
    return 0;
  }

  void release_locked(const Task& t) {
    reserved -= std::min(reserved, t.desc.memory_bytes);
    bandwidth_reserved = std::max(0.0, bandwidth_reserved - t.desc.bandwidth);
    if (t.desc.partition_id) {
      auto it = parts.find(t.desc.partition_id);
      if (it != parts.end()) {
        Partition& p = it->second;
        p.usage.memory_used -=
            std::min(p.usage.memory_used, t.desc.memory_bytes);
        p.usage.bandwidth_used =
            std::max(0.0, p.usage.bandwidth_used - t.desc.bandwidth);
      }
    }
  }
};

}  // namespace

extern "C" {

void* pk_sched_create(const PkSchedConfig* cfg) { return new Sched(*cfg); }

void pk_sched_destroy(void* s) { delete static_cast<Sched*>(s); }

uint64_t pk_sched_submit(void* s, const PkTaskDesc* task, PkAdmitResult* out) {
  return static_cast<Sched*>(s)->submit(*task, out);
}

uint64_t pk_sched_next(void* s) { return static_cast<Sched*>(s)->next(); }

int pk_sched_complete(void* s, uint64_t task_id, int failed) {
  return static_cast<Sched*>(s)->complete(task_id, failed != 0);
}

int pk_sched_cancel(void* s, uint64_t task_id) {
  return static_cast<Sched*>(s)->complete(task_id, true);
}

int32_t pk_sched_task_state(void* s, uint64_t task_id) {
  Sched* sc = static_cast<Sched*>(s);
  std::lock_guard<std::mutex> lk(sc->mu);
  auto it = sc->tasks.find(task_id);
  return it == sc->tasks.end() ? -1 : it->second.state;
}

void pk_sched_stats(void* s, PkSchedStats* out) {
  Sched* sc = static_cast<Sched*>(s);
  std::lock_guard<std::mutex> lk(sc->mu);
  sc->stats.reserved_memory = sc->reserved;
  *out = sc->stats;
}

uint64_t pk_part_create(void* s, const PkPartitionLimits* limits) {
  Sched* sc = static_cast<Sched*>(s);
  std::lock_guard<std::mutex> lk(sc->mu);
  uint64_t id = sc->next_part++;
  Partition p;
  p.limits = *limits;
  sc->parts.emplace(id, p);
  return id;
}

int pk_part_destroy(void* s, uint64_t part_id) {
  Sched* sc = static_cast<Sched*>(s);
  std::lock_guard<std::mutex> lk(sc->mu);
  auto it = sc->parts.find(part_id);
  if (it == sc->parts.end()) return -1;
  it->second.alive = false;
  return 0;
}

int pk_part_acquire(void* s, uint64_t part_id, uint64_t mem, double bw) {
  Sched* sc = static_cast<Sched*>(s);
  std::lock_guard<std::mutex> lk(sc->mu);
  auto it = sc->parts.find(part_id);
  if (it == sc->parts.end() || !it->second.alive) return -1;
  Partition& p = it->second;
  if (p.usage.memory_used + mem > p.limits.memory_bytes) return -2;
  if (p.limits.bandwidth > 0 && p.usage.bandwidth_used + bw > p.limits.bandwidth)
    return -3;
  if (p.usage.streams_used + 1 > p.limits.max_streams) return -4;
  p.usage.memory_used += mem;
  p.usage.bandwidth_used += bw;
  p.usage.streams_used += 1;
  return 0;
}

int pk_part_release(void* s, uint64_t part_id, uint64_t mem, double bw) {
  Sched* sc = static_cast<Sched*>(s);
  std::lock_guard<std::mutex> lk(sc->mu);
  auto it = sc->parts.find(part_id);
  if (it == sc->parts.end()) return -1;
  Partition& p = it->second;
  p.usage.memory_used -= std::min(p.usage.memory_used, mem);
  p.usage.bandwidth_used = std::max(0.0, p.usage.bandwidth_used - bw);
  if (p.usage.streams_used) p.usage.streams_used -= 1;
  return 0;
}

int pk_part_usage(void* s, uint64_t part_id, PkPartitionUsage* out) {
  Sched* sc = static_cast<Sched*>(s);
  std::lock_guard<std::mutex> lk(sc->mu);
  auto it = sc->parts.find(part_id);
  if (it == sc->parts.end()) return -1;
  *out = it->second.usage;
  return 0;
}

}  // extern "C"
