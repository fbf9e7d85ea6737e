/* C API for the pygpukit_tpu native runtime services.
 *
 * C++ rebuild of the reference's Rust layer (reference: rust/pygpukit-core/
 * src/{memory,scheduler,transfer}/ — pool.rs:106, qos.rs:12, admission.rs:207,
 * partition.rs:127, engine.rs:144). The native layer executes no TPU work
 * itself: it makes policy decisions (who runs, when, with how much memory)
 * and manages host staging buffers; Python/XLA owns device execution.
 *
 * Bound to Python via ctypes (no pybind11 in this environment).
 */

#ifndef PYGPUKIT_NATIVE_H
#define PYGPUKIT_NATIVE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---------------------------------------------------------------- pool -- */

typedef struct {
  uint64_t quota_bytes;
  uint64_t used_bytes;
  uint64_t peak_bytes;
  uint64_t allocations;
  uint64_t frees;
  uint64_t reuses;        /* free-list hits */
  uint64_t evictions;     /* LRU evictions to satisfy quota */
  uint64_t failures;      /* allocations rejected (over quota) */
  uint64_t free_list_bytes;
} PkPoolStats;

void*    pk_pool_create(uint64_t quota_bytes);
void     pk_pool_destroy(void* pool);
/* Allocate a logical block; returns block id (>0) or 0 if over quota.
 * host_backed != 0 additionally mallocs host staging memory. */
uint64_t pk_pool_alloc(void* pool, uint64_t size, int host_backed);
/* Release into the size-class free list (reuse) */
int      pk_pool_free(void* pool, uint64_t block_id);
/* Host pointer of a host-backed block (NULL otherwise) */
void*    pk_pool_host_ptr(void* pool, uint64_t block_id);
uint64_t pk_pool_block_size(void* pool, uint64_t block_id);
/* Mark block recently used (LRU) */
int      pk_pool_touch(void* pool, uint64_t block_id);
/* Evict up to `bytes` from free lists; returns bytes reclaimed */
uint64_t pk_pool_trim(void* pool, uint64_t bytes);
void     pk_pool_stats(void* pool, PkPoolStats* out);

/* ----------------------------------------------------------- scheduler -- */

/* QoS classes (reference: qos.rs:12) */
enum PkQosClass { PK_QOS_GUARANTEED = 0, PK_QOS_BURSTABLE = 1,
                  PK_QOS_BEST_EFFORT = 2 };

/* Task states (reference: scheduler/task.rs) */
enum PkTaskState { PK_TASK_PENDING = 0, PK_TASK_QUEUED = 1,
                   PK_TASK_RUNNING = 2, PK_TASK_COMPLETED = 3,
                   PK_TASK_FAILED = 4, PK_TASK_REJECTED = 5 };

/* Admission decisions (reference: admission.rs:10-36) */
enum PkAdmitDecision { PK_ADMIT_OK = 0, PK_ADMIT_QUEUE = 1,
                       PK_REJECT_MEMORY = 2, PK_REJECT_BANDWIDTH = 3,
                       PK_REJECT_QUEUE_FULL = 4, PK_REJECT_DEPS = 5 };

typedef struct {
  uint64_t total_memory;      /* schedulable HBM bytes */
  double   overcommit_ratio;  /* >= 1.0; burstable may overcommit */
  uint32_t max_pending;       /* queue depth bound */
  double   total_bandwidth;   /* logical bandwidth units/sec */
} PkSchedConfig;

typedef struct {
  uint64_t memory_bytes;      /* reservation */
  double   bandwidth;         /* logical share request */
  int32_t  qos;               /* PkQosClass */
  int32_t  priority;          /* higher = sooner within class */
  uint64_t partition_id;      /* 0 = none */
} PkTaskDesc;

typedef struct {
  int32_t  decision;          /* PkAdmitDecision */
  double   eta_seconds;       /* estimate when queued */
  uint64_t available_memory;
} PkAdmitResult;

typedef struct {
  uint64_t submitted;
  uint64_t completed;
  uint64_t failed;
  uint64_t rejected;
  uint64_t queued;
  uint64_t running;
  uint64_t reserved_memory;
} PkSchedStats;

void*    pk_sched_create(const PkSchedConfig* cfg);
void     pk_sched_destroy(void* s);
/* Submit: runs admission; returns task id (>0), writes admit result. */
uint64_t pk_sched_submit(void* s, const PkTaskDesc* task, PkAdmitResult* out);
/* Pop highest-priority runnable task (QoS class asc, priority desc, FIFO).
 * Returns task id or 0 when none runnable. */
uint64_t pk_sched_next(void* s);
int      pk_sched_complete(void* s, uint64_t task_id, int failed);
int      pk_sched_cancel(void* s, uint64_t task_id);
int32_t  pk_sched_task_state(void* s, uint64_t task_id);
void     pk_sched_stats(void* s, PkSchedStats* out);

/* ---------------------------------------------------------- partitions -- */

typedef struct {
  uint64_t memory_bytes;      /* quota */
  double   compute_fraction;  /* 0..1 of cores */
  double   bandwidth;         /* logical units */
  uint32_t max_streams;       /* concurrent executions */
} PkPartitionLimits;

typedef struct {
  uint64_t memory_used;
  double   bandwidth_used;
  uint32_t streams_used;
  uint64_t tasks_admitted;
  uint64_t tasks_rejected;
} PkPartitionUsage;

uint64_t pk_part_create(void* s, const PkPartitionLimits* limits);
int      pk_part_destroy(void* s, uint64_t part_id);
/* Try to acquire/release partition resources */
int      pk_part_acquire(void* s, uint64_t part_id, uint64_t mem, double bw);
int      pk_part_release(void* s, uint64_t part_id, uint64_t mem, double bw);
int      pk_part_usage(void* s, uint64_t part_id, PkPartitionUsage* out);

/* ------------------------------------------------------------ transfer -- */

typedef struct {
  uint64_t submitted;
  uint64_t completed;
  uint64_t bytes_h2d;
  uint64_t bytes_d2h;
  uint64_t queue_depth;
} PkTransferStats;

typedef void (*PkTransferCallback)(uint64_t op_id, void* user);

/* Threaded priority-queue transfer engine: staging memcpy runs on worker
 * threads; device upload happens in the callback (Python/XLA side). */
void*    pk_transfer_create(int num_workers);
void     pk_transfer_destroy(void* t);
/* Copy src -> staging buffer on a worker, then invoke cb. dir: 0=h2d 1=d2h */
uint64_t pk_transfer_submit(void* t, const void* src, void* dst, uint64_t bytes,
                            int dir, int priority, PkTransferCallback cb,
                            void* user);
int      pk_transfer_wait(void* t, uint64_t op_id);  /* block until done */
void     pk_transfer_sync(void* t);                  /* drain queue */
void     pk_transfer_stats(void* t, PkTransferStats* out);

/* ---------------------------------------------------------------- misc -- */

const char* pk_version(void);

#ifdef __cplusplus
}
#endif

#endif /* PYGPUKIT_NATIVE_H */
