// Shared-memory broadcast ring buffer.
//
// Native counterpart of the reference's lock-free MessageQueue
// (vllm/distributed/device_communicators/shm_broadcast.py:204-917 backed by
// csrc/cpu/shm.cpp): one writer broadcasts serialized messages to N readers
// on the same host over POSIX shared memory — the scheduler→worker fan-out
// path for multi-process data-parallel engines.
//
// Layout: [Header][n_chunks * (uint32 len + chunk_size bytes)]
// Single producer, per-reader consume cursors; the writer blocks (spin +
// yield) only when the slowest reader is a full ring behind.
//
// Build: g++ -O2 -shared -fPIC -o libshm_ring.so shm_ring.cpp -lrt
// Exposed via ctypes (lvllm_tpu/distributed/shm_ring.py).

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sched.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <time.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMaxReaders = 64;
constexpr uint64_t kMagic = 0x4C564C4C4D534852ULL;  // "LVLLMSHR"

struct Header {
  uint64_t magic;
  uint64_t chunk_size;   // payload bytes per chunk
  uint64_t n_chunks;
  uint32_t n_readers;
  std::atomic<uint64_t> head;                      // chunks written
  std::atomic<uint64_t> reader_tails[kMaxReaders]; // chunks consumed
};

struct Ring {
  Header* hdr;
  uint8_t* data;       // chunk region
  size_t map_size;
  int is_owner;
  char name[256];
};

inline uint64_t slot_bytes(const Header* h) {
  return sizeof(uint32_t) + h->chunk_size;
}

inline uint8_t* chunk_at(Ring* r, uint64_t idx) {
  return r->data + (idx % r->hdr->n_chunks) * slot_bytes(r->hdr);
}

void relax_wait(int spins) {
  if (spins < 1024) {
    // busy spin
  } else if (spins < 4096) {
    sched_yield();
  } else {
    struct timespec ts = {0, 100000};  // 100us
    nanosleep(&ts, nullptr);
  }
}

}  // namespace

extern "C" {

// Create a ring as the writer. Returns handle or nullptr.
void* shm_ring_create(const char* name, uint64_t chunk_size,
                      uint64_t n_chunks, uint32_t n_readers) {
  if (n_readers > kMaxReaders) return nullptr;
  size_t sz = sizeof(Header) + n_chunks * (sizeof(uint32_t) + chunk_size);
  shm_unlink(name);  // stale cleanup
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  if (ftruncate(fd, (off_t)sz) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* mem = mmap(nullptr, sz, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) {
    shm_unlink(name);
    return nullptr;
  }
  Ring* r = new Ring();
  r->hdr = reinterpret_cast<Header*>(mem);
  r->data = reinterpret_cast<uint8_t*>(mem) + sizeof(Header);
  r->map_size = sz;
  r->is_owner = 1;
  strncpy(r->name, name, sizeof(r->name) - 1);
  r->hdr->chunk_size = chunk_size;
  r->hdr->n_chunks = n_chunks;
  r->hdr->n_readers = n_readers;
  r->hdr->head.store(0, std::memory_order_relaxed);
  for (uint32_t i = 0; i < kMaxReaders; ++i)
    r->hdr->reader_tails[i].store(0, std::memory_order_relaxed);
  std::atomic_thread_fence(std::memory_order_release);
  r->hdr->magic = kMagic;
  return r;
}

// Open an existing ring as a reader.
void* shm_ring_open(const char* name) {
  int fd = -1;
  for (int spins = 0; spins < 1 << 20; ++spins) {
    fd = shm_open(name, O_RDWR, 0600);
    if (fd >= 0) break;
    relax_wait(spins);
  }
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(Header)) {
    close(fd);
    return nullptr;
  }
  void* mem =
      mmap(nullptr, st.st_size, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return nullptr;
  Ring* r = new Ring();
  r->hdr = reinterpret_cast<Header*>(mem);
  r->data = reinterpret_cast<uint8_t*>(mem) + sizeof(Header);
  r->map_size = st.st_size;
  r->is_owner = 0;
  strncpy(r->name, name, sizeof(r->name) - 1);
  // Wait for writer init.
  for (int spins = 0; r->hdr->magic != kMagic; ++spins) relax_wait(spins);
  return r;
}

uint64_t shm_ring_chunk_size(void* handle) {
  return reinterpret_cast<Ring*>(handle)->hdr->chunk_size;
}

// Broadcast one message (len <= chunk_size). Blocks while ring is full.
// timeout_us < 0: wait forever. Returns 0 ok, -1 len too big, -2 timeout.
int shm_ring_write(void* handle, const uint8_t* buf, uint32_t len,
                   int64_t timeout_us) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  Header* h = r->hdr;
  if (len > h->chunk_size) return -1;
  uint64_t head = h->head.load(std::memory_order_relaxed);
  // Wait until the slowest reader leaves room.
  int spins = 0;
  int64_t waited = 0;
  for (;;) {
    uint64_t min_tail = UINT64_MAX;
    for (uint32_t i = 0; i < h->n_readers; ++i) {
      uint64_t t = h->reader_tails[i].load(std::memory_order_acquire);
      if (t < min_tail) min_tail = t;
    }
    if (h->n_readers == 0 || head - min_tail < h->n_chunks) break;
    relax_wait(spins++);
    if (timeout_us >= 0 && spins > 4096) {
      waited += 100;
      if (waited > timeout_us) return -2;
    }
  }
  uint8_t* slot = chunk_at(r, head);
  memcpy(slot + sizeof(uint32_t), buf, len);
  *reinterpret_cast<uint32_t*>(slot) = len;
  h->head.store(head + 1, std::memory_order_release);
  return 0;
}

// Read the next message for reader `reader_id` into buf (cap bytes).
// Returns payload length, -2 on timeout, -3 if buf too small.
int64_t shm_ring_read(void* handle, uint32_t reader_id, uint8_t* buf,
                      uint64_t cap, int64_t timeout_us) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  Header* h = r->hdr;
  uint64_t tail = h->reader_tails[reader_id].load(std::memory_order_relaxed);
  int spins = 0;
  int64_t waited = 0;
  while (h->head.load(std::memory_order_acquire) == tail) {
    relax_wait(spins++);
    if (timeout_us >= 0 && spins > 4096) {
      waited += 100;
      if (waited > timeout_us) return -2;
    }
  }
  uint8_t* slot = chunk_at(r, tail);
  uint32_t len = *reinterpret_cast<uint32_t*>(slot);
  if (len > cap) return -3;
  memcpy(buf, slot + sizeof(uint32_t), len);
  h->reader_tails[reader_id].store(tail + 1, std::memory_order_release);
  return (int64_t)len;
}

// Number of messages pending for a reader.
uint64_t shm_ring_pending(void* handle, uint32_t reader_id) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  return r->hdr->head.load(std::memory_order_acquire) -
         r->hdr->reader_tails[reader_id].load(std::memory_order_relaxed);
}

void shm_ring_close(void* handle) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  munmap(r->hdr, r->map_size);
  if (r->is_owner) shm_unlink(r->name);
  delete r;
}

}  // extern "C"
