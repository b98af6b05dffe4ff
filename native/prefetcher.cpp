// Threaded file prefetcher: overlaps host I/O with TPU compute.
//
// The reference's data layer leans on decord/C++ for decode throughput
// (SURVEY §2.10); on TPU hosts the eval pipelines stream per-video feature
// files (.npy/.pt) or raw media, and the accelerator stalls whenever the host
// reads lag. This component reads ahead over an ordered list of files with a
// worker pool into a bounded in-memory window, exposed to Python via ctypes
// (infinite_video_tpu/data/native_prefetch.py).
//
// Semantics:
//   create(paths, n, window, workers) -> handle
//   get(handle, i, &ptr, &len)        : blocks until file i is resident;
//                                       pointer valid until release(i)
//   release(handle, i)                : frees slot, lets the window advance
//   destroy(handle)
//
// Workers fetch files in index order, at most `window` unreleased items ahead
// of the consumer. Missing/unreadable files yield len == 0 (the Python side
// raises); the pool never deadlocks on errors.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Item {
  std::vector<uint8_t> data;
  std::atomic<int> state{0};  // 0=pending 1=loading 2=ready 3=released
};

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Item> items;
  size_t window;
  std::atomic<size_t> next_fetch{0};
  std::atomic<size_t> consumer_pos{0};
  std::atomic<bool> stop{false};
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::vector<std::thread> workers;

  void worker() {
    while (!stop.load()) {
      size_t i = next_fetch.fetch_add(1);
      if (i >= paths.size()) return;
      {
        // Respect the read-ahead window relative to the consumer.
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || i < consumer_pos.load() + window;
        });
        if (stop.load()) return;
        items[i].state.store(1);
      }
      std::vector<uint8_t> buf;
      FILE* f = std::fopen(paths[i].c_str(), "rb");
      if (f) {
        std::fseek(f, 0, SEEK_END);
        long sz = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        if (sz > 0) {
          buf.resize(static_cast<size_t>(sz));
          size_t rd = std::fread(buf.data(), 1, buf.size(), f);
          buf.resize(rd);
        }
        std::fclose(f);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        items[i].data = std::move(buf);
        items[i].state.store(2);
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* prefetcher_create(const char** paths, int64_t n, int64_t window,
                        int64_t workers) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n);
  p->items = std::vector<Item>(n);
  p->window = static_cast<size_t>(window > 0 ? window : 4);
  int64_t w = workers > 0 ? workers : 2;
  for (int64_t i = 0; i < w; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

int prefetcher_get(void* handle, int64_t i, const uint8_t** ptr, int64_t* len) {
  auto* p = static_cast<Prefetcher*>(handle);
  if (i < 0 || static_cast<size_t>(i) >= p->items.size()) return -1;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    // Advance the consumer frontier so workers may read ahead of i.
    size_t pos = p->consumer_pos.load();
    if (static_cast<size_t>(i) > pos) p->consumer_pos.store(i);
    p->cv_space.notify_all();
    p->cv_ready.wait(lk, [&] {
      return p->stop.load() || p->items[i].state.load() >= 2;
    });
    if (p->stop.load()) return -2;
  }
  *ptr = p->items[i].data.data();
  *len = static_cast<int64_t>(p->items[i].data.size());
  return 0;
}

void prefetcher_release(void* handle, int64_t i) {
  auto* p = static_cast<Prefetcher*>(handle);
  if (i < 0 || static_cast<size_t>(i) >= p->items.size()) return;
  std::lock_guard<std::mutex> lk(p->mu);
  p->items[i].data.clear();
  p->items[i].data.shrink_to_fit();
  p->items[i].state.store(3);
  size_t pos = p->consumer_pos.load();
  if (static_cast<size_t>(i) + 1 > pos) p->consumer_pos.store(i + 1);
  p->cv_space.notify_all();
}

void prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop.store(true);
  }
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
