// Async cube-paging engine for DynamicFeatureMap.
//
// TPU-native runtime replacement for the reference's synchronous in-loop
// cube paging (L_SLAM/src/util/DynamicFeatureMap.h:504-677: on each sensor
// cube-crossing, update() saves out-of-window cubes and loads entering
// cubes from per-cube PCD files, blocking the mapping thread).  Here a
// thread pool performs the PCD reads/writes off the critical path: flushes
// are write-behind (the caller never waits on disk), loads are prefetched
// in parallel and fetched when needed.  File format matches
// cooper_mapper_tpu/io/pcd.py (PCD v0.7, FIELDS x y z, binary).
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   pager_create(dir, n_threads) -> handle
//   pager_flush(h, type, i, j, k, xyz, n)        async write (data copied)
//   pager_prefetch(h, type, i, j, k) -> ticket   async read
//   pager_fetch(h, ticket, out, capacity) -> n   block on ticket, copy points
//   pager_sync(h)                                 barrier: all tasks done
//   pager_destroy(h)

#ifndef _GNU_SOURCE
#define _GNU_SOURCE  // strtok_r (thread-safe; workers parse concurrently)
#endif

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Pager {
  std::string dir;
  std::vector<std::thread> workers;
  std::deque<std::function<void()>> tasks;
  std::mutex mtx;
  std::condition_variable cv_task;   // workers wait for tasks
  std::condition_variable cv_done;   // sync/fetch wait for completions
  bool stopping = false;
  int in_flight = 0;

  // read tickets: ticket -> (done, points)
  std::mutex rmtx;
  std::condition_variable rcv;
  int next_ticket = 1;
  std::map<int, std::pair<bool, std::vector<float>>> reads;

  explicit Pager(const char* d, int n_threads) : dir(d) {
    if (n_threads < 1) n_threads = 4;
    for (int t = 0; t < n_threads; ++t)
      workers.emplace_back([this] { this->run(); });
  }

  ~Pager() {
    {
      std::unique_lock<std::mutex> lk(mtx);
      stopping = true;
    }
    cv_task.notify_all();
    for (auto& w : workers) w.join();
  }

  void enqueue(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mtx);
      tasks.push_back(std::move(fn));
      ++in_flight;
    }
    cv_task.notify_one();
  }

  void run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mtx);
        cv_task.wait(lk, [this] { return stopping || !tasks.empty(); });
        if (tasks.empty()) return;  // stopping
        fn = std::move(tasks.front());
        tasks.pop_front();
      }
      fn();
      {
        std::unique_lock<std::mutex> lk(mtx);
        --in_flight;
      }
      cv_done.notify_all();
    }
  }

  void sync() {
    std::unique_lock<std::mutex> lk(mtx);
    cv_done.wait(lk, [this] { return in_flight == 0 && tasks.empty(); });
  }

  std::string cube_path(int type, int i, int j, int k) const {
    char buf[256];
    std::snprintf(buf, sizeof(buf), "%s/cube_%d_%d_%d_%d.pcd", dir.c_str(),
                  type, i, j, k);
    return std::string(buf);
  }
};

void write_pcd_xyz(const std::string& path, const std::vector<float>& pts) {
  const int n = (int)(pts.size() / 3);
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return;
  std::fprintf(f,
               "# .PCD v0.7 - Point Cloud Data file format\n"
               "VERSION 0.7\n"
               "FIELDS x y z\n"
               "SIZE 4 4 4\n"
               "TYPE F F F\n"
               "COUNT 1 1 1\n"
               "WIDTH %d\n"
               "HEIGHT 1\n"
               "VIEWPOINT 0 0 0 1 0 0 0\n"
               "POINTS %d\n"
               "DATA binary\n",
               n, n);
  std::fwrite(pts.data(), sizeof(float), pts.size(), f);
  std::fclose(f);
}

// Minimal PCD reader for the subset we write: float32 fields, binary or
// ascii; returns x/y/z triples (extra fields like intensity are skipped).
bool read_pcd_xyz(const std::string& path, std::vector<float>& out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  char line[512];
  int n_points = 0, n_fields = 3;
  int xi = 0, yi = 1, zi = 2;
  bool binary = true;
  while (std::fgets(line, sizeof(line), f)) {
    if (std::strncmp(line, "FIELDS", 6) == 0) {
      n_fields = 0;
      xi = yi = zi = -1;
      char* save = nullptr;
      strtok_r(line, " \t\n", &save);  // "FIELDS"
      for (char* tok = strtok_r(nullptr, " \t\n", &save); tok;
           tok = strtok_r(nullptr, " \t\n", &save)) {
        if (std::strcmp(tok, "x") == 0) xi = n_fields;
        if (std::strcmp(tok, "y") == 0) yi = n_fields;
        if (std::strcmp(tok, "z") == 0) zi = n_fields;
        ++n_fields;
      }
    } else if (std::strncmp(line, "POINTS", 6) == 0) {
      std::sscanf(line, "POINTS %d", &n_points);
    } else if (std::strncmp(line, "DATA", 4) == 0) {
      binary = std::strstr(line, "binary") != nullptr;
      break;
    }
  }
  if (n_points <= 0 || xi < 0 || yi < 0 || zi < 0) {
    std::fclose(f);
    return n_points == 0;  // empty cloud is fine
  }
  out.reserve((size_t)n_points * 3);
  if (binary) {
    std::vector<float> row(n_fields);
    for (int p = 0; p < n_points; ++p) {
      if (std::fread(row.data(), sizeof(float), n_fields, f) !=
          (size_t)n_fields)
        break;
      out.push_back(row[xi]);
      out.push_back(row[yi]);
      out.push_back(row[zi]);
    }
  } else {
    std::vector<double> row(n_fields);
    for (int p = 0; p < n_points; ++p) {
      for (int c = 0; c < n_fields; ++c)
        if (std::fscanf(f, "%lf", &row[c]) != 1) goto done;
      out.push_back((float)row[xi]);
      out.push_back((float)row[yi]);
      out.push_back((float)row[zi]);
    }
  done:;
  }
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

void* pager_create(const char* dir, int n_threads) {
  return new Pager(dir, n_threads);
}

void pager_destroy(void* h) { delete static_cast<Pager*>(h); }

void pager_flush(void* h, int type, int i, int j, int k, const float* xyz,
                 int n) {
  auto* p = static_cast<Pager*>(h);
  std::vector<float> pts(xyz, xyz + (size_t)n * 3);
  std::string path = p->cube_path(type, i, j, k);
  p->enqueue([path, pts = std::move(pts)] { write_pcd_xyz(path, pts); });
}

int pager_prefetch(void* h, int type, int i, int j, int k) {
  auto* p = static_cast<Pager*>(h);
  int ticket;
  {
    std::unique_lock<std::mutex> lk(p->rmtx);
    ticket = p->next_ticket++;
    p->reads.emplace(ticket, std::make_pair(false, std::vector<float>()));
  }
  std::string path = p->cube_path(type, i, j, k);
  p->enqueue([p, ticket, path] {
    std::vector<float> pts;
    read_pcd_xyz(path, pts);
    {
      std::unique_lock<std::mutex> lk(p->rmtx);
      auto& slot = p->reads[ticket];
      slot.second = std::move(pts);
      slot.first = true;
    }
    p->rcv.notify_all();
  });
  return ticket;
}

// Blocks until the ticket's read completes; copies at most `capacity` points
// into out (row-major xyz) and releases the ticket.  Returns the point count
// on disk (may exceed capacity; caller sees truncation), -1 on bad ticket.
int pager_fetch(void* h, int ticket, float* out, int capacity) {
  auto* p = static_cast<Pager*>(h);
  std::unique_lock<std::mutex> lk(p->rmtx);
  auto it = p->reads.find(ticket);
  if (it == p->reads.end()) return -1;
  p->rcv.wait(lk, [&] { return it->second.first; });
  const std::vector<float>& pts = it->second.second;
  const int n = (int)(pts.size() / 3);
  const int m = n < capacity ? n : capacity;
  if (out && m > 0) std::memcpy(out, pts.data(), (size_t)m * 3 * sizeof(float));
  p->reads.erase(it);
  return n;
}

void pager_sync(void* h) { static_cast<Pager*>(h)->sync(); }

}  // extern "C"
