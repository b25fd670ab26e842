// Asynchronous buffered file writer — native equivalent of the reference's
// aofstream (include/eqvio/common/aofstream.h:26-133): writes append to an
// in-memory buffer guarded by a mutex; a single background thread flushes
// all open files every flush_interval seconds and on close, so the hot loop
// never blocks on disk I/O.
//
// Exposed as a minimal C API for Python ctypes binding (no pybind11 in this
// toolchain).  Build: make -C native  (produces libaofstream.so).

#include <chrono>
#include <condition_variable>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct FileBuffer {
    std::string path;
    std::string buffer;
    std::mutex mutex;
    bool open = true;

    explicit FileBuffer(std::string p) : path(std::move(p)) {
        // truncate on open
        std::ofstream f(path, std::ios::trunc);
    }

    void append(const char* data, size_t len) {
        std::lock_guard<std::mutex> lock(mutex);
        buffer.append(data, len);
    }

    void flush() {
        std::string pending;
        {
            std::lock_guard<std::mutex> lock(mutex);
            if (buffer.empty()) return;
            pending.swap(buffer);
        }
        std::ofstream f(path, std::ios::app);
        f.write(pending.data(), static_cast<std::streamsize>(pending.size()));
    }
};

class WriterPool {
  public:
    static WriterPool& instance() {
        static WriterPool pool;
        return pool;
    }

    void* open(const char* path) {
        std::lock_guard<std::mutex> lock(files_mutex_);
        auto fb = std::make_shared<FileBuffer>(path);
        files_[fb.get()] = fb;
        ensure_thread();
        return fb.get();
    }

    void write(void* handle, const char* data, size_t len) {
        auto fb = get(handle);
        if (fb) fb->append(data, len);
    }

    void close(void* handle) {
        std::shared_ptr<FileBuffer> fb;
        {
            std::lock_guard<std::mutex> lock(files_mutex_);
            auto it = files_.find(handle);
            if (it == files_.end()) return;
            fb = it->second;
            files_.erase(it);
        }
        fb->flush();
    }

    void flush_all() {
        std::vector<std::shared_ptr<FileBuffer>> snapshot;
        {
            std::lock_guard<std::mutex> lock(files_mutex_);
            for (auto& [_, fb] : files_) snapshot.push_back(fb);
        }
        for (auto& fb : snapshot) fb->flush();
    }

  private:
    WriterPool() = default;
    ~WriterPool() {
        {
            std::lock_guard<std::mutex> lock(thread_mutex_);
            stop_ = true;
        }
        cv_.notify_all();
        if (flusher_.joinable()) flusher_.join();
        flush_all();
    }

    void ensure_thread() {
        std::lock_guard<std::mutex> lock(thread_mutex_);
        if (!flusher_.joinable()) {
            flusher_ = std::thread([this] {
                std::unique_lock<std::mutex> lock(thread_mutex_);
                while (!stop_) {
                    cv_.wait_for(lock, std::chrono::seconds(5));
                    if (stop_) break;
                    lock.unlock();
                    flush_all();
                    lock.lock();
                }
            });
        }
    }

    std::shared_ptr<FileBuffer> get(void* handle) {
        std::lock_guard<std::mutex> lock(files_mutex_);
        auto it = files_.find(handle);
        return it == files_.end() ? nullptr : it->second;
    }

    std::unordered_map<void*, std::shared_ptr<FileBuffer>> files_;
    std::mutex files_mutex_;
    std::thread flusher_;
    std::mutex thread_mutex_;
    std::condition_variable cv_;
    bool stop_ = false;
};

}  // namespace

extern "C" {

void* aof_open(const char* path) { return WriterPool::instance().open(path); }

void aof_write(void* handle, const char* data, size_t len) {
    WriterPool::instance().write(handle, data, len);
}

void aof_close(void* handle) { WriterPool::instance().close(handle); }

void aof_flush_all() { WriterPool::instance().flush_all(); }
}
