// Native prefetching image loader — the C++ data-loader role of the
// reference's ThreadedDataServer (src/dataserver/ThreadedDataServer.cpp:20-116):
// a worker thread decodes PNG frames ahead of the consumer into a bounded
// queue of grayscale float32 buffers, so the pipeline never blocks on
// disk + decode.
//
// C API for ctypes (no pybind11 in this toolchain). Build: make -C native.

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
    int index = -1;
    int height = 0;
    int width = 0;
    std::vector<unsigned char> pixels;  // grayscale [h*w], 0..255
};

bool decode_png_gray(const char* path, Frame& out) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return false;
    png_byte header[8];
    if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
        std::fclose(fp);
        return false;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return false;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);

    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
        color == PNG_COLOR_TYPE_PALETTE) {
        png_set_rgb_to_gray_fixed(png, 1, -1, -1);  // BT.709 luma
    }
    png_read_update_info(png, info);

    std::vector<png_byte> row(png_get_rowbytes(png, info));
    out.height = static_cast<int>(h);
    out.width = static_cast<int>(w);
    out.pixels.resize(static_cast<size_t>(w) * h);
    for (png_uint_32 y = 0; y < h; ++y) {
        png_read_row(png, row.data(), nullptr);
        std::memcpy(out.pixels.data() + static_cast<size_t>(y) * w, row.data(), w);
    }
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return true;
}

// Decode POOL with in-order delivery: N workers claim path indices from a
// shared cursor, decode concurrently, and insert into a reorder buffer the
// consumer drains strictly in order.  Outstanding frames are bounded by
// queue_cap so memory stays flat.  On the 2-vCPU hosts the extra workers
// overlap PNG decode with the python thread's device-RPC waits (GIL
// released), which is where the fused pipeline loses wall time.
struct Loader {
    std::vector<std::string> paths;
    size_t queue_cap;
    std::deque<std::unique_ptr<Frame>> ready;  // reorder buffer (sparse, by index)
    size_t next_claim = 0;   // next path index a worker will take
    size_t next_out = 0;     // next index the consumer needs
    std::mutex mutex;
    std::condition_variable cv_push;
    std::condition_variable cv_pop;
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};
    int active = 0;

    Loader(std::vector<std::string> p, size_t cap, int nworkers)
        : paths(std::move(p)), queue_cap(cap < 2 ? 2 : cap) {
        ready.resize(paths.size());
        if (nworkers < 1) nworkers = 1;
        active = nworkers;
        for (int k = 0; k < nworkers; ++k) {
            workers.emplace_back([this] { run(); });
        }
    }

    ~Loader() {
        stop = true;
        cv_push.notify_all();
        cv_pop.notify_all();
        for (auto& w : workers)
            if (w.joinable()) w.join();
    }

    void run() {
        for (;;) {
            size_t i;
            {
                std::unique_lock<std::mutex> lock(mutex);
                cv_push.wait(lock, [this] {
                    return stop || next_claim >= paths.size() ||
                           next_claim < next_out + queue_cap;
                });
                if (stop || next_claim >= paths.size()) break;
                i = next_claim++;
            }
            auto frame = std::make_unique<Frame>();
            frame->index = static_cast<int>(i);
            if (!decode_png_gray(paths[i].c_str(), *frame)) {
                frame->height = frame->width = 0;  // decode failure marker
            }
            std::lock_guard<std::mutex> lock(mutex);
            ready[i] = std::move(frame);
            cv_pop.notify_all();
        }
        std::lock_guard<std::mutex> lock(mutex);
        if (--active == 0) cv_pop.notify_all();
    }

    template <typename CopyFn>
    int next_impl(int capacity, int* h, int* w, CopyFn copy) {
        std::unique_lock<std::mutex> lock(mutex);
        // every claimed index is eventually produced (workers only exit after
        // inserting), so waiting on ready[next_out] cannot deadlock
        cv_pop.wait(lock, [this] {
            return stop || next_out >= paths.size() || ready[next_out] != nullptr;
        });
        if (next_out >= paths.size() || !ready[next_out]) return -1;
        Frame& f = *ready[next_out];
        *h = f.height;
        *w = f.width;
        if (f.height * f.width > capacity) return -2;
        copy(f);
        int idx = f.index;
        ready[next_out].reset();
        ++next_out;
        cv_push.notify_all();
        return idx;
    }

    // Returns index, fills out if capacity sufficient; -1 when exhausted,
    // -2 if the provided buffer is too small (frame stays queued).
    int next_u8(unsigned char* out, int capacity, int* h, int* w) {
        return next_impl(capacity, h, w, [&](Frame& f) {
            std::memcpy(out, f.pixels.data(), f.pixels.size());
        });
    }

    int next(float* out, int capacity, int* h, int* w) {
        return next_impl(capacity, h, w, [&](Frame& f) {
            const float inv = 1.0f / 255.0f;
            for (size_t i = 0; i < f.pixels.size(); ++i) out[i] = f.pixels[i] * inv;
        });
    }
};

}  // namespace

extern "C" {

void* il_create(const char** paths, int n, int queue_size) {
    std::vector<std::string> p(paths, paths + n);
    return new Loader(std::move(p), static_cast<size_t>(queue_size), 2);
}

void* il_create2(const char** paths, int n, int queue_size, int workers) {
    std::vector<std::string> p(paths, paths + n);
    return new Loader(std::move(p), static_cast<size_t>(queue_size), workers);
}

int il_next(void* handle, float* out, int capacity, int* h, int* w) {
    return static_cast<Loader*>(handle)->next(out, capacity, h, w);
}

int il_next_u8(void* handle, unsigned char* out, int capacity, int* h, int* w) {
    return static_cast<Loader*>(handle)->next_u8(out, capacity, h, w);
}

void il_destroy(void* handle) { delete static_cast<Loader*>(handle); }
}
