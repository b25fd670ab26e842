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

struct Loader {
    std::vector<std::string> paths;
    size_t queue_cap;
    std::deque<std::unique_ptr<Frame>> queue;
    std::mutex mutex;
    std::condition_variable cv_push;
    std::condition_variable cv_pop;
    std::thread worker;
    std::atomic<bool> stop{false};
    bool done = false;

    Loader(std::vector<std::string> p, size_t cap)
        : paths(std::move(p)), queue_cap(cap) {
        worker = std::thread([this] { run(); });
    }

    ~Loader() {
        stop = true;
        cv_push.notify_all();
        cv_pop.notify_all();
        if (worker.joinable()) worker.join();
    }

    void run() {
        for (size_t i = 0; i < paths.size() && !stop; ++i) {
            auto frame = std::make_unique<Frame>();
            frame->index = static_cast<int>(i);
            if (!decode_png_gray(paths[i].c_str(), *frame)) {
                frame->height = frame->width = 0;  // decode failure marker
            }
            std::unique_lock<std::mutex> lock(mutex);
            cv_push.wait(lock, [this] { return queue.size() < queue_cap || stop; });
            if (stop) return;
            queue.push_back(std::move(frame));
            cv_pop.notify_one();
        }
        std::lock_guard<std::mutex> lock(mutex);
        done = true;
        cv_pop.notify_all();
    }

    // Returns index, fills out if capacity sufficient; -1 when exhausted,
    // -2 if the provided buffer is too small (frame stays queued).
    int next_u8(unsigned char* out, int capacity, int* h, int* w) {
        std::unique_lock<std::mutex> lock(mutex);
        cv_pop.wait(lock, [this] { return !queue.empty() || done || stop; });
        if (queue.empty()) return -1;
        Frame& f = *queue.front();
        *h = f.height;
        *w = f.width;
        if (f.height * f.width > capacity) return -2;
        std::memcpy(out, f.pixels.data(), f.pixels.size());
        int idx = f.index;
        queue.pop_front();
        cv_push.notify_one();
        return idx;
    }

    int next(float* out, int capacity, int* h, int* w) {
        std::unique_lock<std::mutex> lock(mutex);
        cv_pop.wait(lock, [this] { return !queue.empty() || done || stop; });
        if (queue.empty()) return -1;
        Frame& f = *queue.front();
        *h = f.height;
        *w = f.width;
        if (f.height * f.width > capacity) return -2;
        const float inv = 1.0f / 255.0f;
        for (size_t i = 0; i < f.pixels.size(); ++i) out[i] = f.pixels[i] * inv;
        int idx = f.index;
        queue.pop_front();
        cv_push.notify_one();
        return idx;
    }
};

}  // namespace

extern "C" {

void* il_create(const char** paths, int n, int queue_size) {
    std::vector<std::string> p(paths, paths + n);
    return new Loader(std::move(p), static_cast<size_t>(queue_size));
}

int il_next(void* handle, float* out, int capacity, int* h, int* w) {
    return static_cast<Loader*>(handle)->next(out, capacity, h, w);
}

int il_next_u8(void* handle, unsigned char* out, int capacity, int* h, int* w) {
    return static_cast<Loader*>(handle)->next_u8(out, capacity, h, w);
}

void il_destroy(void* handle) { delete static_cast<Loader*>(handle); }
}
