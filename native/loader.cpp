// Native threaded image loader for gs_localization_tpu.
//
// Role: the host-side input pipeline for map training / localization —
// decode RGB PNG/JPEG and 16-bit depth PNGs on a worker pool and hand
// float32 arrays to Python through a completion queue, overlapping disk +
// decode with TPU steps. This replaces the reference's synchronous
// PIL/cv2-per-iteration loads (gaussian_splatting/utils/camera_utils.py:22-65),
// which stall the accelerator between steps.
//
// C API (ctypes-friendly):
//   void* gsl_create(int n_threads);
//   void  gsl_destroy(void* h);
//   int   gsl_submit(void* h, long tag, const char* path, int kind);
//         kind 0 = RGB -> float32 [0,1], HWC
//         kind 1 = 16-bit depth PNG -> float32 meters (val/1000, 65535 -> 0)
//   long  gsl_fetch(void* h, int* w, int* h_out, int* c,
//                   float* buf, long buf_capacity_floats);
//         blocks for the next completed item; returns tag, or -1 on error
//         (errno-style message via gsl_last_error), -2 if buffer too small
//         (item is NOT consumed; call again with a bigger buffer after
//         gsl_peek_size).
//   int   gsl_peek_size(void* h, int* w, int* h_out, int* c);  // next item
//   const char* gsl_last_error(void* h);

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

struct Item {
  long tag = -1;
  int w = 0, h = 0, c = 0;
  std::vector<float> data;
  std::string error;
};

struct Task {
  long tag;
  std::string path;
  int kind;
};

struct Loader {
  std::vector<std::thread> workers;
  std::deque<Task> tasks;
  std::deque<Item> done;
  std::mutex mu;
  std::condition_variable cv_task, cv_done;
  bool stop = false;
  std::string last_error;
};

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

bool decode_png(const std::string& path, int kind, Item* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { out->error = "open failed: " + path; return false; }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    out->error = "png decode failed: " + path;
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (kind == 1) {
    // 16-bit grayscale depth
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (bit_depth < 16) png_set_expand_16(png);
    // libpng gives big-endian 16-bit; swap to host little-endian
    png_set_swap(png);
    png_read_update_info(png, info);
    std::vector<uint16_t> row(w * png_get_channels(png, info));
    out->w = (int)w; out->h = (int)h; out->c = 1;
    out->data.resize((size_t)w * h);
    int ch = png_get_channels(png, info);
    for (png_uint_32 y = 0; y < h; y++) {
      png_read_row(png, (png_bytep)row.data(), nullptr);
      for (png_uint_32 x = 0; x < w; x++) {
        uint16_t v = row[x * ch];
        float d = (v == 65535) ? 0.0f : (float)v / 1000.0f;
        out->data[(size_t)y * w + x] = d;
      }
    }
  } else {
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    out->w = (int)w; out->h = (int)h; out->c = 3;
    out->data.resize((size_t)w * h * 3);
    std::vector<uint8_t> row((size_t)w * 3);
    const float inv = 1.0f / 255.0f;
    for (png_uint_32 y = 0; y < h; y++) {
      png_read_row(png, row.data(), nullptr);
      float* dst = out->data.data() + (size_t)y * w * 3;
      for (size_t i = 0; i < (size_t)w * 3; i++) dst[i] = row[i] * inv;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = (JpegErr*)cinfo->err;
  longjmp(e->jb, 1);
}

bool decode_jpeg(const std::string& path, Item* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { out->error = "open failed: " + path; return false; }
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    out->error = "jpeg decode failed: " + path;
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  out->w = w; out->h = h; out->c = 3;
  out->data.resize((size_t)w * h * 3);
  std::vector<uint8_t> row((size_t)w * 3);
  const float inv = 1.0f / 255.0f;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out->data.data() + (size_t)(cinfo.output_scanline - 1) * w * 3;
    for (size_t i = 0; i < (size_t)w * 3; i++) dst[i] = row[i] * inv;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

void worker(Loader* L) {
  for (;;) {
    Task t;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_task.wait(lk, [&] { return L->stop || !L->tasks.empty(); });
      if (L->stop && L->tasks.empty()) return;
      t = L->tasks.front();
      L->tasks.pop_front();
    }
    Item it;
    it.tag = t.tag;
    bool ok;
    if (t.kind == 1 || has_suffix(t.path, ".png")) {
      ok = decode_png(t.path, t.kind, &it);
    } else if (has_suffix(t.path, ".jpg") || has_suffix(t.path, ".jpeg")) {
      ok = decode_jpeg(t.path, &it);
    } else {
      // try png then jpeg
      ok = decode_png(t.path, t.kind, &it);
      if (!ok) ok = decode_jpeg(t.path, &it);
    }
    if (!ok && it.error.empty()) it.error = "decode failed: " + t.path;
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->done.push_back(std::move(it));
    }
    L->cv_done.notify_one();
  }
}

}  // namespace

extern "C" {

void* gsl_create(int n_threads) {
  Loader* L = new Loader();
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; i++) L->workers.emplace_back(worker, L);
  return L;
}

void gsl_destroy(void* h) {
  Loader* L = (Loader*)h;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_task.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

int gsl_submit(void* h, long tag, const char* path, int kind) {
  Loader* L = (Loader*)h;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->tasks.push_back(Task{tag, path, kind});
  }
  L->cv_task.notify_one();
  return 0;
}

int gsl_peek_size(void* h, int* w, int* hh, int* c) {
  Loader* L = (Loader*)h;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_done.wait(lk, [&] { return !L->done.empty(); });
  Item& it = L->done.front();
  *w = it.w; *hh = it.h; *c = it.c;
  return it.error.empty() ? 0 : -1;
}

long gsl_fetch(void* h, int* w, int* hh, int* c, float* buf,
               long buf_capacity_floats) {
  Loader* L = (Loader*)h;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_done.wait(lk, [&] { return !L->done.empty(); });
  Item& it = L->done.front();
  if (!it.error.empty()) {
    L->last_error = it.error;
    long tag = it.tag;
    L->done.pop_front();
    (void)tag;
    return -1;
  }
  long need = (long)it.w * it.h * it.c;
  if (need > buf_capacity_floats) return -2;  // not consumed
  *w = it.w; *hh = it.h; *c = it.c;
  memcpy(buf, it.data.data(), (size_t)need * sizeof(float));
  long tag = it.tag;
  L->done.pop_front();
  return tag;
}

const char* gsl_last_error(void* h) {
  Loader* L = (Loader*)h;
  return L->last_error.c_str();
}

}  // extern "C"
