// Native data-loader runtime for guassianhand_tpu.
//
// The reference feeds its GPU from torch DataLoader worker *processes* doing
// python-side imageio decode + masking per sample (dataset_one_shot.py:509-591).
// This is the TPU framework's native equivalent: a C++ thread-pool that
// decodes JPEG/PNG (system libjpeg/libpng), applies the mask threshold
// (>= 100) and background zeroing in one fused pass, and hands float32
// host buffers to JAX for a single H2D transfer. Exposed via a plain C ABI
// (ctypes binding in guassianhand_tpu/data/native_loader.py).
//
// Build: make -C native (produces libgh_loader.so).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <csetjmp>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // interleaved
};

// ----------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------------ PNG
bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->h = png_get_image_height(png, info);
  out->w = png_get_image_width(png, info);
  out->c = png_get_channels(png, info);
  out->data.resize(size_t(out->h) * out->w * out->c);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * out->c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// --------------------------------------------------------- fused sample
struct Sample {
  int h = 0, w = 0;
  std::vector<float> rgb;     // (h, w, 3) in [0,1], background zeroed
  std::vector<float> mask;    // (h, w) in {0,1}
  bool ok = false;
};

bool load_sample(const std::string& img_path, const std::string& mask_path,
                 Sample* s) {
  Image img, mask;
  if (!decode_any(img_path.c_str(), &img)) return false;
  bool have_mask = !mask_path.empty() && decode_any(mask_path.c_str(), &mask);
  s->h = img.h;
  s->w = img.w;
  s->rgb.resize(size_t(img.h) * img.w * 3);
  s->mask.assign(size_t(img.h) * img.w, 1.0f);
  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < img.h; ++y) {
    for (int x = 0; x < img.w; ++x) {
      size_t pi = size_t(y) * img.w + x;
      float m = 1.0f;
      if (have_mask && y < mask.h && x < mask.w) {
        // reference threshold: >= 100 is foreground
        // (dataset_one_shot.py:519,535)
        const uint8_t* mp = mask.data.data() + (size_t(y) * mask.w + x) * mask.c;
        int v = mp[0];
        if (mask.c >= 3) v = (mp[0] + mp[1] + mp[2]) / 3;
        m = v >= 100 ? 1.0f : 0.0f;
      }
      s->mask[pi] = m;
      const uint8_t* px = img.data.data() + pi * img.c;
      for (int ch = 0; ch < 3; ++ch)
        s->rgb[pi * 3 + ch] = m * px[ch % img.c] * inv;
    }
  }
  s->ok = true;
  return true;
}

// ----------------------------------------------------------- thread pool
struct Job {
  int ticket;
  std::string img, mask;
};

struct Pool {
  std::vector<std::thread> threads;
  std::queue<Job> jobs;
  std::map<int, Sample> done;
  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      threads.emplace_back([this] { worker(); });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_job.notify_all();
    for (auto& t : threads) t.join();
  }

  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [this] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = jobs.front();
        jobs.pop();
      }
      Sample s;
      load_sample(job.img, job.mask, &s);
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.ticket] = std::move(s);
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int gh_decode_image(const char* path, float* out, int cap_h, int cap_w,
                    int* h, int* w) {
  Image img;
  if (!decode_any(path, &img)) return -1;
  if (img.h > cap_h || img.w > cap_w) return -2;
  *h = img.h;
  *w = img.w;
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0; i < size_t(img.h) * img.w; ++i)
    for (int ch = 0; ch < 3; ++ch)
      out[i * 3 + ch] = img.data[i * img.c + ch % img.c] * inv;
  return 0;
}

void* gh_pool_create(int n_threads) { return new Pool(n_threads); }

void gh_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

int gh_pool_submit(void* pool, int ticket, const char* img_path,
                   const char* mask_path) {
  Pool* p = static_cast<Pool*>(pool);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.push({ticket, img_path, mask_path ? mask_path : ""});
  }
  p->cv_job.notify_one();
  return 0;
}

// Blocks until the ticket's sample is decoded; copies into caller buffers.
int gh_pool_wait(void* pool, int ticket, float* rgb_out, float* mask_out,
                 int cap_h, int cap_w, int* h, int* w) {
  Pool* p = static_cast<Pool*>(pool);
  Sample s;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_done.wait(lk, [&] { return p->done.count(ticket) > 0; });
    s = std::move(p->done[ticket]);
    p->done.erase(ticket);
  }
  if (!s.ok) return -1;
  if (s.h > cap_h || s.w > cap_w) return -2;
  *h = s.h;
  *w = s.w;
  memcpy(rgb_out, s.rgb.data(), s.rgb.size() * sizeof(float));
  memcpy(mask_out, s.mask.data(), s.mask.size() * sizeof(float));
  return 0;
}

}  // extern "C"
