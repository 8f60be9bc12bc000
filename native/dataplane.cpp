// Native data plane: multithreaded tar-shard streaming + JPEG decode + resize.
//
// TPU-native counterpart of the reference's data-loading hot path (the
// vendored webdataset tar/decode pipeline running in torch DataLoader worker
// processes, SURVEY §2.6). Host-side image decode is the one part of the
// input pipeline XLA can't absorb; this library keeps TPU feed pressure off
// the Python GIL: N worker threads stream tar members, group them into
// samples, decode JPEG via libjpeg, bilinear-resize to the training
// resolution, and push into a bounded queue that Python drains via ctypes
// (dreamllm_tpu/data/native_loader.py).
//
// Build: g++ -O3 -march=native -shared -fPIC dataplane.cpp -o libdataplane.so -ljpeg -lpthread
//
// C ABI:
//   void*  dp_create(const char** shards, int n, int threads, int image_size,
//                    int capacity, int loop);
//   int    dp_next(void* h, uint8_t* img /*S*S*3*/, char* text, int cap,
//                  int* text_len);            // 1 ok, 0 drained, -1 error
//   void   dp_destroy(void* h);
//   long   dp_decoded(void* h);  long dp_failed(void* h);

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg with longjmp error recovery)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// decode to RGB; returns empty on failure
bool decode_jpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// bilinear resize HWC uint8 RGB
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  const float sx = float(sw) / dw, sy = float(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : int(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : int(fx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float a = src[(size_t(y0) * sw + x0) * 3 + c] * (1 - wx) +
                  src[(size_t(y0) * sw + x1) * 3 + c] * wx;
        float b = src[(size_t(y1) * sw + x0) * 3 + c] * (1 - wx) +
                  src[(size_t(y1) * sw + x1) * 3 + c] * wx;
        dst[(size_t(y) * dw + x) * 3 + c] = uint8_t(a * (1 - wy) + b * wy + 0.5f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Tar streaming
// ---------------------------------------------------------------------------

struct TarMember {
  std::string name;
  std::vector<uint8_t> data;
};

// read the next member from an open tar stream; false at end/corruption
bool tar_next(FILE* f, TarMember* m) {
  uint8_t hdr[512];
  for (;;) {
    if (fread(hdr, 1, 512, f) != 512) return false;
    bool zero = true;
    for (int i = 0; i < 512; ++i)
      if (hdr[i]) { zero = false; break; }
    if (zero) return false;  // end-of-archive blocks
    char size_field[13];
    memcpy(size_field, hdr + 124, 12);
    size_field[12] = 0;
    size_t size = strtoull(size_field, nullptr, 8);
    char type = hdr[156];
    size_t padded = (size + 511) & ~size_t(511);
    if (type != '0' && type != 0) {  // skip non-regular entries
      if (fseek(f, long(padded), SEEK_CUR) != 0) return false;
      continue;
    }
    char name[101];
    memcpy(name, hdr, 100);
    name[100] = 0;
    m->name = name;
    m->data.resize(size);
    if (fread(m->data.data(), 1, size, f) != size) return false;
    if (padded > size) fseek(f, long(padded - size), SEEK_CUR);
    return true;
  }
}

// ---------------------------------------------------------------------------
// Pipeline
// ---------------------------------------------------------------------------

struct Sample {
  std::vector<uint8_t> image;  // image_size*image_size*3
  std::string text;
};

struct Pipeline {
  std::vector<std::string> shards;
  int image_size;
  size_t capacity;
  bool loop;

  std::deque<Sample> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<bool> stop{false};
  std::atomic<long> decoded{0}, failed{0};
  std::atomic<size_t> next_shard{0};
  std::atomic<int> live_workers{0};
  std::vector<std::thread> workers;

  void push(Sample&& s) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] { return queue.size() < capacity || stop; });
    if (stop) return;
    queue.push_back(std::move(s));
    cv_pop.notify_one();
  }

  void worker() {
    std::string key;
    std::vector<uint8_t> jpeg;
    std::string text;
    for (;;) {
      size_t idx = next_shard.fetch_add(1);
      if (stop) break;
      if (idx >= shards.size()) {
        if (!loop) break;
        idx = idx % shards.size();
      }
      FILE* f = fopen(shards[idx].c_str(), "rb");
      if (!f) { failed++; continue; }
      TarMember m;
      key.clear(); jpeg.clear(); text.clear();
      auto flush = [&]() {
        if (jpeg.empty()) return;
        Sample s;
        std::vector<uint8_t> rgb;
        int w = 0, h = 0;
        if (decode_jpeg(jpeg.data(), jpeg.size(), &rgb, &w, &h) && w > 0 && h > 0) {
          s.image.resize(size_t(image_size) * image_size * 3);
          resize_bilinear(rgb.data(), w, h, s.image.data(), image_size, image_size);
          s.text = text;
          decoded++;
          push(std::move(s));
        } else {
          failed++;
        }
        jpeg.clear(); text.clear();
      };
      while (!stop && tar_next(f, &m)) {
        std::string base = m.name;
        size_t slash = base.rfind('/');
        if (slash != std::string::npos) base = base.substr(slash + 1);
        size_t dot = base.find('.');
        if (dot == std::string::npos) continue;
        std::string k = base.substr(0, dot);
        std::string ext = base.substr(dot + 1);
        if (k != key) { flush(); key = k; }
        if (ext == "jpg" || ext == "jpeg") {
          jpeg = std::move(m.data);
        } else if (ext == "txt" || ext == "text" || ext == "caption") {
          text.assign(reinterpret_cast<char*>(m.data.data()), m.data.size());
        }
      }
      flush();
      fclose(f);
      if (stop) break;
    }
    if (live_workers.fetch_sub(1) == 1) {
      std::lock_guard<std::mutex> lk(mu);
      cv_pop.notify_all();  // drained
    }
  }
};

}  // namespace

extern "C" {

void* dp_create(const char** shard_paths, int n_shards, int n_threads,
                int image_size, int capacity, int loop) {
  auto* p = new Pipeline();
  for (int i = 0; i < n_shards; ++i) p->shards.emplace_back(shard_paths[i]);
  p->image_size = image_size;
  p->capacity = size_t(capacity) > 0 ? size_t(capacity) : 64;
  p->loop = loop != 0;
  int n = n_threads > 0 ? n_threads : 4;
  p->live_workers = n;
  for (int i = 0; i < n; ++i)
    p->workers.emplace_back(&Pipeline::worker, p);
  return p;
}

int dp_next(void* h, uint8_t* img_out, char* text_out, int text_cap,
            int* text_len) {
  auto* p = static_cast<Pipeline*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_pop.wait(lk, [&] {
    return !p->queue.empty() || p->live_workers.load() == 0 || p->stop;
  });
  if (p->queue.empty()) return 0;  // drained
  Sample s = std::move(p->queue.front());
  p->queue.pop_front();
  p->cv_push.notify_one();
  lk.unlock();
  memcpy(img_out, s.image.data(), s.image.size());
  int n = int(s.text.size());
  if (n > text_cap - 1) n = text_cap - 1;
  memcpy(text_out, s.text.data(), n);
  text_out[n] = 0;
  *text_len = n;
  return 1;
}

long dp_decoded(void* h) { return static_cast<Pipeline*>(h)->decoded.load(); }
long dp_failed(void* h) { return static_cast<Pipeline*>(h)->failed.load(); }

void dp_destroy(void* h) {
  auto* p = static_cast<Pipeline*>(h);
  {
    // set stop under the mutex: a worker between its cv predicate check and
    // the atomic release-and-sleep would otherwise miss the notify forever
    // and deadlock the join below
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_push.notify_all();
  p->cv_pop.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
