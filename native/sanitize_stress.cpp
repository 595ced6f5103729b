// Sanitizer stress driver for the native components (race detection /
// memory-safety harness — the "sanitizers" auxiliary subsystem; the
// reference has none, SURVEY.md §5).
//
// Compiled together with batch_loader.cpp, jpeg_pipeline.cpp and
// lmdb_reader.cpp under -fsanitize=thread and -fsanitize=address by
// tests/test_sanitizers.py; any data race / heap error fails the run via
// the sanitizer exit code. Fully instrumented C++ (no Python in the loop)
// so TSAN sees every synchronization edge.
//
// Usage: sanitize_stress loader | jpeg | lmdb <env_path>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
// batch_loader.cpp
void* damc_loader_create(const uint8_t* images, int64_t n, int64_t h,
                         int64_t w, int64_t c, int batch_size, int shuffle,
                         int flip, int drop_last, uint64_t seed, int threads,
                         int prefetch_depth);
int damc_loader_next(void* handle, float* out, int64_t* out_indices);
void damc_loader_destroy(void* handle);
// jpeg_pipeline.cpp
int damc_jpeg_decode_batch(const uint8_t* const* bufs, const size_t* lens,
                           int n, int out_size, uint8_t* out,
                           uint8_t* ok_flags, int n_threads);
// lmdb_reader.cpp
void* damc_lmdb_open(const char* path, char* err, size_t errlen);
uint64_t damc_lmdb_entries(void* env);
int damc_lmdb_get(void* env, const uint8_t* key, size_t klen,
                  const uint8_t** val, uint64_t* vlen);
int64_t damc_lmdb_keys_size(void* env);
int64_t damc_lmdb_keys_fill(void* env, uint8_t* blob, uint32_t* lens);
void damc_lmdb_close(void* env);
}

#include <jpeglib.h>

namespace {

int stress_loader() {
  const int64_t n = 96, h = 16, w = 16, c = 3;
  const int bs = 16;
  std::vector<uint8_t> imgs(n * h * w * c);
  for (size_t i = 0; i < imgs.size(); ++i) imgs[i] = (uint8_t)(i * 31u);

  // Steady-state consumption across epochs with a deep prefetch ring.
  void* L = damc_loader_create(imgs.data(), n, h, w, c, bs, 1, 1, 1, 7, 4, 4);
  if (!L) return 2;
  std::vector<float> out(bs * h * w * c);
  std::vector<int64_t> idx(bs);
  for (int i = 0; i < 64; ++i) {
    if (!damc_loader_next(L, out.data(), idx.data())) return 3;
  }
  damc_loader_destroy(L);

  // Create/destroy churn: tear down while workers are mid-prefetch.
  for (int round = 0; round < 24; ++round) {
    void* s = damc_loader_create(imgs.data(), n, h, w, c, bs, 1, 1, 1,
                                 (uint64_t)round, 4, 4);
    if (!s) return 4;
    if (round % 3 != 0 && !damc_loader_next(s, out.data(), idx.data())) return 5;
    damc_loader_destroy(s);
  }
  std::puts("loader stress ok");
  return 0;
}

std::vector<uint8_t> make_jpeg(int h, int w, unsigned seed) {
  std::vector<uint8_t> rgb(h * w * 3);
  for (size_t i = 0; i < rgb.size(); ++i) rgb[i] = (uint8_t)((i * 131u + seed) & 0xFF);
  jpeg_compress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  unsigned char* buf = nullptr;
  unsigned long buflen = 0;
  jpeg_mem_dest(&cinfo, &buf, &buflen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, 85, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = rgb.data() + cinfo.next_scanline * w * 3;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  std::vector<uint8_t> out(buf, buf + buflen);
  jpeg_destroy_compress(&cinfo);
  free(buf);
  return out;
}

int stress_jpeg() {
  const int n = 24, size = 32;
  std::vector<std::vector<uint8_t>> jpegs;
  for (int i = 0; i < n; ++i) jpegs.push_back(make_jpeg(48 + (i % 3) * 16, 64, i));
  jpegs[5] = {0xFF, 0xD8, 0x00, 0x01};  // corrupt item (non-strict path)

  std::vector<const uint8_t*> bufs(n);
  std::vector<size_t> lens(n);
  for (int i = 0; i < n; ++i) {
    bufs[i] = jpegs[i].data();
    lens[i] = jpegs[i].size();
  }
  std::vector<uint8_t> out(n * size * size * 3);
  std::vector<uint8_t> ok(n);
  for (int round = 0; round < 16; ++round) {
    int good = damc_jpeg_decode_batch(bufs.data(), lens.data(), n, size,
                                      out.data(), ok.data(), 4);
    if (good != n - 1 || ok[5] != 0 || ok[0] != 1) return 2;
  }
  std::puts("jpeg stress ok");
  return 0;
}

int stress_lmdb(const char* path) {
  char err[512] = {0};
  void* env = damc_lmdb_open(path, err, sizeof(err));
  if (!env) {
    std::fprintf(stderr, "open failed: %s\n", err);
    return 2;
  }
  uint64_t entries = damc_lmdb_entries(env);
  if (entries == 0) return 3;

  // 4 threads race the lazily-built key-scan cache AND point reads.
  std::vector<std::thread> ts;
  std::vector<int> rcs(4, 0);
  for (int t = 0; t < 4; ++t) {
    ts.emplace_back([env, entries, t, &rcs] {
      int64_t total = damc_lmdb_keys_size(env);
      if (total < 0) {
        rcs[t] = 4;
        return;
      }
      std::vector<uint8_t> blob(total ? total : 1);
      std::vector<uint32_t> lens(entries);
      int64_t cnt = damc_lmdb_keys_fill(env, blob.data(), lens.data());
      if (cnt != (int64_t)entries) {
        rcs[t] = 5;
        return;
      }
      size_t off = 0;
      std::vector<std::pair<size_t, uint32_t>> keys;
      for (int64_t i = 0; i < cnt; ++i) {
        keys.push_back({off, lens[i]});
        off += lens[i];
      }
      for (int round = 0; round < 50; ++round) {
        auto& k = keys[(round * 7 + t * 13) % keys.size()];
        const uint8_t* val = nullptr;
        uint64_t vlen = 0;
        int rc = damc_lmdb_get(env, blob.data() + k.first, k.second, &val, &vlen);
        if (rc != 1 || !val) {
          rcs[t] = 6;
          return;
        }
        volatile uint8_t sink = 0;  // touch the value bytes
        for (uint64_t j = 0; j < vlen; j += 97) sink ^= val[j];
        (void)sink;
        uint8_t missing_key[4] = {0xFF, 0xFF, 0xFF, 0xFF};
        if (damc_lmdb_get(env, missing_key, 4, &val, &vlen) != 0) {
          rcs[t] = 7;
          return;
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  damc_lmdb_close(env);
  for (int rc : rcs)
    if (rc) return rc;
  std::puts("lmdb stress ok");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s loader|jpeg|lmdb [env_path]\n", argv[0]);
    return 64;
  }
  std::string mode = argv[1];
  if (mode == "loader") return stress_loader();
  if (mode == "jpeg") return stress_jpeg();
  if (mode == "lmdb" && argc >= 3) return stress_lmdb(argv[2]);
  std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 64;
}
