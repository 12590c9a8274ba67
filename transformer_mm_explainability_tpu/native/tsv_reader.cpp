// Fast base64-TSV object-feature reader (C++).
//
// Native data-loader for the bottom-up-attention interchange format
// consumed by the LXMERT pipeline (lxmert/src/utils.py load_obj_tsv):
// tab-separated rows of
//   img_id  img_h  img_w  objects_id  objects_conf  attrs_id
//   attrs_conf  num_boxes  boxes(b64 f32[n,4])  features(b64 f32[n,D])
//
// The python csv + base64 path spends most of its time in row splitting
// and temporary buffers; this parser streams the file once and decodes
// base64 straight into caller-provided float buffers. Exposed as a
// plain C ABI for ctypes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

namespace {

int8_t kB64Inv[256];

struct InitB64 {
  InitB64() {
    std::memset(kB64Inv, -1, sizeof(kB64Inv));
    const char* alphabet =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    for (int i = 0; i < 64; ++i) kB64Inv[(uint8_t)alphabet[i]] = i;
  }
} kInit;

// decode base64 `in[0..len)` into `out`, returns bytes written (-1 on error)
int64_t b64_decode(const char* in, int64_t len, uint8_t* out,
                   int64_t out_cap) {
  while (len > 0 && (in[len - 1] == '=' || in[len - 1] == '\n' ||
                     in[len - 1] == '\r'))
    --len;
  int64_t w = 0;
  int acc = 0, bits = 0;
  for (int64_t i = 0; i < len; ++i) {
    const int8_t v = kB64Inv[(uint8_t)in[i]];
    if (v < 0) return -1;
    acc = (acc << 6) | v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      if (w >= out_cap) return -1;
      out[w++] = (uint8_t)((acc >> bits) & 0xFF);
    }
  }
  return w;
}

struct Record {
  std::string img_id;
  int img_h = 0, img_w = 0, num_boxes = 0;
  std::vector<float> boxes;     // [n, 4]
  std::vector<float> features;  // [n, D]
  std::vector<int64_t> objects_id;
  std::vector<float> objects_conf;
};

struct Store {
  std::vector<Record> records;
  int feat_dim = 0;
};

std::vector<Store*> g_stores;

}  // namespace

extern "C" {

// Parse the file; returns a handle (>= 0) or -1 on failure.
// topk < 0 → everything.
int64_t tsv_open(const char* path, int64_t topk) {
  std::ifstream f(path);
  if (!f.is_open()) return -1;
  auto store = std::make_unique<Store>();
  std::string line;
  std::vector<uint8_t> scratch;
  while (std::getline(f, line)) {
    if (topk >= 0 && (int64_t)store->records.size() >= topk) break;
    // split into 10 tab fields (string views into `line`)
    const char* fields[10];
    int64_t lens[10];
    int nf = 0;
    const char* p = line.c_str();
    const char* end = p + line.size();
    while (nf < 10) {
      const char* tab = (const char*)memchr(p, '\t', end - p);
      fields[nf] = p;
      lens[nf] = (tab ? tab : end) - p;
      ++nf;
      if (!tab) break;
      p = tab + 1;
    }
    if (nf < 10) continue;  // malformed row

    Record rec;
    rec.img_id.assign(fields[0], lens[0]);
    rec.img_h = atoi(std::string(fields[1], lens[1]).c_str());
    rec.img_w = atoi(std::string(fields[2], lens[2]).c_str());
    rec.num_boxes = atoi(std::string(fields[7], lens[7]).c_str());
    const int n = rec.num_boxes;

    auto decode_floats = [&](int fi, std::vector<float>* out) -> bool {
      scratch.resize((lens[fi] / 4 + 1) * 3);
      int64_t nb = b64_decode(fields[fi], lens[fi], scratch.data(),
                              (int64_t)scratch.size());
      if (nb < 0) return false;
      out->resize(nb / sizeof(float));
      std::memcpy(out->data(), scratch.data(), nb);
      return true;
    };
    auto decode_i64 = [&](int fi, std::vector<int64_t>* out) -> bool {
      scratch.resize((lens[fi] / 4 + 1) * 3);
      int64_t nb = b64_decode(fields[fi], lens[fi], scratch.data(),
                              (int64_t)scratch.size());
      if (nb < 0) return false;
      out->resize(nb / sizeof(int64_t));
      std::memcpy(out->data(), scratch.data(), nb);
      return true;
    };
    if (n <= 0) continue;
    if (!decode_i64(3, &rec.objects_id)) continue;
    if (!decode_floats(4, &rec.objects_conf)) continue;
    if (!decode_floats(8, &rec.boxes)) continue;
    if (!decode_floats(9, &rec.features)) continue;
    // strict size validation: the decoded payloads must agree with
    // num_boxes and with the store-wide feature dim, or the row is
    // dropped — tsv_get memcpys n*feat_dim floats from these buffers,
    // so a short decode would otherwise read out of bounds.
    if (rec.boxes.size() != (size_t)n * 4) continue;
    if (rec.features.size() % (size_t)n != 0) continue;
    const int d = (int)(rec.features.size() / (size_t)n);
    if (d <= 0) continue;
    if (store->feat_dim == 0) store->feat_dim = d;
    if (d != store->feat_dim) continue;  // mixed dims: keep the first
    store->records.push_back(std::move(rec));
  }
  g_stores.push_back(store.release());
  return (int64_t)g_stores.size() - 1;
}

namespace {
Store* store_at(int64_t h) {
  if (h < 0 || (size_t)h >= g_stores.size()) return nullptr;
  return g_stores[(size_t)h];
}
}  // namespace

int64_t tsv_count(int64_t h) {
  const Store* s = store_at(h);
  return s ? (int64_t)s->records.size() : -1;
}

int tsv_feat_dim(int64_t h) {
  const Store* s = store_at(h);
  return s ? s->feat_dim : -1;
}

// Copy record i. Caller provides buffers; boxes [max_boxes*4],
// features [max_boxes*feat_dim], ids/conf [max_boxes]. Returns the
// clipped number of boxes, or -1 for an invalid handle/index.
int tsv_get(int64_t h, int64_t i, char* img_id_out, int img_id_cap,
            int* img_h, int* img_w, float* boxes, float* features,
            int64_t* objects_id, float* objects_conf, int max_boxes) {
  const Store* s = store_at(h);
  if (!s || i < 0 || (size_t)i >= s->records.size()) return -1;
  const Record& r = s->records[(size_t)i];
  std::snprintf(img_id_out, img_id_cap, "%s", r.img_id.c_str());
  *img_h = r.img_h;
  *img_w = r.img_w;
  const int feat_dim = g_stores[h]->feat_dim;
  const int n = r.num_boxes < max_boxes ? r.num_boxes : max_boxes;
  std::memcpy(boxes, r.boxes.data(), (size_t)n * 4 * sizeof(float));
  std::memcpy(features, r.features.data(),
              (size_t)n * feat_dim * sizeof(float));
  const int nid = (int)r.objects_id.size() < n ? (int)r.objects_id.size() : n;
  std::memcpy(objects_id, r.objects_id.data(), (size_t)nid * sizeof(int64_t));
  const int nc = (int)r.objects_conf.size() < n ? (int)r.objects_conf.size() : n;
  std::memcpy(objects_conf, r.objects_conf.data(), (size_t)nc * sizeof(float));
  return n;
}

void tsv_close(int64_t h) {
  if (h < 0 || (size_t)h >= g_stores.size()) return;
  delete g_stores[(size_t)h];
  g_stores[(size_t)h] = nullptr;
}

}  // extern "C"
