// Standalone C++ streaming inference runtime for microwakeword_tpu models.
//
// Executes the op-list format emitted by export/native_runtime.py: a
// MixedNet streaming step (ring-buffer convs, folded batchnorm, residuals,
// tail window, dense+sigmoid) plus a float port of the micro_speech
// frontend (frontend/reference.py) -- PCM in, wake probability out, no
// Python, no TFLite.  This fills the deployment-runtime role the reference
// delegates to the TFLite C++ interpreter (reference inference.py:34-64),
// with state handling equivalent to its streaming model's internal
// ring-buffer variables (reference stream.py:522-595).
//
// Part of libmwwnative.so (built with mww_native.cc; see native/Makefile).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x3157574D;  // 'MWW1'

enum OpType {
  kConv = 0,       // p: k, stride, in_ch, out_ch, w, bias(-1), dilation(0=1)
  kRelu = 1,
  kMixConv = 2,
  kPointwise = 3,
  kBnorm = 4,
  kResSave = 5,    // save cur[0:ch] into slot (also generic branch save)
  kResApply = 6,
  kTail = 7,
  kDenseSig = 8,
  kRestore = 9,    // p: ch, slot -- cur = slot
  kConcat = 10,    // p: ch1, slot1, ch2, slot2, ch3 -- cur = [s1, s2, cur]
  kSpAttn = 11,    // p: ch, k, w([k,2]) -- CBAM gate over (mean,max) ring
  // ---- full-int8 ops (v3 format; export/native_quant.py) ----
  kQIn = 20,       // p: n, qt([s, zp]) -- quantize float frames -> int8
  kQConv = 21,     // p: k, stride, in, out, w(i8), bias(-1), dil, relu, qt
  kQMix = 22,      // p: kmax, ch, w(i8), qt
  kQPw = 23,       // p: in, out, w(i8), bias(i32), relu, qt
  kQSave = 24,     // p: ch, slot -- int8 copy
  kQRes = 25,      // p: in, out, w(i8), bias(i32), slot, qt
  kQTail = 26,     // p: window, ch, pooled, max_pool, qt([zp])
  kQDense = 27,    // p: in, w(i8), qt([zp_in, s_in*s_w, bias]) -> float prob
  kQRestore = 28,  // p: ch, slot -- cur8 = slot
  kQConcat = 29,   // p: c1, slot1, c2, slot2, c3 -- cur8 = [s1, s2, cur8]
                   //    (branches quantized to one shared scale at export)
};

struct Op {
  int32_t type = 0;
  int32_t p[9] = {0};
  // Runtime state:
  std::vector<float> ring;  // conv/mixconv/tail history frames
  std::vector<int8_t> ring8;  // quantized history (v3 ops)
  int ring_rows = 0;
  int ring_ch = 0;
  int8_t ring_zero = 0;  // zero-point of the ring's scale: reset value
};

struct Tensor {
  const float* data = nullptr;   // dtype 0
  const int8_t* i8 = nullptr;    // dtype 1
  const int32_t* i32 = nullptr;  // dtype 2
  int64_t size = 0;
};

inline int8_t clamp_i8(int v) {
  return static_cast<int8_t>(std::min(127, std::max(-128, v)));
}

}  // namespace

extern "C" {

struct mww_model {
  int32_t stride = 1;
  int32_t n_features = 40;
  std::vector<Op> ops;
  std::vector<Tensor> tensors;
  std::vector<float> blob;
  std::vector<uint8_t> blob_raw;  // v3: byte blob with typed tensors
  std::vector<std::vector<float>> res_slots;
  std::vector<std::vector<int8_t>> res_slots8;
  // scratch frames (double buffered)
  std::vector<float> cur, nxt;
  std::vector<int8_t> cur8, nxt8;
  // preallocated int32 accumulator for the quantized matmul ops (kQConv/
  // kQPw/kQRes) -- sized max_ch at load so the streaming hot loop never
  // allocates (the float path's scratch is likewise preallocated)
  std::vector<int32_t> acc32;
};

static void reset_state(mww_model* m) {
  for (auto& op : m->ops) {
    std::fill(op.ring.begin(), op.ring.end(), 0.f);
    // quantized rings reset to the zero-point: q == zp represents real 0
    std::fill(op.ring8.begin(), op.ring8.end(), op.ring_zero);
  }
  for (auto& s : m->res_slots) std::fill(s.begin(), s.end(), 0.f);
  for (auto& s : m->res_slots8) std::fill(s.begin(), s.end(), int8_t{0});
}

mww_model* mww_model_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t magic = 0, version = 0;
  int32_t stride = 0, n_features = 0, n_ops = 0, n_tensors = 0;
  if (fread(&magic, 4, 1, f) != 1 || magic != kMagic ||
      fread(&version, 4, 1, f) != 1 || version < 1 || version > 3 ||
      fread(&stride, 4, 1, f) != 1 || fread(&n_features, 4, 1, f) != 1 ||
      fread(&n_ops, 4, 1, f) != 1 || fread(&n_tensors, 4, 1, f) != 1) {
    fclose(f);
    return nullptr;
  }
  auto* m = new mww_model;
  m->stride = stride;
  m->n_features = n_features;
  m->ops.resize(n_ops);
  for (auto& op : m->ops) {
    int32_t rec[10];
    if (fread(rec, 4, 10, f) != 10) {
      fclose(f);
      delete m;
      return nullptr;
    }
    op.type = rec[0];
    std::memcpy(op.p, rec + 1, 9 * 4);
  }
  if (version >= 3) {
    // typed tensor table: (u64 byte_offset, u64 n_elems, u32 dtype, u32 pad)
    struct Entry { uint64_t off, n; uint32_t dtype, pad; };
    std::vector<Entry> table(n_tensors);
    uint64_t total = 0;
    for (auto& e : table) {
      if (fread(&e, sizeof(Entry), 1, f) != 1) {
        fclose(f);
        delete m;
        return nullptr;
      }
      const uint64_t elem = e.dtype == 1 ? 1 : 4;
      total = std::max(total, e.off + e.n * elem);
    }
    m->blob_raw.resize(total);
    if (total && fread(m->blob_raw.data(), 1, total, f) != total) {
      fclose(f);
      delete m;
      return nullptr;
    }
    fclose(f);
    m->tensors.resize(n_tensors);
    for (int i = 0; i < n_tensors; ++i) {
      const uint8_t* base = m->blob_raw.data() + table[i].off;
      Tensor& t = m->tensors[i];
      t.size = static_cast<int64_t>(table[i].n);
      switch (table[i].dtype) {
        case 0: t.data = reinterpret_cast<const float*>(base); break;
        case 1: t.i8 = reinterpret_cast<const int8_t*>(base); break;
        case 2: t.i32 = reinterpret_cast<const int32_t*>(base); break;
        default:
          delete m;
          return nullptr;
      }
    }
  } else {
    std::vector<std::pair<uint64_t, uint64_t>> table(n_tensors);
    uint64_t total = 0;
    for (auto& e : table) {
      if (fread(&e.first, 8, 1, f) != 1 || fread(&e.second, 8, 1, f) != 1) {
        fclose(f);
        delete m;
        return nullptr;
      }
      total = std::max(total, e.first + e.second);
    }
    m->blob.resize(total);
    if (total && fread(m->blob.data(), 4, total, f) != total) {
      fclose(f);
      delete m;
      return nullptr;
    }
    fclose(f);
    m->tensors.resize(n_tensors);
    for (int i = 0; i < n_tensors; ++i) {
      m->tensors[i].data = m->blob.data() + table[i].first;
      m->tensors[i].size = static_cast<int64_t>(table[i].second);
    }
  }
  // Allocate ring buffers and residual slots.
  int n_slots = 0;
  int max_ch = n_features * stride;
  for (auto& op : m->ops) {
    switch (op.type) {
      case kConv: {
        const int k = op.p[0], st = op.p[1], in_ch = op.p[2];
        const int dil = op.p[6] > 0 ? op.p[6] : 1;
        op.ring_rows = std::max(0, dil * (k - 1) - (st - 1));
        op.ring_ch = in_ch;
        break;
      }
      case kMixConv: {
        op.ring_rows = op.p[0] - 1;
        op.ring_ch = op.p[1];
        break;
      }
      case kTail: {
        op.ring_rows = op.p[0] - 1;
        op.ring_ch = op.p[1];
        max_ch = std::max(max_ch, op.p[0] * op.p[1]);
        break;
      }
      case kResSave:
        n_slots = std::max(n_slots, op.p[1] + 1);
        break;
      case kRestore:
        n_slots = std::max(n_slots, op.p[1] + 1);
        max_ch = std::max(max_ch, op.p[0]);
        break;
      case kConcat:
        n_slots = std::max({n_slots, op.p[1] + 1, op.p[3] + 1});
        max_ch = std::max(max_ch, op.p[0] + op.p[2] + op.p[4]);
        break;
      case kSpAttn: {
        op.ring_rows = op.p[1] - 1;  // k-1 pooled frames
        op.ring_ch = 2;              // (mean, max) per frame
        break;
      }
      case kQConv: {
        const int k = op.p[0], st = op.p[1];
        const int dil = op.p[6] > 0 ? op.p[6] : 1;
        op.ring_rows = std::max(0, dil * (k - 1) - (st - 1));
        op.ring_ch = op.p[2];
        op.ring_zero = clamp_i8(
            static_cast<int>(std::lround(m->tensors[op.p[8]].data[0])));
        max_ch = std::max({max_ch, op.p[2], op.p[3]});
        break;
      }
      case kQMix: {
        op.ring_rows = op.p[0] - 1;
        op.ring_ch = op.p[1];
        op.ring_zero = clamp_i8(
            static_cast<int>(std::lround(m->tensors[op.p[3]].data[0])));
        max_ch = std::max(max_ch, op.p[1]);
        break;
      }
      case kQTail: {
        op.ring_rows = op.p[0] - 1;
        op.ring_ch = op.p[1];
        op.ring_zero = clamp_i8(
            static_cast<int>(std::lround(m->tensors[op.p[4]].data[0])));
        max_ch = std::max(max_ch, op.p[0] * op.p[1]);
        break;
      }
      case kQPw:
        max_ch = std::max({max_ch, op.p[0], op.p[1]});
        break;
      case kQRes:
        n_slots = std::max(n_slots, op.p[4] + 1);
        max_ch = std::max({max_ch, op.p[0], op.p[1]});
        break;
      case kQSave:
      case kQRestore:
        n_slots = std::max(n_slots, op.p[1] + 1);
        max_ch = std::max(max_ch, op.p[0]);
        break;
      case kQConcat:
        n_slots = std::max({n_slots, op.p[1] + 1, op.p[3] + 1});
        max_ch = std::max(max_ch, op.p[0] + op.p[2] + op.p[4]);
        break;
      case kQDense:
        max_ch = std::max(max_ch, op.p[0]);
        break;
      default:
        break;
    }
    const bool quant_ring =
        op.type == kQConv || op.type == kQMix || op.type == kQTail;
    if (quant_ring)
      op.ring8.assign(static_cast<size_t>(op.ring_rows) * op.ring_ch,
                      op.ring_zero);
    else
      op.ring.assign(static_cast<size_t>(op.ring_rows) * op.ring_ch, 0.f);
    for (int i = 0; i < 9; ++i)
      if (op.type == kPointwise || op.type == kConv || op.type == kDenseSig ||
          op.type == kResApply)
        max_ch = std::max(max_ch, op.p[i == 0 ? 0 : i]);
  }
  bool quantized = false;
  for (auto& op : m->ops) {
    if (op.type == kConv || op.type == kPointwise)
      max_ch = std::max({max_ch, op.p[2], op.p[3]});
    if (op.type == kResApply) max_ch = std::max({max_ch, op.p[0], op.p[1]});
    if (op.type >= kQIn) quantized = true;
  }
  m->res_slots.resize(n_slots);
  m->cur.resize(max_ch + 8);
  m->nxt.resize(max_ch + 8);
  if (quantized) {
    m->res_slots8.resize(n_slots);
    m->cur8.resize(max_ch + 8);
    m->nxt8.resize(max_ch + 8);
    m->acc32.resize(max_ch + 8);
    // size the int8 residual slots now (kQSave writes op.p[0] bytes into
    // slot op.p[1]) so mww_model_step never reallocates them
    for (auto& op : m->ops)
      if (op.type == kQSave &&
          static_cast<int>(m->res_slots8[op.p[1]].size()) < op.p[0])
        m->res_slots8[op.p[1]].resize(op.p[0]);
  }
  reset_state(m);
  return m;
}

void mww_model_free(mww_model* m) { delete m; }
int mww_model_stride(mww_model* m) { return m->stride; }
int mww_model_input_features(mww_model* m) { return m->n_features; }
void mww_model_reset(mww_model* m) { reset_state(m); }

// One streaming step: frames = [stride, n_features] newest feature slices.
float mww_model_step(mww_model* m, const float* frames) {
  std::vector<float>& cur = m->cur;
  std::vector<float>& nxt = m->nxt;
  int cur_len = m->stride * m->n_features;
  std::memcpy(cur.data(), frames, sizeof(float) * cur_len);

  for (auto& op : m->ops) {
    switch (op.type) {
      case kConv: {
        // memory = [ring rows, new (stride rows)] -> one output frame;
        // tap t of the kernel reads memory row t*dilation.
        const int k = op.p[0], st = op.p[1], in_ch = op.p[2],
                  out_ch = op.p[3];
        const int dil = op.p[6] > 0 ? op.p[6] : 1;
        const float* w = m->tensors[op.p[4]].data;  // [k, in, out]
        const int ring = op.ring_rows;
        const int rows = ring + st;  // == dil*(k-1) + 1
        std::vector<float>& mem = nxt;  // scratch: rows*in + out
        if (static_cast<int>(mem.size()) < rows * in_ch + out_ch)
          mem.resize(rows * in_ch + out_ch);
        for (int r = 0; r < ring; ++r)
          std::memcpy(mem.data() + r * in_ch, op.ring.data() + r * in_ch,
                      sizeof(float) * in_ch);
        for (int r = 0; r < st; ++r)
          std::memcpy(mem.data() + (ring + r) * in_ch, cur.data() + r * in_ch,
                      sizeof(float) * in_ch);
        // Update ring with last `ring` rows of memory.
        for (int r = 0; r < ring; ++r)
          std::memcpy(op.ring.data() + r * in_ch,
                      mem.data() + (rows - ring + r) * in_ch,
                      sizeof(float) * in_ch);
        float* out = mem.data() + rows * in_ch;
        const float* bias =
            op.p[5] >= 0 ? m->tensors[op.p[5]].data : nullptr;
        for (int o = 0; o < out_ch; ++o) out[o] = bias ? bias[o] : 0.f;
        for (int t = 0; t < k; ++t) {
          const float* row = mem.data() + t * dil * in_ch;
          const float* wt = w + static_cast<int64_t>(t) * in_ch * out_ch;
          for (int i = 0; i < in_ch; ++i) {
            const float v = row[i];
            if (v == 0.f) continue;
            const float* wo = wt + static_cast<int64_t>(i) * out_ch;
            for (int o = 0; o < out_ch; ++o) out[o] += v * wo[o];
          }
        }
        std::memcpy(cur.data(), out, sizeof(float) * out_ch);
        cur_len = out_ch;
        break;
      }
      case kRelu: {
        for (int i = 0; i < op.p[0]; ++i) cur[i] = std::max(0.f, cur[i]);
        break;
      }
      case kMixConv: {
        const int kmax = op.p[0], ch = op.p[1];
        const float* w = m->tensors[op.p[2]].data;  // [kmax, ch]
        const int ring = op.ring_rows;
        // out[c] = sum_t w[t][c] * mem[t][c], mem = [ring rows, current]
        for (int c = 0; c < ch; ++c) nxt[c] = w[(kmax - 1) * ch + c] * cur[c];
        for (int t = 0; t < ring; ++t) {
          const float* row = op.ring.data() + t * ch;
          const float* wt = w + t * ch;
          for (int c = 0; c < ch; ++c) nxt[c] += wt[c] * row[c];
        }
        // Ring shifts by one frame: drop oldest, append current.
        if (ring > 0) {
          std::memmove(op.ring.data(), op.ring.data() + ch,
                       sizeof(float) * ch * (ring - 1));
          std::memcpy(op.ring.data() + ch * (ring - 1), cur.data(),
                      sizeof(float) * ch);
        }
        std::swap(cur, nxt);
        cur_len = ch;
        break;
      }
      case kPointwise: {
        const int in_ch = op.p[0], out_ch = op.p[1];
        const float* w = m->tensors[op.p[2]].data;  // [in, out]
        const float* bias = op.p[3] >= 0 ? m->tensors[op.p[3]].data : nullptr;
        for (int o = 0; o < out_ch; ++o) nxt[o] = bias ? bias[o] : 0.f;
        for (int i = 0; i < in_ch; ++i) {
          const float v = cur[i];
          if (v == 0.f) continue;
          const float* wo = w + static_cast<int64_t>(i) * out_ch;
          for (int o = 0; o < out_ch; ++o) nxt[o] += v * wo[o];
        }
        std::swap(cur, nxt);
        cur_len = out_ch;
        break;
      }
      case kBnorm: {
        const float* scale = m->tensors[op.p[1]].data;
        const float* offset = m->tensors[op.p[2]].data;
        for (int c = 0; c < op.p[0]; ++c) cur[c] = cur[c] * scale[c] + offset[c];
        break;
      }
      case kResSave: {
        auto& slot = m->res_slots[op.p[1]];
        slot.assign(cur.begin(), cur.begin() + op.p[0]);
        break;
      }
      case kResApply: {
        const int in_ch = op.p[0], out_ch = op.p[1];
        const float* w = m->tensors[op.p[2]].data;
        const float* scale = m->tensors[op.p[3]].data;
        const float* offset = m->tensors[op.p[4]].data;
        const auto& saved = m->res_slots[op.p[5]];
        for (int o = 0; o < out_ch; ++o) nxt[o] = 0.f;
        for (int i = 0; i < in_ch; ++i) {
          const float v = saved[i];
          if (v == 0.f) continue;
          const float* wo = w + static_cast<int64_t>(i) * out_ch;
          for (int o = 0; o < out_ch; ++o) nxt[o] += v * wo[o];
        }
        for (int o = 0; o < out_ch; ++o)
          cur[o] += nxt[o] * scale[o] + offset[o];
        break;
      }
      case kTail: {
        const int window = op.p[0], ch = op.p[1];
        const bool pooled = op.p[2] != 0, max_pool = op.p[3] != 0;
        const int ring = op.ring_rows;  // window - 1
        // memory = [ring rows, current frame]
        if (static_cast<int>(nxt.size()) < window * ch)
          nxt.resize(window * ch);
        std::memcpy(nxt.data(), op.ring.data(), sizeof(float) * ring * ch);
        std::memcpy(nxt.data() + ring * ch, cur.data(), sizeof(float) * ch);
        // ring <- last ring rows of memory
        std::memmove(op.ring.data(), nxt.data() + ch,
                     sizeof(float) * ring * ch);
        if (pooled) {
          for (int c = 0; c < ch; ++c) {
            float acc = max_pool ? -1e30f : 0.f;
            for (int t = 0; t < window; ++t) {
              const float v = nxt[t * ch + c];
              acc = max_pool ? std::max(acc, v) : acc + v;
            }
            cur[c] = max_pool ? acc : acc / window;
          }
          cur_len = ch;
        } else {
          std::swap(cur, nxt);
          cur_len = window * ch;
        }
        break;
      }
      case kDenseSig: {
        const int in_dim = op.p[0], out_dim = op.p[1];
        const float* w = m->tensors[op.p[2]].data;  // [in, out]
        const float* bias = m->tensors[op.p[3]].data;
        for (int o = 0; o < out_dim; ++o) {
          double acc = bias[o];
          for (int i = 0; i < in_dim; ++i)
            acc += static_cast<double>(cur[i]) * w[i * out_dim + o];
          cur[o] = static_cast<float>(1.0 / (1.0 + std::exp(-acc)));
        }
        cur_len = out_dim;
        break;
      }
      case kRestore: {
        const auto& slot = m->res_slots[op.p[1]];
        std::memcpy(cur.data(), slot.data(), sizeof(float) * op.p[0]);
        cur_len = op.p[0];
        break;
      }
      case kConcat: {
        const int c1 = op.p[0], c2 = op.p[2], c3 = op.p[4];
        const auto& s1 = m->res_slots[op.p[1]];
        const auto& s2 = m->res_slots[op.p[3]];
        // cur currently holds branch 3; shift it right, prepend s1+s2.
        std::memmove(cur.data() + c1 + c2, cur.data(), sizeof(float) * c3);
        std::memcpy(cur.data(), s1.data(), sizeof(float) * c1);
        std::memcpy(cur.data() + c1, s2.data(), sizeof(float) * c2);
        cur_len = c1 + c2 + c3;
        break;
      }
      case kSpAttn: {
        // CBAM gate (models/mixednet.py SpatialAttention, streaming mode):
        // pooled = (mean, max) over channels; conv width k over the pooled
        // ring; newest frame scaled by sigmoid(att).
        const int ch = op.p[0];
        const float* w = m->tensors[op.p[2]].data;  // [k, 2]
        float mean = 0.f, mx = -1e30f;
        for (int c = 0; c < ch; ++c) {
          mean += cur[c];
          mx = std::max(mx, cur[c]);
        }
        mean /= ch;
        double att = 0.0;
        const int ring = op.ring_rows;  // k-1 pooled rows
        for (int t = 0; t < ring; ++t)
          att += w[t * 2] * op.ring[t * 2] + w[t * 2 + 1] * op.ring[t * 2 + 1];
        att += w[ring * 2] * mean + w[ring * 2 + 1] * mx;
        if (ring > 0) {
          std::memmove(op.ring.data(), op.ring.data() + 2,
                       sizeof(float) * 2 * (ring - 1));
          op.ring[2 * (ring - 1)] = mean;
          op.ring[2 * (ring - 1) + 1] = mx;
        }
        const float gate = static_cast<float>(1.0 / (1.0 + std::exp(-att)));
        for (int c = 0; c < ch; ++c) cur[c] *= gate;
        break;
      }
      case kQIn: {
        // quantize the incoming float frames: q = round(x / s) + zp
        const float* qt = m->tensors[op.p[1]].data;  // [s, zp]
        const float inv_s = 1.0f / qt[0];
        const int zp = static_cast<int>(std::lround(qt[1]));
        for (int i = 0; i < op.p[0]; ++i)
          m->cur8[i] = clamp_i8(
              static_cast<int>(std::lround(cur[i] * inv_s)) + zp);
        cur_len = op.p[0];
        break;
      }
      case kQConv: {
        const int k = op.p[0], st = op.p[1], in_ch = op.p[2],
                  out_ch = op.p[3];
        const int dil = op.p[6] > 0 ? op.p[6] : 1;
        const bool relu = op.p[7] != 0;
        const int8_t* w = m->tensors[op.p[4]].i8;  // [k, in, out]
        const float* qt = m->tensors[op.p[8]].data;  // [zp_in, zp_out, M..]
        const int zp_in = static_cast<int>(std::lround(qt[0]));
        const int zp_out = static_cast<int>(std::lround(qt[1]));
        const float* mult = qt + 2;
        const int ring = op.ring_rows;
        const int rows = ring + st;  // == dil*(k-1) + 1
        std::vector<int8_t>& mem8 = m->nxt8;
        if (static_cast<int>(mem8.size()) < rows * in_ch)
          mem8.resize(rows * in_ch);
        for (int r = 0; r < ring; ++r)
          std::memcpy(mem8.data() + r * in_ch, op.ring8.data() + r * in_ch,
                      in_ch);
        for (int r = 0; r < st; ++r)
          std::memcpy(mem8.data() + (ring + r) * in_ch,
                      m->cur8.data() + r * in_ch, in_ch);
        for (int r = 0; r < ring; ++r)
          std::memcpy(op.ring8.data() + r * in_ch,
                      mem8.data() + (rows - ring + r) * in_ch, in_ch);
        const int32_t* bias = op.p[5] >= 0 ? m->tensors[op.p[5]].i32 : nullptr;
        int32_t* acc = m->acc32.data();
        std::fill(acc, acc + out_ch, 0);
        for (int t = 0; t < k; ++t) {
          const int8_t* row = mem8.data() + t * dil * in_ch;
          const int8_t* wt = w + static_cast<int64_t>(t) * in_ch * out_ch;
          for (int i = 0; i < in_ch; ++i) {
            const int v = row[i] - zp_in;
            if (v == 0) continue;
            const int8_t* wo = wt + static_cast<int64_t>(i) * out_ch;
            for (int o = 0; o < out_ch; ++o) acc[o] += v * wo[o];
          }
        }
        const int lo = relu ? std::max(-128, zp_out) : -128;
        for (int o = 0; o < out_ch; ++o) {
          int a = acc[o] + (bias ? bias[o] : 0);
          int q = static_cast<int>(std::lround(a * mult[o])) + zp_out;
          m->cur8[o] = static_cast<int8_t>(std::min(127, std::max(lo, q)));
        }
        cur_len = out_ch;
        break;
      }
      case kQMix: {
        const int kmax = op.p[0], ch = op.p[1];
        const int8_t* w = m->tensors[op.p[2]].i8;  // [kmax, ch]
        const float* qt = m->tensors[op.p[3]].data;
        const int zp_in = static_cast<int>(std::lround(qt[0]));
        const int zp_out = static_cast<int>(std::lround(qt[1]));
        const float* mult = qt + 2;
        const int ring = op.ring_rows;
        for (int c = 0; c < ch; ++c) {
          int acc = (m->cur8[c] - zp_in) * w[(kmax - 1) * ch + c];
          for (int t = 0; t < ring; ++t)
            acc += (op.ring8[t * ch + c] - zp_in) * w[t * ch + c];
          const int q = static_cast<int>(std::lround(acc * mult[c])) + zp_out;
          m->nxt8[c] = clamp_i8(q);
        }
        if (ring > 0) {
          std::memmove(op.ring8.data(), op.ring8.data() + ch,
                       static_cast<size_t>(ch) * (ring - 1));
          std::memcpy(op.ring8.data() + static_cast<size_t>(ch) * (ring - 1),
                      m->cur8.data(), ch);
        }
        std::swap(m->cur8, m->nxt8);
        cur_len = ch;
        break;
      }
      case kQPw: {
        const int in_ch = op.p[0], out_ch = op.p[1];
        const bool relu = op.p[4] != 0;
        const int8_t* w = m->tensors[op.p[2]].i8;  // [in, out]
        const int32_t* bias = op.p[3] >= 0 ? m->tensors[op.p[3]].i32 : nullptr;
        const float* qt = m->tensors[op.p[5]].data;
        const int zp_in = static_cast<int>(std::lround(qt[0]));
        const int zp_out = static_cast<int>(std::lround(qt[1]));
        const float* mult = qt + 2;
        int32_t* acc = m->acc32.data();
        std::fill(acc, acc + out_ch, 0);
        for (int i = 0; i < in_ch; ++i) {
          const int v = m->cur8[i] - zp_in;
          if (v == 0) continue;
          const int8_t* wo = w + static_cast<int64_t>(i) * out_ch;
          for (int o = 0; o < out_ch; ++o) acc[o] += v * wo[o];
        }
        const int lo = relu ? std::max(-128, zp_out) : -128;
        for (int o = 0; o < out_ch; ++o) {
          const int a = acc[o] + (bias ? bias[o] : 0);
          const int q = static_cast<int>(std::lround(a * mult[o])) + zp_out;
          m->cur8[o] = static_cast<int8_t>(std::min(127, std::max(lo, q)));
        }
        cur_len = out_ch;
        break;
      }
      case kQSave: {
        // slot storage was sized at load; plain copy, no allocation
        auto& slot = m->res_slots8[op.p[1]];
        std::memcpy(slot.data(), m->cur8.data(), op.p[0]);
        break;
      }
      case kQRestore: {
        const auto& slot = m->res_slots8[op.p[1]];
        std::memcpy(m->cur8.data(), slot.data(), op.p[0]);
        cur_len = op.p[0];
        break;
      }
      case kQConcat: {
        const int c1 = op.p[0], c2 = op.p[2], c3 = op.p[4];
        const auto& s1 = m->res_slots8[op.p[1]];
        const auto& s2 = m->res_slots8[op.p[3]];
        std::memmove(m->cur8.data() + c1 + c2, m->cur8.data(), c3);
        std::memcpy(m->cur8.data(), s1.data(), c1);
        std::memcpy(m->cur8.data() + c1, s2.data(), c2);
        cur_len = c1 + c2 + c3;
        break;
      }
      case kQRes: {
        // branch = 1x1(saved) (BN folded); out = relu(cur + branch),
        // all requantized to the output scale:
        //   out_q = clamp(round((cur_q - zp_mid)*A + acc_o*B_o) + zp_out)
        const int in_ch = op.p[0], out_ch = op.p[1];
        const int8_t* w = m->tensors[op.p[2]].i8;
        const int32_t* bias = op.p[3] >= 0 ? m->tensors[op.p[3]].i32 : nullptr;
        const auto& saved = m->res_slots8[op.p[4]];
        const float* qt = m->tensors[op.p[5]].data;
        const int zp_sv = static_cast<int>(std::lround(qt[0]));
        const int zp_mid = static_cast<int>(std::lround(qt[1]));
        const int zp_out = static_cast<int>(std::lround(qt[2]));
        const float a_mul = qt[3];
        const float* b_mul = qt + 4;
        int32_t* acc = m->acc32.data();
        std::fill(acc, acc + out_ch, 0);
        for (int i = 0; i < in_ch; ++i) {
          const int v = saved[i] - zp_sv;
          if (v == 0) continue;
          const int8_t* wo = w + static_cast<int64_t>(i) * out_ch;
          for (int o = 0; o < out_ch; ++o) acc[o] += v * wo[o];
        }
        const int lo = std::max(-128, zp_out);  // relu
        for (int o = 0; o < out_ch; ++o) {
          const int a = acc[o] + (bias ? bias[o] : 0);
          const float real = (m->cur8[o] - zp_mid) * a_mul + a * b_mul[o];
          const int q = static_cast<int>(std::lround(real)) + zp_out;
          m->cur8[o] = static_cast<int8_t>(std::min(127, std::max(lo, q)));
        }
        cur_len = out_ch;
        break;
      }
      case kQTail: {
        const int window = op.p[0], ch = op.p[1];
        const bool pooled = op.p[2] != 0, max_pool = op.p[3] != 0;
        const int ring = op.ring_rows;  // window - 1
        std::vector<int8_t>& mem8 = m->nxt8;
        if (static_cast<int>(mem8.size()) < window * ch)
          mem8.resize(window * ch);
        std::memcpy(mem8.data(), op.ring8.data(),
                    static_cast<size_t>(ring) * ch);
        std::memcpy(mem8.data() + static_cast<size_t>(ring) * ch,
                    m->cur8.data(), ch);
        std::memmove(op.ring8.data(), mem8.data() + ch,
                     static_cast<size_t>(ring) * ch);
        if (pooled) {
          // same scale in/out: mean/max act on the raw q values
          for (int c = 0; c < ch; ++c) {
            if (max_pool) {
              int8_t mx = -128;
              for (int t = 0; t < window; ++t)
                mx = std::max(mx, mem8[t * ch + c]);
              m->cur8[c] = mx;
            } else {
              int sum = 0;
              for (int t = 0; t < window; ++t) sum += mem8[t * ch + c];
              m->cur8[c] = clamp_i8(static_cast<int>(std::lround(
                  static_cast<double>(sum) / window)));
            }
          }
          cur_len = ch;
        } else {
          std::swap(m->cur8, m->nxt8);
          cur_len = window * ch;
        }
        break;
      }
      case kQDense: {
        const int in_dim = op.p[0];
        const int8_t* w = m->tensors[op.p[1]].i8;  // [in]
        const float* qt = m->tensors[op.p[2]].data;  // [zp_in, s, bias]
        const int zp_in = static_cast<int>(std::lround(qt[0]));
        int64_t acc = 0;
        for (int i = 0; i < in_dim; ++i)
          acc += static_cast<int64_t>(m->cur8[i] - zp_in) * w[i];
        const double logit = static_cast<double>(acc) * qt[1] + qt[2];
        cur[0] = static_cast<float>(1.0 / (1.0 + std::exp(-logit)));
        cur_len = 1;
        break;
      }
      default:
        return -1.f;
    }
  }
  (void)cur_len;
  return cur[0];
}

// Spectrogram [T, n_features] -> probs[T / stride] (stateful across calls).
int64_t mww_model_predict_spectrogram(mww_model* m, const float* spec,
                                      int64_t t, float* probs) {
  const int64_t steps = t / m->stride;
  for (int64_t s = 0; s < steps; ++s)
    probs[s] = mww_model_step(m, spec + s * m->stride * m->n_features);
  return steps;
}

// ---------------------------------------------------------------------------
// Float micro_speech frontend (port of frontend/reference.py)
// ---------------------------------------------------------------------------

struct mww_frontend {
  int step_ms = 10;
  int hop = 160;
  std::vector<double> window;            // [480]
  std::vector<double> dft_cos, dft_sin;  // [480 * 257] row-major by sample
  std::vector<double> mel;               // [257 * 40]
  std::vector<double> smoothing;         // [40]
  std::vector<double> noise_estimate;    // [40]
};

namespace {

constexpr int kWin = 480;
constexpr int kFft = 512;
constexpr int kBins = kFft / 2 + 1;
constexpr int kChan = 40;
constexpr double kLower = 125.0, kUpper = 7500.0;
constexpr double kEvenSmooth = 0.025, kOddSmooth = 0.06;
constexpr double kMinSignal = 0.05;
constexpr double kPcanStrength = 0.95, kPcanOffset = 10.0;
constexpr int kPcanBits = 6, kCorrectionBits = 3, kLogShift = 6;
constexpr float kFeatureScale = 0.0390625f;

double freq_to_mel(double f) { return 1127.0 * std::log1p(f / 700.0); }

}  // namespace

mww_frontend* mww_frontend_create(int step_ms) {
  auto* fe = new mww_frontend;
  fe->step_ms = step_ms;
  fe->hop = 16 * step_ms;
  fe->window.resize(kWin);
  for (int i = 0; i < kWin; ++i)
    fe->window[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * (i + 0.5) / kWin);
  fe->dft_cos.resize(static_cast<size_t>(kWin) * kBins);
  fe->dft_sin.resize(static_cast<size_t>(kWin) * kBins);
  for (int i = 0; i < kWin; ++i) {
    for (int k = 0; k < kBins; ++k) {
      const double ang = 2.0 * M_PI * i * k / kFft;
      fe->dft_cos[static_cast<size_t>(i) * kBins + k] = std::cos(ang);
      fe->dft_sin[static_cast<size_t>(i) * kBins + k] = -std::sin(ang);
    }
  }
  // Mel filterbank (frontend/reference.py mel_filterbank_matrix).
  fe->mel.assign(static_cast<size_t>(kBins) * kChan, 0.0);
  const double mel_low = freq_to_mel(kLower), mel_hi = freq_to_mel(kUpper);
  const double spacing = (mel_hi - mel_low) / (kChan + 1);
  for (int b = 0; b < kBins; ++b) {
    const double m = freq_to_mel(b * (16000.0 / kFft));
    if (m <= mel_low || m > mel_low + spacing * (kChan + 1)) continue;
    int k = static_cast<int>(std::floor((m - mel_low) / spacing));
    if (m == mel_low + spacing * k) k -= 1;  // searchsorted 'left' edge case
    k = std::min(std::max(k, 0), kChan);
    const double frac = (m - (mel_low + spacing * k)) / spacing;
    if (k < kChan) fe->mel[static_cast<size_t>(b) * kChan + k] += frac;
    if (k - 1 >= 0) fe->mel[static_cast<size_t>(b) * kChan + k - 1] += 1.0 - frac;
  }
  fe->smoothing.resize(kChan);
  for (int c = 0; c < kChan; ++c)
    fe->smoothing[c] = (c % 2 == 0) ? kEvenSmooth : kOddSmooth;
  fe->noise_estimate.assign(kChan, 0.0);
  return fe;
}

void mww_frontend_free(mww_frontend* fe) { delete fe; }
void mww_frontend_reset(mww_frontend* fe) {
  std::fill(fe->noise_estimate.begin(), fe->noise_estimate.end(), 0.0);
}

// int16 PCM -> [n_frames, 40] float32 features; returns n_frames.
// n_frames = 1 + (n - 480)/hop (0 if n < 480); out must hold n_frames*40.
int64_t mww_frontend_process_clip(mww_frontend* fe, const int16_t* pcm,
                                  int64_t n, float* out) {
  if (n < kWin) return 0;
  const int64_t n_frames = 1 + (n - kWin) / fe->hop;
  std::vector<double> windowed(kWin), sf(kChan);
  for (int64_t t = 0; t < n_frames; ++t) {
    const int16_t* x = pcm + t * fe->hop;
    for (int i = 0; i < kWin; ++i) windowed[i] = x[i] * fe->window[i];
    // Windowed DFT energy -> mel -> sqrt/8 (scaled filterbank).
    std::vector<double> energy(kBins);
    for (int k = 0; k < kBins; ++k) {
      double re = 0.0, im = 0.0;
      for (int i = 0; i < kWin; ++i) {
        re += windowed[i] * fe->dft_cos[static_cast<size_t>(i) * kBins + k];
        im += windowed[i] * fe->dft_sin[static_cast<size_t>(i) * kBins + k];
      }
      energy[k] = re * re + im * im;
    }
    for (int c = 0; c < kChan; ++c) {
      double acc = 0.0;
      for (int k = 0; k < kBins; ++k)
        acc += energy[k] * fe->mel[static_cast<size_t>(k) * kChan + c];
      sf[c] = std::sqrt(std::max(acc, 0.0)) / 8.0;
    }
    // Noise suppression + PCAN + log scale (reference.py frontend_frames).
    for (int c = 0; c < kChan; ++c) {
      double& est = fe->noise_estimate[c];
      est = (1.0 - fe->smoothing[c]) * est + fe->smoothing[c] * sf[c];
      const double sub =
          std::max(sf[c] - std::min(est, sf[c]), kMinSignal * sf[c]);
      const double snr =
          (sub / 8.0) * std::pow(1.0 + est / kPcanOffset, -kPcanStrength);
      const double pcan = snr < 2.0 ? snr * snr / 4.0 : snr - 1.0;
      const double q6 = std::floor(pcan * (1 << kPcanBits));
      const double value = q6 * (1 << kCorrectionBits);
      double logged =
          value > 1.0 ? std::log(std::max(value, 1.0)) * (1 << kLogShift) : 0.0;
      logged = std::min(std::max(std::round(logged), 0.0), 65535.0);
      out[t * kChan + c] = static_cast<float>(logged) * kFeatureScale;
    }
  }
  return n_frames;
}

// Convenience: PCM -> streaming probabilities (frontend + model).
// probs must hold (1 + (n-480)/hop) / stride entries; returns count.
int64_t mww_predict_clip(mww_frontend* fe, mww_model* m, const int16_t* pcm,
                         int64_t n, float* probs) {
  if (n < kWin) return 0;
  const int64_t n_frames = 1 + (n - kWin) / fe->hop;
  std::vector<float> feats(static_cast<size_t>(n_frames) * kChan);
  mww_frontend_process_clip(fe, pcm, n, feats.data());
  return mww_model_predict_spectrogram(m, feats.data(), n_frames, probs);
}

}  // extern "C"
