// splat_ingest — native asset-ingestion library for splatjax.
//
// C++ implementation of the framework's loader hot loops, mirroring the
// reference viewer's ingestion math exactly:
//   * .splat row decode (32-byte rows; index.js:227, 343-359): positions
//     with Z negated, quaternions (w,x,y,z)=(b-128)/128 conjugated into the
//     framework convention (w, -x, -y, z);
//   * .ply -> scene conversion (processPlyBuffer, index.js:600-745):
//     binary-little-endian header parsing with per-property offsets/types,
//     importance = exp(s0)exp(s1)exp(s2)*sigmoid(opacity) descending sort
//     (:653-669), activations exp(scale)/sigmoid(opacity)/SH DC color
//     (:709-741), point-cloud fallbacks (:712-721, 740);
//   * .splat serialization (inverse mapping, :676-742).
//
// Exposed as a C ABI consumed via ctypes (splatjax/io/native.py). Build:
//   python -m splatjax.tools.build_native     (g++ -O3 -shared -fPIC)
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

namespace {

constexpr int kRowLength = 32;
constexpr float kShC0 = 0.28209479177387814f;

inline float sigmoidf(float x) { return 1.0f / (1.0f + std::exp(-x)); }

struct Property {
  std::string name;
  int type;  // 0=f32 1=f64 2=i32 3=u32 4=i16 5=u16 6=u8 7=i8
  size_t offset;
};

size_t type_size(int t) {
  switch (t) {
    case 0: case 2: case 3: return 4;
    case 1: return 8;
    case 4: case 5: return 2;
    default: return 1;
  }
}

double read_prop(const uint8_t* row, const Property& p) {
  const uint8_t* q = row + p.offset;
  switch (p.type) {
    case 0: { float v; std::memcpy(&v, q, 4); return v; }
    case 1: { double v; std::memcpy(&v, q, 8); return v; }
    case 2: { int32_t v; std::memcpy(&v, q, 4); return v; }
    case 3: { uint32_t v; std::memcpy(&v, q, 4); return v; }
    case 4: { int16_t v; std::memcpy(&v, q, 2); return v; }
    case 5: { uint16_t v; std::memcpy(&v, q, 2); return v; }
    case 6: return *q;
    default: return *reinterpret_cast<const int8_t*>(q);
  }
}

struct PlyHeader {
  int64_t vertex_count = -1;
  size_t body_offset = 0;
  size_t row_stride = 0;
  std::vector<Property> props;
  const Property* find(const char* n) const {
    for (const auto& p : props)
      if (p.name == n) return &p;
    return nullptr;
  }
};

bool parse_header(const uint8_t* data, int64_t len, PlyHeader* out) {
  // Scan the whole buffer for end_header (headers with long comments or many
  // properties can exceed any fixed window; the reference's 10KB probe,
  // index.js:602-608, rejects such files — we accept them).
  const char* end_marker = "end_header\n";
  const size_t marker_len = std::strlen(end_marker);
  const char* base = reinterpret_cast<const char*>(data);
  const char* found = static_cast<const char*>(nullptr);
  if (len >= (int64_t)marker_len) {
    const char* it = std::search(base, base + len, end_marker,
                                 end_marker + marker_len);
    if (it != base + len) found = it;
  }
  if (!found) return false;
  std::string head(base, (size_t)(found - base) + marker_len);
  size_t end = head.size() - marker_len;
  out->body_offset = end + std::strlen(end_marker);

  size_t pos = 0, stride = 0;
  while (pos < end) {
    size_t eol = head.find('\n', pos);
    if (eol == std::string::npos || eol > end) eol = end;
    std::string line = head.substr(pos, eol - pos);
    pos = eol + 1;
    if (line.rfind("element vertex ", 0) == 0) {
      out->vertex_count = std::stoll(line.substr(15));
    } else if (line.rfind("property ", 0) == 0) {
      size_t s1 = line.find(' ', 9);
      if (s1 == std::string::npos) continue;
      std::string type = line.substr(9, s1 - 9);
      std::string name = line.substr(s1 + 1);
      int t;
      if (type == "float") t = 0;
      else if (type == "double") t = 1;
      else if (type == "int") t = 2;
      else if (type == "uint") t = 3;
      else if (type == "short") t = 4;
      else if (type == "ushort") t = 5;
      else if (type == "uchar") t = 6;
      else t = 7;  // reference TYPE_MAP falls back to int8 (index.js:627)
      out->props.push_back({name, t, stride});
      stride += type_size(t);
    }
  }
  out->row_stride = stride;
  return out->vertex_count >= 0;
}

}  // namespace

extern "C" {

int64_t splat_count(int64_t len) { return len / kRowLength; }

// Decode n .splat rows into framework-convention arrays.
void splat_parse(const uint8_t* data, int64_t n, float* means, float* scales,
                 float* quats, float* colors, float* opacities) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* row = data + i * kRowLength;
    float f[6];
    std::memcpy(f, row, 24);
    means[i * 3 + 0] = f[0];
    means[i * 3 + 1] = f[1];
    means[i * 3 + 2] = -f[2];  // Z negation, index.js:350-354
    scales[i * 3 + 0] = f[3];
    scales[i * 3 + 1] = f[4];
    scales[i * 3 + 2] = f[5];
    colors[i * 3 + 0] = row[24] / 255.0f;
    colors[i * 3 + 1] = row[25] / 255.0f;
    colors[i * 3 + 2] = row[26] / 255.0f;
    opacities[i] = row[27] / 255.0f;
    // stored (w,x,y,z); framework = (w, -x, -y, z) (conjugated viewer quat)
    float q0 = (row[28] - 128.0f) / 128.0f;
    float q1 = (row[29] - 128.0f) / 128.0f;
    float q2 = (row[30] - 128.0f) / 128.0f;
    float q3 = (row[31] - 128.0f) / 128.0f;
    quats[i * 4 + 0] = q0;
    quats[i * 4 + 1] = -q1;
    quats[i * 4 + 2] = -q2;
    quats[i * 4 + 3] = q3;
  }
}

// Serialize framework arrays to .splat rows (inverse of splat_parse; quat
// normalized and rounded to nearest like Uint8ClampedArray, index.js:697-707).
void splat_serialize(const float* means, const float* scales,
                     const float* quats, const float* colors,
                     const float* opacities, int64_t n, uint8_t* out) {
  auto to_u8 = [](float v) {
    float r = std::nearbyint(v);
    return (uint8_t)std::min(255.0f, std::max(0.0f, r));
  };
  for (int64_t i = 0; i < n; ++i) {
    uint8_t* row = out + i * kRowLength;
    float f[6] = {means[i * 3], means[i * 3 + 1], -means[i * 3 + 2],
                  scales[i * 3], scales[i * 3 + 1], scales[i * 3 + 2]};
    std::memcpy(row, f, 24);
    row[24] = to_u8(colors[i * 3] * 255.0f);
    row[25] = to_u8(colors[i * 3 + 1] * 255.0f);
    row[26] = to_u8(colors[i * 3 + 2] * 255.0f);
    row[27] = to_u8(opacities[i] * 255.0f);
    float w = quats[i * 4], x = quats[i * 4 + 1], y = quats[i * 4 + 2],
          z = quats[i * 4 + 3];
    float norm = std::sqrt(w * w + x * x + y * y + z * z);
    if (norm < 1e-12f) norm = 1e-12f;
    row[28] = to_u8((w / norm) * 128.0f + 128.0f);
    row[29] = to_u8((-x / norm) * 128.0f + 128.0f);
    row[30] = to_u8((-y / norm) * 128.0f + 128.0f);
    row[31] = to_u8((z / norm) * 128.0f + 128.0f);
  }
}

// Header probe: returns vertex count (or -1) and the per-channel count of
// f_rest SH coefficients.
int64_t ply_info(const uint8_t* data, int64_t len, int32_t* n_sh_rest) {
  PlyHeader h;
  if (!parse_header(data, len, &h)) return -1;
  int rest = 0;
  for (const auto& p : h.props)
    if (p.name.rfind("f_rest_", 0) == 0) rest++;
  *n_sh_rest = rest;
  return h.vertex_count;
}

// Full .ply conversion with reference-exact activations. sh may be null
// (or max_sh_coeffs 0). Returns count or -1.
int64_t ply_parse(const uint8_t* data, int64_t len, int32_t importance_sort,
                  int32_t max_sh_coeffs, float* means, float* scales,
                  float* quats, float* colors, float* opacities, float* sh) {
  PlyHeader h;
  if (!parse_header(data, len, &h)) return -1;
  const int64_t n = h.vertex_count;
  const uint8_t* body = data + h.body_offset;
  if ((int64_t)(h.body_offset + n * h.row_stride) > len) return -1;

  const Property* px = h.find("x");
  const Property* py = h.find("y");
  const Property* pz = h.find("z");
  if (!px || !py || !pz) return -1;
  const Property* ps[3] = {h.find("scale_0"), h.find("scale_1"),
                           h.find("scale_2")};
  const Property* pr[4] = {h.find("rot_0"), h.find("rot_1"), h.find("rot_2"),
                           h.find("rot_3")};
  const Property* pdc[3] = {h.find("f_dc_0"), h.find("f_dc_1"),
                            h.find("f_dc_2")};
  const Property* prgb[3] = {h.find("red"), h.find("green"), h.find("blue")};
  const Property* pop = h.find("opacity");
  const bool has_scale = ps[0] && ps[1] && ps[2] && pr[0] && pr[1] && pr[2] &&
                         pr[3];

  std::vector<const Property*> rest;
  if (max_sh_coeffs > 0 && sh) {
    for (int i = 0;; ++i) {
      const Property* p = h.find(("f_rest_" + std::to_string(i)).c_str());
      if (!p) break;
      rest.push_back(p);
    }
  }
  const int per_chan = (int)rest.size() / 3;
  const int keep = std::min<int>(per_chan, max_sh_coeffs);

  // importance sort (index.js:653-669); stable to match the NumPy loader
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  if (importance_sort && has_scale) {
    std::vector<float> imp(n);
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t* row = body + i * h.row_stride;
      float size = std::exp((float)read_prop(row, *ps[0])) *
                   std::exp((float)read_prop(row, *ps[1])) *
                   std::exp((float)read_prop(row, *ps[2]));
      float op = pop ? sigmoidf((float)read_prop(row, *pop)) : 1.0f;
      imp[i] = size * op;
    }
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return imp[a] > imp[b]; });
  }

  for (int64_t j = 0; j < n; ++j) {
    const uint8_t* row = body + order[j] * h.row_stride;
    means[j * 3 + 0] = (float)read_prop(row, *px);
    means[j * 3 + 1] = (float)read_prop(row, *py);
    means[j * 3 + 2] = -(float)read_prop(row, *pz);  // framework Z flip
    float q[4] = {1.0f, 0.0f, 0.0f, 0.0f};
    if (has_scale) {
      for (int k = 0; k < 3; ++k)
        scales[j * 3 + k] = std::exp((float)read_prop(row, *ps[k]));
      float r0 = (float)read_prop(row, *pr[0]);
      float r1 = (float)read_prop(row, *pr[1]);
      float r2 = (float)read_prop(row, *pr[2]);
      float r3 = (float)read_prop(row, *pr[3]);
      float qn = std::sqrt(r0 * r0 + r1 * r1 + r2 * r2 + r3 * r3);
      if (qn < 1e-12f) qn = 1e-12f;
      q[0] = r0 / qn; q[1] = r1 / qn; q[2] = r2 / qn; q[3] = r3 / qn;
    } else {
      scales[j * 3] = scales[j * 3 + 1] = scales[j * 3 + 2] = 0.01f;
    }
    // framework convention: (w, -x, -y, z)
    quats[j * 4 + 0] = q[0];
    quats[j * 4 + 1] = -q[1];
    quats[j * 4 + 2] = -q[2];
    quats[j * 4 + 3] = q[3];
    if (pdc[0] && pdc[1] && pdc[2]) {
      for (int k = 0; k < 3; ++k) {
        float c = 0.5f + kShC0 * (float)read_prop(row, *pdc[k]);
        colors[j * 3 + k] = c < 0.0f ? 0.0f : c;
      }
    } else if (prgb[0] && prgb[1] && prgb[2]) {
      for (int k = 0; k < 3; ++k)
        colors[j * 3 + k] = (float)read_prop(row, *prgb[k]) / 255.0f;
    } else {
      colors[j * 3] = colors[j * 3 + 1] = colors[j * 3 + 2] = 0.5f;
    }
    opacities[j] = pop ? sigmoidf((float)read_prop(row, *pop)) : 1.0f;
    if (keep > 0) {
      // ply stores channel-major (3, per_chan); emit (keep, 3). Coefficients
      // of z-odd basis functions are negated: the framework's Z reflection
      // (index.js:350-354) flips their sign (band-local indices 1; 4, 6;
      // 9, 11, 13 — matching ply_format._SH_Z_ODD).
      for (int c = 0; c < keep; ++c) {
        const bool z_odd =
            (c == 1 || c == 4 || c == 6 || c == 9 || c == 11 || c == 13);
        for (int ch = 0; ch < 3; ++ch) {
          float v = (float)read_prop(row, *rest[ch * per_chan + c]);
          sh[(j * keep + c) * 3 + ch] = z_odd ? -v : v;
        }
      }
    }
  }
  return n;
}

}  // extern "C"
