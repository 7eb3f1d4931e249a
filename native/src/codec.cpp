#include "toyslam/codec.h"

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <unordered_map>

namespace toyslam {
namespace {

constexpr uint32_t kVertexSe2 = 0;
constexpr uint32_t kVertexPoint2 = 1;
constexpr uint32_t kEdgeOdom = 0;
constexpr uint32_t kEdgeLandmark = 1;

struct Reader {
  const uint8_t* data;
  uint64_t len;
  uint64_t off = 0;
  bool ok = true;

  bool have(uint64_t n) {
    if (off + n > len) ok = false;
    return ok;
  }
  uint32_t u32() {
    if (!have(4)) return 0;
    uint32_t v;
    std::memcpy(&v, data + off, 4);
    off += 4;
    return v;
  }
  void f32(float* dst, uint64_t count) {
    if (!have(4 * count)) return;
    std::memcpy(dst, data + off, 4 * count);
    off += 4 * count;
  }
  void skip(uint64_t n) { have(n) ? (void)(off += n) : (void)0; }
};

void put_u32(std::vector<uint8_t>& out, uint32_t v) {
  const uint8_t* p = reinterpret_cast<const uint8_t*>(&v);
  out.insert(out.end(), p, p + 4);
}

void put_f32(std::vector<uint8_t>& out, const float* v, uint64_t count) {
  const uint8_t* p = reinterpret_cast<const uint8_t*>(v);
  out.insert(out.end(), p, p + 4 * count);
}

}  // namespace

TsGraph* decode_graph(const uint8_t* data, uint64_t len) {
  Reader r{data, len};

  // --- first pass over vertices to size the arrays ---
  const uint32_t n_vertices = r.u32();
  uint64_t vertex_section = r.off;
  uint32_t n_poses = 0, n_lms = 0;
  for (uint32_t k = 0; k < n_vertices && r.ok; ++k) {
    r.u32();  // id
    uint32_t type = r.u32();
    if (type == kVertexSe2) {
      ++n_poses;
      r.skip(12);
    } else if (type == kVertexPoint2) {
      ++n_lms;
      r.skip(8);
    } else {
      r.ok = false;
    }
  }
  if (!r.ok) return nullptr;

  // --- first pass over edges ---
  uint64_t edge_section = r.off;
  const uint32_t n_edges = r.u32();
  uint32_t n_odom = 0, n_lme = 0;
  for (uint32_t k = 0; k < n_edges && r.ok; ++k) {
    uint32_t type = r.u32();
    r.u32();
    r.u32();
    // meas block
    uint32_t rows = r.u32(), cols = r.u32();
    r.skip(4ull * (rows == 0 ? cols : rows * cols));
    // info block (diag: rows == 0)
    uint32_t irows = r.u32(), icols = r.u32();
    r.skip(4ull * (irows == 0 ? icols : irows * icols));
    if (type == kEdgeOdom) {
      ++n_odom;
    } else if (type == kEdgeLandmark) {
      ++n_lme;
    } else {
      r.ok = false;
    }
  }
  if (!r.ok) return nullptr;
  uint64_t fixed_section = r.off;
  const uint32_t n_fixed = r.u32();
  if (!r.have(4ull * n_fixed)) return nullptr;

  TsGraph* g = ts_graph_alloc(n_poses, n_lms, n_odom, n_lme, n_fixed);

  // --- fill vertices ---
  r = Reader{data, len, vertex_section};
  std::unordered_map<uint32_t, uint32_t> pose_index, lm_index;
  pose_index.reserve(n_poses);
  lm_index.reserve(n_lms);
  uint32_t pi = 0, li = 0;
  for (uint32_t k = 0; k < n_vertices; ++k) {
    uint32_t id = r.u32();
    uint32_t type = r.u32();
    if (type == kVertexSe2) {
      g->pose_ids[pi] = id;
      pose_index.emplace(id, pi);
      r.f32(g->poses + 3ull * pi, 3);
      ++pi;
    } else {
      g->lm_ids[li] = id;
      lm_index.emplace(id, li);
      r.f32(g->landmarks + 2ull * li, 2);
      ++li;
    }
  }

  // --- fill edges ---
  r = Reader{data, len, edge_section};
  r.u32();  // n_edges
  uint32_t oi = 0, lei = 0;
  for (uint32_t k = 0; k < n_edges && r.ok; ++k) {
    uint32_t type = r.u32();
    uint32_t id1 = r.u32();
    uint32_t id2 = r.u32();
    uint32_t rows = r.u32(), cols = r.u32();
    if (type == kEdgeOdom) {
      // measurement arrives as a 3x3 homogeneous transform
      if (rows != 3 || cols != 3) {
        r.ok = false;
        break;
      }
      float m[9];
      r.f32(m, 9);
      auto it1 = pose_index.find(id1);
      auto it2 = pose_index.find(id2);
      if (it1 == pose_index.end() || it2 == pose_index.end()) {
        r.ok = false;
        break;
      }
      g->odom_i[oi] = it1->second;
      g->odom_j[oi] = it2->second;
      g->odom_meas[3ull * oi + 0] = m[2];
      g->odom_meas[3ull * oi + 1] = m[5];
      g->odom_meas[3ull * oi + 2] =
          static_cast<float>(std::atan2(static_cast<double>(m[3]),
                                        static_cast<double>(m[0])));
      uint32_t irows = r.u32(), icols = r.u32();
      if (irows != 0 || icols != 3) {
        r.ok = false;
        break;
      }
      r.f32(g->odom_info + 3ull * oi, 3);
      ++oi;
    } else {
      // (range, bearing) vector: rows == 0, cols == 2
      if (rows != 0 || cols != 2) {
        r.ok = false;
        break;
      }
      r.f32(g->lme_meas + 2ull * lei, 2);
      auto it1 = pose_index.find(id1);
      auto it2 = lm_index.find(id2);
      if (it1 == pose_index.end() || it2 == lm_index.end()) {
        r.ok = false;
        break;
      }
      g->lme_pose[lei] = it1->second;
      g->lme_lm[lei] = it2->second;
      uint32_t irows = r.u32(), icols = r.u32();
      if (irows != 0 || icols != 2) {
        r.ok = false;
        break;
      }
      r.f32(g->lme_info + 2ull * lei, 2);
      ++lei;
    }
  }
  if (!r.ok) {
    ts_graph_free(g);
    return nullptr;
  }

  r = Reader{data, len, fixed_section};
  r.u32();
  for (uint32_t k = 0; k < n_fixed; ++k) g->fixed_ids[k] = r.u32();
  return g;
}

void encode_graph(const TsGraph& g, std::vector<uint8_t>& out) {
  put_u32(out, g.n_poses + g.n_landmarks);
  for (uint32_t p = 0; p < g.n_poses; ++p) {
    put_u32(out, g.pose_ids[p]);
    put_u32(out, kVertexSe2);
    put_f32(out, g.poses + 3ull * p, 3);
  }
  for (uint32_t l = 0; l < g.n_landmarks; ++l) {
    put_u32(out, g.lm_ids[l]);
    put_u32(out, kVertexPoint2);
    put_f32(out, g.landmarks + 2ull * l, 2);
  }

  put_u32(out, g.n_odom + g.n_lm_edges);
  for (uint32_t e = 0; e < g.n_odom; ++e) {
    put_u32(out, kEdgeOdom);
    put_u32(out, g.pose_ids[g.odom_i[e]]);
    put_u32(out, g.pose_ids[g.odom_j[e]]);
    const float* xyt = g.odom_meas + 3ull * e;
    const double th = static_cast<double>(xyt[2]);
    float c = static_cast<float>(std::cos(th));
    float s = static_cast<float>(std::sin(th));
    float m[9] = {c, -s, xyt[0], s, c, xyt[1], 0.0f, 0.0f, 1.0f};
    put_u32(out, 3);
    put_u32(out, 3);
    put_f32(out, m, 9);
    put_u32(out, 0);  // diag-encoded information
    put_u32(out, 3);
    put_f32(out, g.odom_info + 3ull * e, 3);
  }
  for (uint32_t e = 0; e < g.n_lm_edges; ++e) {
    put_u32(out, kEdgeLandmark);
    put_u32(out, g.pose_ids[g.lme_pose[e]]);
    put_u32(out, g.lm_ids[g.lme_lm[e]]);
    put_u32(out, 0);  // vector measurement
    put_u32(out, 2);
    put_f32(out, g.lme_meas + 2ull * e, 2);
    put_u32(out, 0);
    put_u32(out, 2);
    put_f32(out, g.lme_info + 2ull * e, 2);
  }

  put_u32(out, g.n_fixed);
  for (uint32_t k = 0; k < g.n_fixed; ++k) put_u32(out, g.fixed_ids[k]);
}

}  // namespace toyslam

extern "C" {

TsGraph* ts_graph_alloc(uint32_t n_poses, uint32_t n_landmarks,
                        uint32_t n_odom, uint32_t n_lm_edges,
                        uint32_t n_fixed) {
  TsGraph* g = new TsGraph();
  g->n_poses = n_poses;
  g->n_landmarks = n_landmarks;
  g->n_odom = n_odom;
  g->n_lm_edges = n_lm_edges;
  g->n_fixed = n_fixed;
  g->poses = static_cast<float*>(std::calloc(3ull * n_poses, 4));
  g->pose_ids = static_cast<uint32_t*>(std::calloc(n_poses, 4));
  g->landmarks = static_cast<float*>(std::calloc(2ull * n_landmarks, 4));
  g->lm_ids = static_cast<uint32_t*>(std::calloc(n_landmarks, 4));
  g->odom_i = static_cast<uint32_t*>(std::calloc(n_odom, 4));
  g->odom_j = static_cast<uint32_t*>(std::calloc(n_odom, 4));
  g->odom_meas = static_cast<float*>(std::calloc(3ull * n_odom, 4));
  g->odom_info = static_cast<float*>(std::calloc(3ull * n_odom, 4));
  g->lme_pose = static_cast<uint32_t*>(std::calloc(n_lm_edges, 4));
  g->lme_lm = static_cast<uint32_t*>(std::calloc(n_lm_edges, 4));
  g->lme_meas = static_cast<float*>(std::calloc(2ull * n_lm_edges, 4));
  g->lme_info = static_cast<float*>(std::calloc(2ull * n_lm_edges, 4));
  g->fixed_ids = static_cast<uint32_t*>(std::calloc(n_fixed, 4));
  return g;
}

void ts_graph_free(TsGraph* g) {
  if (!g) return;
  std::free(g->poses);
  std::free(g->pose_ids);
  std::free(g->landmarks);
  std::free(g->lm_ids);
  std::free(g->odom_i);
  std::free(g->odom_j);
  std::free(g->odom_meas);
  std::free(g->odom_info);
  std::free(g->lme_pose);
  std::free(g->lme_lm);
  std::free(g->lme_meas);
  std::free(g->lme_info);
  std::free(g->fixed_ids);
  delete g;
}

}  // extern "C"
