// dvm_native: host-side data-pipeline kernels for dvmatcher_tpu.
//
// TPU-native replacement for the reference's native host dependencies
// (potpourri3d OFF IO + heat geodesics, scipy KDTree/Dijkstra usage):
//   * read_off        — fast OFF mesh/point parser
//   * dijkstra_all    — all-pairs shortest paths over a sparse graph,
//                       OpenMP-parallel over source vertices (the geodesic
//                       supervision matrices, dataset.py:49-54 equivalent)
//   * fps             — farthest point sampling (models/model.py:48-63)
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- OFF IO
// Parses header + vertices (+ triangle faces). Returns 0 on success.
// Caller passes pre-read counts via read_off_header, then buffers.
int read_off_header(const char* path, int64_t* n_verts, int64_t* n_faces) {
  FILE* f = fopen(path, "r");
  if (!f) return 1;
  char tok[256];
  if (fscanf(f, "%255s", tok) != 1 || strncmp(tok, "OFF", 3) != 0) {
    fclose(f);
    return 2;
  }
  long nv, nf, ne;
  if (fscanf(f, "%ld %ld %ld", &nv, &nf, &ne) != 3) {
    fclose(f);
    return 3;
  }
  *n_verts = nv;
  *n_faces = nf;
  fclose(f);
  return 0;
}

int read_off_data(const char* path, int64_t n_verts, int64_t n_faces,
                  float* verts /* n_verts*3 */, int32_t* faces /* n_faces*3 */) {
  FILE* f = fopen(path, "r");
  if (!f) return 1;
  char tok[256];
  fscanf(f, "%255s", tok);
  long nv, nf, ne;
  fscanf(f, "%ld %ld %ld", &nv, &nf, &ne);
  for (int64_t i = 0; i < n_verts; i++) {
    double x, y, z;
    if (fscanf(f, "%lf %lf %lf", &x, &y, &z) != 3) {
      fclose(f);
      return 4;
    }
    verts[i * 3 + 0] = (float)x;
    verts[i * 3 + 1] = (float)y;
    verts[i * 3 + 2] = (float)z;
  }
  for (int64_t i = 0; i < n_faces; i++) {
    long k, a, b, c;
    if (fscanf(f, "%ld %ld %ld %ld", &k, &a, &b, &c) != 4 || k != 3) {
      fclose(f);
      return 5;
    }
    faces[i * 3 + 0] = (int32_t)a;
    faces[i * 3 + 1] = (int32_t)b;
    faces[i * 3 + 2] = (int32_t)c;
  }
  fclose(f);
  return 0;
}

// ------------------------------------------------------ all-pairs Dijkstra
// CSR graph (undirected edges must appear in both directions).
// out is row-major (n, n) float32. Parallel over sources with OpenMP.
void dijkstra_all(int64_t n, const int64_t* indptr, const int32_t* indices,
                  const float* weights, float* out) {
#pragma omp parallel
  {
    std::vector<float> dist(n);
    using QE = std::pair<float, int32_t>;
#pragma omp for schedule(dynamic, 8)
    for (int64_t s = 0; s < n; s++) {
      std::fill(dist.begin(), dist.end(), INFINITY);
      std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
      dist[s] = 0.f;
      pq.push({0.f, (int32_t)s});
      while (!pq.empty()) {
        auto [d, u] = pq.top();
        pq.pop();
        if (d > dist[u]) continue;
        for (int64_t e = indptr[u]; e < indptr[u + 1]; e++) {
          int32_t v = indices[e];
          float nd = d + weights[e];
          if (nd < dist[v]) {
            dist[v] = nd;
            pq.push({nd, v});
          }
        }
      }
      memcpy(out + s * n, dist.data(), n * sizeof(float));
    }
  }
}

// ------------------------------------------------------------------- FPS
// Farthest point sampling with the reference's update rule; out gets
// npoint indices starting at `start`.
void fps(const float* pts, int64_t n, int64_t npoint, int64_t start,
         int64_t* out) {
  std::vector<float> mind(n, 1e10f);
  int64_t far = start;
  for (int64_t i = 0; i < npoint; i++) {
    out[i] = far;
    const float cx = pts[far * 3], cy = pts[far * 3 + 1], cz = pts[far * 3 + 2];
    float best = -1.f;
    int64_t bestj = 0;
    for (int64_t j = 0; j < n; j++) {
      const float dx = pts[j * 3] - cx, dy = pts[j * 3 + 1] - cy,
                  dz = pts[j * 3 + 2] - cz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < mind[j]) mind[j] = d;
      if (mind[j] > best) {
        best = mind[j];
        bestj = j;
      }
    }
    far = bestj;
  }
}

}  // extern "C"
