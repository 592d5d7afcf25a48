// kgsampler: KG neighbor sampler + induced-subgraph builder (C ABI).
//
// TPU-native replacement for the reference's torch_geometric
// LinkNeighborLoader + make_subgraph pipeline (reference
// datasets/kg_dataset.py:172-250, utils/pyg_utils.py:94-145, both backed by
// libpyg's C++ samplers).  Differences by design:
//   * outputs are FIXED-CAPACITY padded arrays (max_nodes/max_edges) so the
//     device step compiles once — overflow is uniformly subsampled and
//     reported, never a shape change;
//   * seed edges are excluded from the induced subgraph (the reference's
//     `exclude=batch.input_id` semantics) so a query's own label edge never
//     leaks into its receptive field;
//   * deterministic per-batch seeding (splitmix from a user seed + batch id).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

struct Graph {
  int64_t n_nodes = 0;
  int64_t n_edges = 0;
  std::vector<int64_t> heads, tails, types;
  std::vector<uint8_t> train_mask;
  // CSR over outgoing edges: for node u, edge ids csr_idx[csr_off[u] ..)
  std::vector<int64_t> csr_off, csr_idx;
};

void build_csr(Graph &g) {
  g.csr_off.assign(g.n_nodes + 1, 0);
  for (int64_t e = 0; e < g.n_edges; ++e) g.csr_off[g.heads[e] + 1]++;
  for (int64_t u = 0; u < g.n_nodes; ++u) g.csr_off[u + 1] += g.csr_off[u];
  g.csr_idx.assign(g.n_edges, 0);
  std::vector<int64_t> cur(g.csr_off.begin(), g.csr_off.end() - 1);
  for (int64_t e = 0; e < g.n_edges; ++e) g.csr_idx[cur[g.heads[e]]++] = e;
}

}  // namespace

extern "C" {

void *kgs_create(const int64_t *heads, const int64_t *tails,
                 const int64_t *types, const uint8_t *train_mask,
                 int64_t n_edges, int64_t n_nodes) {
  auto *g = new Graph();
  g->n_nodes = n_nodes;
  g->n_edges = n_edges;
  g->heads.assign(heads, heads + n_edges);
  g->tails.assign(tails, tails + n_edges);
  g->types.assign(types, types + n_edges);
  g->train_mask.assign(train_mask, train_mask + n_edges);
  build_csr(*g);
  return g;
}

void kgs_destroy(void *h) { delete static_cast<Graph *>(h); }

// Sample a padded subgraph around the endpoints of `seed_edges`.
// Outputs (caller-allocated):
//   out_nodes      [max_nodes]    global node ids, padded with -1
//   out_edges      [max_edges*3]  (local head, type, local tail), pad -1
//   out_train_mask [max_edges]    1 if the edge is a train edge
//   out_queries    [n_seeds*3]    seed triples in LOCAL ids
// Returns 0 on success; fills n_nodes_out / n_edges_out with true counts
// (<= caps) and overflow_out with the number of induced edges dropped.
int64_t kgs_sample(void *h, const int64_t *seed_edges, int64_t n_seeds,
                   const int64_t *fanouts, int64_t n_hops, int64_t max_nodes,
                   int64_t max_edges, uint64_t rng_seed, int64_t *out_nodes,
                   int64_t *out_edges, uint8_t *out_train_mask,
                   int64_t *out_queries, int64_t *n_nodes_out,
                   int64_t *n_edges_out, int64_t *overflow_out) {
  const Graph &g = *static_cast<Graph *>(h);
  std::mt19937_64 rng(rng_seed * 0x9E3779B97F4A7C15ULL + 0xBF58476D1CE4E5B9ULL);

  std::unordered_map<int64_t, int64_t> local;  // global -> local id
  local.reserve(max_nodes * 2);
  std::vector<int64_t> nodes;
  nodes.reserve(max_nodes);
  auto add_node = [&](int64_t u) -> int64_t {
    auto it = local.find(u);
    if (it != local.end()) return it->second;
    if ((int64_t)nodes.size() >= max_nodes) return -1;
    int64_t id = nodes.size();
    local.emplace(u, id);
    nodes.push_back(u);
    return id;
  };

  // frontier = seed-edge endpoints.  Every seed endpoint MUST get a local
  // id: out_queries is written through local[], so a failed assignment
  // would silently alias local node 0 — error out (-2) instead.
  std::vector<int64_t> frontier;
  for (int64_t i = 0; i < n_seeds; ++i) {
    int64_t e = seed_edges[i];
    if (e < 0 || e >= g.n_edges) return -1;
    if (add_node(g.heads[e]) < 0) return -2;
    frontier.push_back(g.heads[e]);
    if (add_node(g.tails[e]) < 0) return -2;
    frontier.push_back(g.tails[e]);
  }

  // uniform without-replacement neighbor expansion per hop
  std::vector<int64_t> next;
  std::vector<int64_t> cand;
  for (int64_t hop = 0; hop < n_hops; ++hop) {
    next.clear();
    const int64_t k = fanouts[hop];
    for (int64_t u : frontier) {
      int64_t lo = g.csr_off[u], hi = g.csr_off[u + 1], deg = hi - lo;
      if (deg <= 0) continue;
      cand.clear();
      if (deg <= k) {
        for (int64_t p = lo; p < hi; ++p) cand.push_back(g.csr_idx[p]);
      } else {  // partial Fisher-Yates over the CSR window
        std::vector<int64_t> pool(g.csr_idx.begin() + lo, g.csr_idx.begin() + hi);
        for (int64_t j = 0; j < k; ++j) {
          std::uniform_int_distribution<int64_t> d(j, deg - 1);
          std::swap(pool[j], pool[d(rng)]);
          cand.push_back(pool[j]);
        }
      }
      for (int64_t e : cand) {
        int64_t v = g.tails[e];
        if (local.find(v) == local.end()) {
          if (add_node(v) < 0) break;
          next.push_back(v);
        }
      }
    }
    frontier.swap(next);
  }

  // induced subgraph: all edges between sampled nodes, minus seed edges,
  // capped at max_edges via reservoir sampling
  std::vector<uint8_t> is_seed(g.n_edges, 0);
  for (int64_t i = 0; i < n_seeds; ++i) is_seed[seed_edges[i]] = 1;

  std::vector<int64_t> kept;
  kept.reserve(max_edges);
  int64_t seen = 0;
  for (int64_t u_local = 0; u_local < (int64_t)nodes.size(); ++u_local) {
    int64_t u = nodes[u_local];
    for (int64_t p = g.csr_off[u]; p < g.csr_off[u + 1]; ++p) {
      int64_t e = g.csr_idx[p];
      if (is_seed[e]) continue;
      auto it = local.find(g.tails[e]);
      if (it == local.end()) continue;
      ++seen;
      if ((int64_t)kept.size() < max_edges) {
        kept.push_back(e);
      } else {
        std::uniform_int_distribution<int64_t> d(0, seen - 1);
        int64_t j = d(rng);
        if (j < max_edges) kept[j] = e;
      }
    }
  }
  *overflow_out = seen - (int64_t)kept.size();

  // write outputs
  for (int64_t i = 0; i < max_nodes; ++i)
    out_nodes[i] = i < (int64_t)nodes.size() ? nodes[i] : -1;
  for (int64_t i = 0; i < max_edges; ++i) {
    if (i < (int64_t)kept.size()) {
      int64_t e = kept[i];
      out_edges[3 * i + 0] = local[g.heads[e]];
      out_edges[3 * i + 1] = g.types[e];
      out_edges[3 * i + 2] = local[g.tails[e]];
      out_train_mask[i] = g.train_mask[e];
    } else {
      out_edges[3 * i + 0] = out_edges[3 * i + 1] = out_edges[3 * i + 2] = -1;
      out_train_mask[i] = 0;
    }
  }
  for (int64_t i = 0; i < n_seeds; ++i) {
    int64_t e = seed_edges[i];
    out_queries[3 * i + 0] = local[g.heads[e]];
    out_queries[3 * i + 1] = g.types[e];
    out_queries[3 * i + 2] = local[g.tails[e]];
  }
  *n_nodes_out = nodes.size();
  *n_edges_out = kept.size();
  return 0;
}

}  // extern "C"
