// Native place-recognition scoring core (dpvo_tpu).
//
// C++ equivalent of the reference's DPRetrieval extension
// (DPRetrieval/src/main.cpp:39-139), which wraps DBoW2's OrbDatabase.
// Instead of a vocabulary tree we score binary ORB descriptors
// directly: for a query frame, each database frame gets
//
//   score(q, d) = (1/|q|) * sum_{k in q} max_{l in d} sim(k, l)
//   sim(k, l)   = 1 - popcount(k ^ l) / 256
//
// computed with 64-bit popcounts over the 32-byte descriptors. This is
// the same best-match-per-descriptor similarity DBoW2 approximates via
// its tree, exact instead of quantized; frames are capped at 512
// descriptors so a query against 2000 stored frames is ~50M popcounts.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_MSC_VER)
#include <intrin.h>
static inline int popcount64(uint64_t x) { return (int)__popcnt64(x); }
#else
static inline int popcount64(uint64_t x) { return __builtin_popcountll(x); }
#endif

namespace {

struct Frame {
  std::vector<uint64_t> desc;  // ndesc x 4 words (32 bytes each)
  int ndesc = 0;
};

struct Database {
  std::vector<Frame> frames;
};

}  // namespace

extern "C" {

void* retrieval_create() { return new Database(); }

void retrieval_destroy(void* db) { delete static_cast<Database*>(db); }

// Insert a frame's descriptors: data is [ndesc, 32] uint8 row-major.
// Returns the frame index.
int retrieval_insert(void* dbp, const uint8_t* data, int ndesc) {
  Database* db = static_cast<Database*>(dbp);
  Frame f;
  f.ndesc = ndesc;
  f.desc.resize((size_t)ndesc * 4);
  std::memcpy(f.desc.data(), data, (size_t)ndesc * 32);
  db->frames.push_back(std::move(f));
  return (int)db->frames.size() - 1;
}

int retrieval_size(void* dbp) {
  return (int)static_cast<Database*>(dbp)->frames.size();
}

// Score query descriptors against all frames with index <= max_index.
// scores must hold retrieval_size() floats; frames beyond max_index
// (and empty frames) get -1.
void retrieval_query(void* dbp, const uint8_t* qdata, int nq, int max_index,
                     float* scores) {
  Database* db = static_cast<Database*>(dbp);
  const int nframes = (int)db->frames.size();
  std::vector<uint64_t> q((size_t)nq * 4);
  std::memcpy(q.data(), qdata, (size_t)nq * 32);

  for (int fi = 0; fi < nframes; fi++) {
    if (fi > max_index || db->frames[fi].ndesc == 0 || nq == 0) {
      scores[fi] = -1.0f;
      continue;
    }
    const Frame& f = db->frames[fi];
    double total = 0.0;
    for (int k = 0; k < nq; k++) {
      const uint64_t* qk = &q[(size_t)k * 4];
      int best = 256;
      for (int l = 0; l < f.ndesc; l++) {
        const uint64_t* dl = &f.desc[(size_t)l * 4];
        int dist = popcount64(qk[0] ^ dl[0]) + popcount64(qk[1] ^ dl[1]) +
                   popcount64(qk[2] ^ dl[2]) + popcount64(qk[3] ^ dl[3]);
        if (dist < best) best = dist;
      }
      total += 1.0 - best / 256.0;
    }
    scores[fi] = (float)(total / nq);
  }
}

// Brute-force hamming KNN (k=2) of a onto b for Lowe-style ratio tests
// (ref DPRetrieval/src/main.cpp:94-119 match_pair). Outputs per query:
// best index, best dist, second dist.
void retrieval_match(const uint8_t* a, int na, const uint8_t* b, int nb,
                     int32_t* best_idx, int32_t* best_dist, int32_t* second_dist) {
  std::vector<uint64_t> aw((size_t)na * 4), bw((size_t)nb * 4);
  std::memcpy(aw.data(), a, (size_t)na * 32);
  std::memcpy(bw.data(), b, (size_t)nb * 32);
  for (int i = 0; i < na; i++) {
    const uint64_t* ai = &aw[(size_t)i * 4];
    int b1 = 257, b2 = 257, bi = -1;
    for (int j = 0; j < nb; j++) {
      const uint64_t* bj = &bw[(size_t)j * 4];
      int d = popcount64(ai[0] ^ bj[0]) + popcount64(ai[1] ^ bj[1]) +
              popcount64(ai[2] ^ bj[2]) + popcount64(ai[3] ^ bj[3]);
      if (d < b1) { b2 = b1; b1 = d; bi = j; }
      else if (d < b2) { b2 = d; }
    }
    best_idx[i] = bi;
    best_dist[i] = b1;
    second_dist[i] = b2;
  }
}

}  // extern "C"
