// Threaded evaluator for traced zerocheck combiner DAGs (ops/symtrace.py).
//
// The host ZerocheckProver sweeps its combiner degree+1 times per round as
// dozens of full-width numpy temporaries; this executor runs the same DAG
// chunk-at-a-time so every intermediate stays L1/L2-resident, across all
// cores.  Node opcodes match symtrace: 0 COL, 1 CONST, 2 ZERO, 3 ADD,
// 4 SUB, 5 MUL.  BabyBear-only (constexpr modulus lets the compiler turn
// every % into a multiply-shift); all values canonical < p.
//
// zigz_dag_round computes one zerocheck round's evaluations with the host
// prover's exact schedule: g(0) from the lo halves, g(2..d) from
// incremental +delta sweeps (g(1) is derived from the claim by the
// caller).  zigz_dag_fold folds all rows in place: lo + r*(hi - lo).

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

static constexpr uint64_t P = 2013265921ull;

static inline uint32_t addm(uint32_t a, uint32_t b) {
  uint32_t s = a + b;  // a, b < P < 2^31: no u32 overflow
  return s >= P ? s - (uint32_t)P : s;
}
static inline uint32_t subm(uint32_t a, uint32_t b) {
  return a >= b ? a - b : a + (uint32_t)P - b;
}
static inline uint32_t mulm(uint32_t a, uint32_t b) {
  return (uint32_t)(((uint64_t)a * b) % P);
}

namespace {

constexpr size_t CHUNK = 1024;

struct DagSpec {
  const int32_t* ops;
  const int32_t* arga;
  const int32_t* argb;
  const int32_t* slot;
  const int32_t* colrow;  // row index for COL nodes, -1 otherwise
  size_t num_nodes;
  const uint32_t* consts;
};

// Evaluate the DAG over one chunk. cols[r] points at the current value of
// row r for this chunk; slots is (num_slots, CHUNK) scratch.
void eval_dag(const DagSpec& d, const uint32_t* const* cols, uint32_t* slots,
              size_t len) {
  for (size_t i = 0; i < d.num_nodes; ++i) {
    uint32_t* out = slots + (size_t)d.slot[i] * CHUNK;
    switch (d.ops[i]) {
      case 0:  // COL
        std::memcpy(out, cols[d.colrow[i]], len * sizeof(uint32_t));
        break;
      case 1: {  // CONST
        uint32_t v = d.consts[d.arga[i]];
        for (size_t k = 0; k < len; ++k) out[k] = v;
        break;
      }
      case 2:  // ZERO
        std::memset(out, 0, len * sizeof(uint32_t));
        break;
      case 3: {  // ADD
        const uint32_t* x = slots + (size_t)d.slot[d.arga[i]] * CHUNK;
        const uint32_t* y = slots + (size_t)d.slot[d.argb[i]] * CHUNK;
        for (size_t k = 0; k < len; ++k) out[k] = addm(x[k], y[k]);
        break;
      }
      case 4: {  // SUB
        const uint32_t* x = slots + (size_t)d.slot[d.arga[i]] * CHUNK;
        const uint32_t* y = slots + (size_t)d.slot[d.argb[i]] * CHUNK;
        for (size_t k = 0; k < len; ++k) out[k] = subm(x[k], y[k]);
        break;
      }
      default: {  // MUL
        const uint32_t* x = slots + (size_t)d.slot[d.arga[i]] * CHUNK;
        const uint32_t* y = slots + (size_t)d.slot[d.argb[i]] * CHUNK;
        for (size_t k = 0; k < len; ++k) out[k] = mulm(x[k], y[k]);
        break;
      }
    }
  }
}

// Split [0, n) into chunk-aligned thread ranges.
void run_parallel(size_t n, int num_threads,
                  const std::function<void(size_t, size_t, int)>& fn) {
  size_t want = num_threads > 0 ? (size_t)num_threads : 1;
  size_t nchunks = (n + CHUNK - 1) / CHUNK;
  size_t nthreads = nchunks < want ? (nchunks ? nchunks : 1) : want;
  if (nthreads <= 1) {
    fn(0, n, 0);
    return;
  }
  std::vector<std::thread> threads;
  size_t per = ((nchunks + nthreads - 1) / nthreads) * CHUNK;
  for (size_t t = 0; t < nthreads; ++t) {
    size_t lo = t * per;
    size_t hi = lo + per < n ? lo + per : n;
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi, (int)t);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

// stacked: (nrows, stride) row-major canonical uint32; the current table
// width n <= stride occupies the first n entries of each row.  eq_row is
// the eq-table row index; the DAG reads rows via its colrow mapping.
// out receives `degree` values: g(0), g(2), ..., g(degree).
extern "C" void zigz_dag_round(
    const uint32_t* stacked, size_t stride, size_t nrows, size_t n,
    const int32_t* ops, const int32_t* arga, const int32_t* argb,
    const int32_t* slot, const int32_t* colrow, size_t num_nodes,
    size_t num_slots, const uint32_t* consts, int32_t out_slot,
    int32_t eq_row, int degree, uint64_t* out, int num_threads) {
  size_t half = n / 2;
  int nt = num_threads > 0 ? num_threads : 1;
  std::vector<std::vector<uint64_t>> accs((size_t)nt,
                                          std::vector<uint64_t>((size_t)degree, 0));
  DagSpec d{ops, arga, argb, slot, colrow, num_nodes, consts};

  run_parallel(half, num_threads, [&](size_t lo, size_t hi, int tid) {
    std::vector<uint32_t> slots(num_slots * CHUNK);
    std::vector<uint32_t> cur(nrows * CHUNK);
    std::vector<uint32_t> delta(nrows * CHUNK);
    std::vector<const uint32_t*> cols(nrows);
    uint64_t* acc = accs[(size_t)tid].data();

    for (size_t s = lo; s < hi; s += CHUNK) {
      size_t len = (s + CHUNK < hi) ? CHUNK : hi - s;

      // t = 0: columns read the lo halves in place.
      for (size_t r = 0; r < nrows; ++r) cols[r] = stacked + r * stride + s;
      eval_dag(d, cols.data(), slots.data(), len);
      {
        const uint32_t* eq = stacked + (size_t)eq_row * stride + s;
        const uint32_t* v = slots.data() + (size_t)out_slot * CHUNK;
        uint64_t a = 0;
        for (size_t k = 0; k < len; ++k) a += ((uint64_t)eq[k] * v[k]) % P;
        acc[0] += a % P;
      }

      if (degree >= 2) {
        // cur = hi halves (t = 1), delta = hi - lo.
        for (size_t r = 0; r < nrows; ++r) {
          const uint32_t* plo = stacked + r * stride + s;
          const uint32_t* phi = plo + half;
          uint32_t* c = cur.data() + r * CHUNK;
          uint32_t* dl = delta.data() + r * CHUNK;
          for (size_t k = 0; k < len; ++k) {
            c[k] = phi[k];
            dl[k] = subm(phi[k], plo[k]);
          }
          cols[r] = c;
        }
        for (int t = 2; t <= degree; ++t) {
          for (size_t r = 0; r < nrows; ++r) {
            uint32_t* c = cur.data() + r * CHUNK;
            const uint32_t* dl = delta.data() + r * CHUNK;
            for (size_t k = 0; k < len; ++k) c[k] = addm(c[k], dl[k]);
          }
          eval_dag(d, cols.data(), slots.data(), len);
          const uint32_t* eq = cur.data() + (size_t)eq_row * CHUNK;
          const uint32_t* v = slots.data() + (size_t)out_slot * CHUNK;
          uint64_t a = 0;
          for (size_t k = 0; k < len; ++k) a += ((uint64_t)eq[k] * v[k]) % P;
          acc[t - 1] += a % P;
        }
      }
    }
  });

  for (int j = 0; j < degree; ++j) {
    uint64_t total = 0;
    for (auto& a : accs) total = (total + a[(size_t)j]) % P;
    out[j] = total;
  }
}

// Multi-output round for the EXTENSION zerocheck (BabyBear^4, X^4 = 11):
// the traced DAG already contains the eq*C product, its 4 coordinate
// outputs are plain base rows, so this is zigz_dag_round minus the eq
// multiplication, accumulating `num_out` slot sums per t.  out receives
// degree * num_out values laid out [t][coord]: g(0), g(2), ..., g(degree)
// (g(1) is derived from the running claim by the caller).
extern "C" void zigz_dag_round_multi(
    const uint32_t* stacked, size_t stride, size_t nrows, size_t n,
    const int32_t* ops, const int32_t* arga, const int32_t* argb,
    const int32_t* slot, const int32_t* colrow, size_t num_nodes,
    size_t num_slots, const uint32_t* consts, const int32_t* out_slots,
    int num_out, int degree, uint64_t* out, int num_threads) {
  size_t half = n / 2;
  int nt = num_threads > 0 ? num_threads : 1;
  size_t cells = (size_t)degree * (size_t)num_out;
  std::vector<std::vector<uint64_t>> accs((size_t)nt,
                                          std::vector<uint64_t>(cells, 0));
  DagSpec d{ops, arga, argb, slot, colrow, num_nodes, consts};

  run_parallel(half, num_threads, [&](size_t lo, size_t hi, int tid) {
    std::vector<uint32_t> slots(num_slots * CHUNK);
    std::vector<uint32_t> cur(nrows * CHUNK);
    std::vector<uint32_t> delta(nrows * CHUNK);
    std::vector<const uint32_t*> cols(nrows);
    uint64_t* acc = accs[(size_t)tid].data();

    for (size_t s = lo; s < hi; s += CHUNK) {
      size_t len = (s + CHUNK < hi) ? CHUNK : hi - s;

      for (size_t r = 0; r < nrows; ++r) cols[r] = stacked + r * stride + s;
      eval_dag(d, cols.data(), slots.data(), len);
      for (int e = 0; e < num_out; ++e) {
        const uint32_t* v = slots.data() + (size_t)out_slots[e] * CHUNK;
        uint64_t a = 0;
        for (size_t k = 0; k < len; ++k) a += v[k];
        acc[e] = (acc[e] + a) % P;
      }

      if (degree >= 2) {
        for (size_t r = 0; r < nrows; ++r) {
          const uint32_t* plo = stacked + r * stride + s;
          const uint32_t* phi = plo + half;
          uint32_t* c = cur.data() + r * CHUNK;
          uint32_t* dl = delta.data() + r * CHUNK;
          for (size_t k = 0; k < len; ++k) {
            c[k] = phi[k];
            dl[k] = subm(phi[k], plo[k]);
          }
          cols[r] = c;
        }
        for (int t = 2; t <= degree; ++t) {
          for (size_t r = 0; r < nrows; ++r) {
            uint32_t* c = cur.data() + r * CHUNK;
            const uint32_t* dl = delta.data() + r * CHUNK;
            for (size_t k = 0; k < len; ++k) c[k] = addm(c[k], dl[k]);
          }
          eval_dag(d, cols.data(), slots.data(), len);
          for (int e = 0; e < num_out; ++e) {
            const uint32_t* v = slots.data() + (size_t)out_slots[e] * CHUNK;
            uint64_t a = 0;
            for (size_t k = 0; k < len; ++k) a += v[k];
            size_t cell = (size_t)(t - 1) * num_out + e;
            acc[cell] = (acc[cell] + a) % P;
          }
        }
      }
    }
  });

  for (size_t c = 0; c < cells; ++c) {
    uint64_t total = 0;
    for (auto& a : accs) total = (total + a[c]) % P;
    out[c] = total;
  }
}

// In-place MSB fold with an EXTENSION challenge r (4 canonical coords,
// X^4 = 11): rows come in 4-row coordinate groups; for each group
// new = lo + r*(hi - lo) as BabyBear^4 elements.
extern "C" void zigz_dag_fold_ext(uint32_t* stacked, size_t stride,
                                  size_t ngroups, size_t n,
                                  const uint64_t* r4, int num_threads) {
  size_t half = n / 2;
  uint32_t r0 = (uint32_t)(r4[0] % P), r1 = (uint32_t)(r4[1] % P);
  uint32_t r2 = (uint32_t)(r4[2] % P), r3 = (uint32_t)(r4[3] % P);
  run_parallel(half, num_threads, [&](size_t lo, size_t hi, int) {
    for (size_t g = 0; g < ngroups; ++g) {
      uint32_t* b0 = stacked + (g * 4 + 0) * stride;
      uint32_t* b1 = stacked + (g * 4 + 1) * stride;
      uint32_t* b2 = stacked + (g * 4 + 2) * stride;
      uint32_t* b3 = stacked + (g * 4 + 3) * stride;
      for (size_t i = lo; i < hi; ++i) {
        uint32_t d0 = subm(b0[half + i], b0[i]);
        uint32_t d1 = subm(b1[half + i], b1[i]);
        uint32_t d2 = subm(b2[half + i], b2[i]);
        uint32_t d3 = subm(b3[half + i], b3[i]);
        // (r * d) with X^4 = 11, each partial reduced before accumulation.
        uint32_t p0 = addm(mulm(r0, d0),
                           mulm(11u, addm(addm(mulm(r1, d3), mulm(r2, d2)),
                                          mulm(r3, d1))));
        uint32_t p1 = addm(addm(mulm(r0, d1), mulm(r1, d0)),
                           mulm(11u, addm(mulm(r2, d3), mulm(r3, d2))));
        uint32_t p2 = addm(addm(mulm(r0, d2), mulm(r1, d1)),
                           addm(mulm(r2, d0), mulm(11u, mulm(r3, d3))));
        uint32_t p3 = addm(addm(mulm(r0, d3), mulm(r1, d2)),
                           addm(mulm(r2, d1), mulm(r3, d0)));
        b0[i] = addm(b0[i], p0);
        b1[i] = addm(b1[i], p1);
        b2[i] = addm(b2[i], p2);
        b3[i] = addm(b3[i], p3);
      }
    }
  });
}

// In-place MSB fold of every row: row[i] = row[i] + r*(row[half+i] -
// row[i]) mod P for i < n/2.  Row stride stays fixed; the caller tracks
// the shrinking width.
extern "C" void zigz_dag_fold(uint32_t* stacked, size_t stride, size_t nrows,
                              size_t n, uint64_t r, int num_threads) {
  size_t half = n / 2;
  uint32_t rr = (uint32_t)(r % P);
  run_parallel(half, num_threads, [&](size_t lo, size_t hi, int) {
    for (size_t row = 0; row < nrows; ++row) {
      uint32_t* base = stacked + row * stride;
      for (size_t i = lo; i < hi; ++i) {
        uint32_t lo32 = base[i];
        uint32_t hi32 = base[half + i];
        base[i] = addm(lo32, mulm(rr, subm(hi32, lo32)));
      }
    }
  });
}

// Round-1 -> rounds-2+ layout transition for the hybrid ext zerocheck:
// fold BASE rows (single coordinate row each) with an extension r into
// 4-row coordinate groups of a fresh matrix.  new = lo + r*(hi - lo)
// where lo/hi are base: coordinate e of the result is lo*[e==0] + r_e*d.
extern "C" void zigz_dag_fold_base_to_ext(
    const uint32_t* in, size_t in_stride, size_t nrows, size_t n,
    uint32_t* out, size_t out_stride, const uint64_t* r4, int num_threads) {
  size_t half = n / 2;
  uint32_t r0 = (uint32_t)(r4[0] % P), r1 = (uint32_t)(r4[1] % P);
  uint32_t r2 = (uint32_t)(r4[2] % P), r3 = (uint32_t)(r4[3] % P);
  run_parallel(half, num_threads, [&](size_t lo, size_t hi, int) {
    for (size_t row = 0; row < nrows; ++row) {
      const uint32_t* src = in + row * in_stride;
      uint32_t* o0 = out + (row * 4 + 0) * out_stride;
      uint32_t* o1 = out + (row * 4 + 1) * out_stride;
      uint32_t* o2 = out + (row * 4 + 2) * out_stride;
      uint32_t* o3 = out + (row * 4 + 3) * out_stride;
      for (size_t i = lo; i < hi; ++i) {
        uint32_t l = src[i];
        uint32_t d = subm(src[half + i], l);
        o0[i] = addm(l, mulm(r0, d));
        o1[i] = mulm(r1, d);
        o2[i] = mulm(r2, d);
        o3[i] = mulm(r3, d);
      }
    }
  });
}

// Out-of-place variant of zigz_dag_fold_ext: fold 4-row coordinate
// groups of ``in`` into the corresponding groups of ``out``.
extern "C" void zigz_dag_fold_ext_to(
    const uint32_t* in, size_t in_stride, size_t ngroups, size_t n,
    uint32_t* out, size_t out_stride, const uint64_t* r4, int num_threads) {
  size_t half = n / 2;
  uint32_t r0 = (uint32_t)(r4[0] % P), r1 = (uint32_t)(r4[1] % P);
  uint32_t r2 = (uint32_t)(r4[2] % P), r3 = (uint32_t)(r4[3] % P);
  run_parallel(half, num_threads, [&](size_t lo, size_t hi, int) {
    for (size_t g = 0; g < ngroups; ++g) {
      const uint32_t* s0 = in + (g * 4 + 0) * in_stride;
      const uint32_t* s1 = in + (g * 4 + 1) * in_stride;
      const uint32_t* s2 = in + (g * 4 + 2) * in_stride;
      const uint32_t* s3 = in + (g * 4 + 3) * in_stride;
      uint32_t* o0 = out + (g * 4 + 0) * out_stride;
      uint32_t* o1 = out + (g * 4 + 1) * out_stride;
      uint32_t* o2 = out + (g * 4 + 2) * out_stride;
      uint32_t* o3 = out + (g * 4 + 3) * out_stride;
      for (size_t i = lo; i < hi; ++i) {
        uint32_t d0 = subm(s0[half + i], s0[i]);
        uint32_t d1 = subm(s1[half + i], s1[i]);
        uint32_t d2 = subm(s2[half + i], s2[i]);
        uint32_t d3 = subm(s3[half + i], s3[i]);
        uint32_t p0 = addm(mulm(r0, d0),
                           mulm(11u, addm(addm(mulm(r1, d3), mulm(r2, d2)),
                                          mulm(r3, d1))));
        uint32_t p1 = addm(addm(mulm(r0, d1), mulm(r1, d0)),
                           mulm(11u, addm(mulm(r2, d3), mulm(r3, d2))));
        uint32_t p2 = addm(addm(mulm(r0, d2), mulm(r1, d1)),
                           addm(mulm(r2, d0), mulm(11u, mulm(r3, d3))));
        uint32_t p3 = addm(addm(mulm(r0, d3), mulm(r1, d2)),
                           addm(mulm(r2, d1), mulm(r3, d0)));
        o0[i] = addm(s0[i], p0);
        o1[i] = addm(s1[i], p1);
        o2[i] = addm(s2[i], p2);
        o3[i] = addm(s3[i], p3);
      }
    }
  });
}
