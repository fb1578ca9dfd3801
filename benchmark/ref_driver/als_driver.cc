// Standalone driver for the REFERENCE buffalo C++ ALS core
// (/root/reference/lib/algo_impl/als/als.cc), built WITHOUT the Cython
// layer (not available in this environment).  Used only to produce
// cross-implementation accuracy-parity evidence: train the reference
// core and buffalo_tpu on identical synthetic data and compare
// NDCG/MAP/AUC (benchmark/accuracy.md).
//
// Protocol mirrors buffalo/algo/als.py::train/_iterate: per epoch,
// precompute(axis) then one whole-CSR partial_update per axis (the
// Python driver streams batches; one batch covering all rows is the
// same computation).
//
// Input (binary, little-endian), path in argv[2]:
//   int32 U, I, D, iters
//   int64 row_ends[U]; int32 row_keys[nnz]; float row_vals[nnz]
//   int64 col_ends[I]; int32 col_keys[nnz]; float col_vals[nnz]
//   float P0[U*D]; float Q0[I*D]
// argv[1] = option JSON path.  Output: argv[3] = P then Q raw floats.
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <vector>
#include "buffalo/algo_impl/als/als.hpp"

template <typename T> std::vector<T> rd(FILE* f, size_t n) {
    std::vector<T> v(n);
    if (fread(v.data(), sizeof(T), n, f) != n) { perror("fread"); exit(1); }
    return v;
}

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s opt.json data.bin out.bin\n", argv[0]); return 1; }
    FILE* f = fopen(argv[2], "rb");
    if (!f) { perror("data"); return 1; }
    auto hdr = rd<int32_t>(f, 4);
    int U = hdr[0], I = hdr[1], D = hdr[2], iters = hdr[3];
    auto r_ends = rd<int64_t>(f, U);
    size_t nnz = (size_t)r_ends[U - 1];
    auto r_keys = rd<int32_t>(f, nnz);
    auto r_vals = rd<float>(f, nnz);
    auto c_ends = rd<int64_t>(f, I);
    auto c_keys = rd<int32_t>(f, nnz);
    auto c_vals = rd<float>(f, nnz);
    auto P = rd<float>(f, (size_t)U * D);
    auto Q = rd<float>(f, (size_t)I * D);
    fclose(f);

    als::CALS m;
    if (!m.init(argv[1])) { fprintf(stderr, "init failed\n"); return 1; }
    m.initialize_model(P.data(), U, Q.data(), I);
    for (int it = 0; it < iters; ++it) {
        m.precompute(0);
        m.partial_update(0, U, r_ends.data(), r_keys.data(), r_vals.data(), 0);
        m.precompute(1);
        auto nd = m.partial_update(0, I, c_ends.data(), c_keys.data(), c_vals.data(), 1);
        double rmse = nd.second > 0 ? sqrt(nd.first / nd.second) : 0.0;
        printf("iter %d rmse %.6f\n", it + 1, rmse);
    }
    FILE* o = fopen(argv[3], "wb");
    fwrite(P.data(), sizeof(float), P.size(), o);
    fwrite(Q.data(), sizeof(float), Q.size(), o);
    fclose(o);
    return 0;
}
