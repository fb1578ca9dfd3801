// Standalone driver for the REFERENCE buffalo C++ eALS core
// (/root/reference/lib/algo_impl/eals/eals.cc), built without the
// Cython layer.  Produces cross-implementation parity evidence:
// train the reference core and buffalo_tpu's eALS kernels on identical
// data/inits and compare factors (benchmark/accuracy.md).
//
// Protocol mirrors buffalo/algo/eals.py::train: initialize_model with
// the popularity negative weights C, precompute_cache both axes, then
// per epoch update(axis=0) and update(axis=1) followed by
// estimate_loss (eals.py:121-136).
//
// Input (binary, little-endian), path in argv[2]:
//   int32 U, I, D, iters
//   float C[I]
//   int64 row_ends[U]; int32 row_keys[nnz]; float row_vals[nnz]
//   int64 col_ends[I]; int32 col_keys[nnz]; float col_vals[nnz]
//   float P0[U*D]; float Q0[I*D]
// argv[1] = option JSON path.  Output: argv[3] = P then Q raw floats.
#include <sys/time.h>

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cmath>
#include <vector>
#include "buffalo/algo_impl/eals/eals.hpp"

static double now_s() {
    struct timeval tv;
    gettimeofday(&tv, NULL);
    return tv.tv_sec + tv.tv_usec / 1e6;
}

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
    auto C = rd<float>(f, I);
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

    eals::CEALS m;
    if (!m.init(argv[1])) { fprintf(stderr, "init failed\n"); return 1; }
    m.initialize_model(P.data(), Q.data(), C.data(), U, I);
    m.precompute_cache((int32_t)nnz, r_ends.data(), r_keys.data(), 0);
    m.precompute_cache((int32_t)nnz, c_ends.data(), c_keys.data(), 1);
    for (int it = 0; it < iters; ++it) {
        double t0 = now_s();
        if (!m.update(r_ends.data(), r_keys.data(), r_vals.data(), 0)) {
            fprintf(stderr, "update axis 0 failed\n"); return 1;
        }
        if (!m.update(c_ends.data(), c_keys.data(), c_vals.data(), 1)) {
            fprintf(stderr, "update axis 1 failed\n"); return 1;
        }
        auto rl = m.estimate_loss((int32_t)nnz, r_ends.data(),
                                  r_keys.data(), r_vals.data(), 0);
        printf("iter %d elapsed %.3f s rmse %.6f loss %.6f\n", it + 1,
               now_s() - t0,
               rl.first, rl.second);
    }
    FILE* o = fopen(argv[3], "wb");
    fwrite(P.data(), sizeof(float), P.size(), o);
    fwrite(Q.data(), sizeof(float), Q.size(), o);
    fclose(o);
    return 0;
}
