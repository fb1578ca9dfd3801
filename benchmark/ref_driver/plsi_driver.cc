// Standalone driver for the REFERENCE buffalo C++ pLSI core
// (/root/reference/lib/algo_impl/plsi/plsi.cc) — see als_driver.cc for
// why (no Cython in this environment).  Protocol mirrors
// buffalo/algo/plsi.py::train: per epoch reset -> whole-CSR
// partial_update -> normalize(alpha1, alpha2) -> swap.
// Input layout: int32 U, I, D, iters; float alpha1, alpha2;
//   int64 row_ends[U]; int32 keys[nnz]; float vals[nnz];
//   float P0[U*D]; float Q0[I*D]
#include <sys/time.h>

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include "buffalo/algo_impl/plsi/plsi.hpp"

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
    auto alphas = rd<float>(f, 2);
    auto ends = rd<int64_t>(f, U);
    size_t nnz = (size_t)ends[U - 1];
    auto keys = rd<int32_t>(f, nnz);
    auto vals = rd<float>(f, nnz);
    auto P0 = rd<float>(f, (size_t)U * D);
    auto Q0 = rd<float>(f, (size_t)I * D);
    fclose(f);

    std::vector<float> P((size_t)U * D), Q((size_t)I * D);
    plsi::CPLSI m;
    if (!m.init(argv[1])) { fprintf(stderr, "init failed\n"); return 1; }
    m.initialize_model(P.data(), U, Q.data(), I);
    // initialize_model seeds its own RNG init; overwrite with the
    // shared init so both implementations start identically
    memcpy(P.data(), P0.data(), P0.size() * sizeof(float));
    memcpy(Q.data(), Q0.data(), Q0.size() * sizeof(float));
    for (int it = 0; it < iters; ++it) {
        double t0 = now_s();
        m.reset();
        float loss = m.partial_update(0, U, ends.data(), keys.data(), vals.data());
        m.normalize(alphas[0], alphas[1]);
        m.swap();
        printf("iter %d elapsed %.3f s loss %.6f\n", it + 1,
               now_s() - t0, loss);
    }
    FILE* o = fopen(argv[3], "wb");
    fwrite(P.data(), sizeof(float), P.size(), o);
    fwrite(Q.data(), sizeof(float), Q.size(), o);
    fclose(o);
    return 0;
}
