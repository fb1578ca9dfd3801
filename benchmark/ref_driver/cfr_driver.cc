// Standalone driver for the REFERENCE buffalo C++ CFR core
// (/root/reference/lib/algo_impl/cfr/cfr.cc), built without the
// Cython layer.  CFR is a deterministic 3-phase alternating solve
// (each row's normal equations read only tables fixed for the phase),
// so cross-implementation parity is asserted on FACTORS directly,
// like ALS/eALS — see benchmark/ref_driver/parity.py.
//
// Protocol mirrors buffalo/algo/cfr.py::train/_iterate (one chunk =
// the full range): per epoch precompute("item") + partial_update_user
// over the rowwise CSR, precompute("user") + partial_update_item over
// the colwise + SPPMI CSRs, partial_update_context over the SPPMI CSR
// (cfr.py:128-159,189-199).  Contexts share the item id space.
//
// Input (binary, little-endian), path in argv[2]:
//   int32 U, I, D, iters
//   int64 row_ends[U];  int32 row_keys[nnz];  float row_vals[nnz]
//   int64 col_ends[I];  int32 col_keys[nnz];  float col_vals[nnz]
//   int64 spp_ends[I];  int32 spp_keys[snnz]; float spp_vals[snnz]
//   float U0[U*D]; float I0[I*D]; float C0[I*D]; float Ib0[I]; float Cb0[I]
// argv[1] = option JSON path.
// Output: argv[3] = U, I, C, Ib, Cb raw floats.
#include <sys/time.h>

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <vector>
#include "buffalo/algo_impl/cfr/cfr.hpp"

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
    auto r_ends = rd<int64_t>(f, U);
    size_t nnz = (size_t)r_ends[U - 1];
    auto r_keys = rd<int32_t>(f, nnz);
    auto r_vals = rd<float>(f, nnz);
    auto c_ends = rd<int64_t>(f, I);
    auto c_keys = rd<int32_t>(f, nnz);
    auto c_vals = rd<float>(f, nnz);
    auto s_ends = rd<int64_t>(f, I);
    size_t snnz = (size_t)s_ends[I - 1];
    auto s_keys = rd<int32_t>(f, snnz);
    auto s_vals = rd<float>(f, snnz);
    auto Uf = rd<float>(f, (size_t)U * D);
    auto If = rd<float>(f, (size_t)I * D);
    auto Cf = rd<float>(f, (size_t)I * D);
    auto Ib = rd<float>(f, I);
    auto Cb = rd<float>(f, I);
    fclose(f);

    cfr::CCFR m;
    if (!m.init(argv[1])) { fprintf(stderr, "init failed\n"); return 1; }
    m.set_embedding(Uf.data(), U, "user");
    m.set_embedding(If.data(), I, "item");
    m.set_embedding(Cf.data(), I, "context");
    m.set_embedding(Ib.data(), I, "item_bias");
    m.set_embedding(Cb.data(), I, "context_bias");
    for (int it = 0; it < iters; ++it) {
        double t0 = now_s();
        double loss = 0.0;
        m.precompute("item");
        loss += m.partial_update_user(0, U, r_ends.data(), r_keys.data(),
                                      r_vals.data());
        m.precompute("user");
        loss += m.partial_update_item(0, I, c_ends.data(), c_keys.data(),
                                      c_vals.data(), s_ends.data(),
                                      s_keys.data(), s_vals.data());
        loss += m.partial_update_context(0, I, s_ends.data(),
                                         s_keys.data(), s_vals.data());
        printf("iter %d loss %.6f elapsed %.3f s\n", it + 1, loss,
               now_s() - t0);
    }
    FILE* o = fopen(argv[3], "wb");
    fwrite(Uf.data(), sizeof(float), Uf.size(), o);
    fwrite(If.data(), sizeof(float), If.size(), o);
    fwrite(Cf.data(), sizeof(float), Cf.size(), o);
    fwrite(Ib.data(), sizeof(float), Ib.size(), o);
    fwrite(Cb.data(), sizeof(float), Cb.size(), o);
    fclose(o);
    return 0;
}
