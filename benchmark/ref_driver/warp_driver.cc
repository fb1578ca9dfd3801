// Standalone driver for the REFERENCE buffalo C++ WARP core
// (/root/reference/lib/algo_impl/warp/warp.cc), built without the
// Cython layer.  WARP is hogwild SGD with rejection-sampled violating
// negatives, so cross-implementation parity is asserted at the
// RANKING-METRIC level (accuracy bands on identical data), not on
// factors — see benchmark/ref_driver/parity.py.
//
// Protocol mirrors buffalo/algo/warp.py::train/_iterate: per epoch
// add_jobs over the whole rowwise CSR then update_parameters() and
// wait_until_done() (warp.py:200-246; WARP draws negatives uniformly,
// no cumulative table), compute_loss on pre-drawn loss triplets
// (violation rate), join() at the end.
//
// Input (binary, little-endian), path in argv[2]:
//   int32 U, I, D, iters
//   int64 row_ends[U]; int32 row_keys[nnz]
//   int32 n_loss; int32 lu[n_loss]; int32 li[n_loss]; int32 lj[n_loss]
//   float P0[U*D]; float Q0[I*D]; float Qb0[I]
// argv[1] = option JSON path.  Output: argv[3] = P, Q, Qb raw floats.
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <vector>
#include "buffalo/algo_impl/warp/warp.hpp"

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
    auto nl = rd<int32_t>(f, 1);
    int n_loss = nl[0];
    auto lu = rd<int32_t>(f, n_loss);
    auto li = rd<int32_t>(f, n_loss);
    auto lj = rd<int32_t>(f, n_loss);
    auto P = rd<float>(f, (size_t)U * D);
    auto Q = rd<float>(f, (size_t)I * D);
    auto Qb = rd<float>(f, I);
    fclose(f);

    warp::CWARP m;
    if (!m.init(argv[1])) { fprintf(stderr, "init failed\n"); return 1; }
    m.initialize_model(P.data(), U, Q.data(), I, Qb.data(), (int64_t)nnz);
    m.launch_workers();
    for (int it = 0; it < iters; ++it) {
        m.add_jobs(0, U, r_ends.data(), r_keys.data());
        m.update_parameters();
        m.wait_until_done();
        double loss = m.compute_loss(n_loss, lu.data(), li.data(),
                                     lj.data());
        printf("iter %d loss %.6f\n", it + 1, loss);
    }
    m.join();
    FILE* o = fopen(argv[3], "wb");
    fwrite(P.data(), sizeof(float), P.size(), o);
    fwrite(Q.data(), sizeof(float), Q.size(), o);
    fwrite(Qb.data(), sizeof(float), Qb.size(), o);
    fclose(o);
    return 0;
}
