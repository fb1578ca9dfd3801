// Standalone driver for the REFERENCE buffalo C++ W2V core
// (/root/reference/lib/algo_impl/w2v/w2v.cc), built without the
// Cython layer.  W2V is hogwild skip-gram SGD over a bounded job
// queue; cross-implementation parity is asserted at the EMBEDDING-
// QUALITY level (planted-cluster neighbor purity on identical
// corpora), not on factors — see benchmark/ref_driver/parity.py.
//
// Protocol mirrors buffalo/algo/w2v.py::train/_iterate: workers are
// launched once, each epoch streams every sentence through
// add_jobs() (w2v.py:174-201), join() at the end.  The reference's
// per-iteration log line only times the ENQUEUE (the bounded queue,
// 3*num_workers jobs, backpressures it), so the fair throughput
// anchor printed here is wall-clock launch->join over all epochs.
//
// Input (binary, little-endian), path in argv[2]:
//   int32 V, S, D, iters          (vocab size, sentences, dim, epochs)
//   int64 total_word_count
//   int32 num_raw                  (raw key space, >= V)
//   int32 index[num_raw]           (raw key -> vocab idx + 1; 0 = drop)
//   uint32 scale[V]                (subsample thresholds)
//   int32 dist[V]                  (cumulative unigram^0.75, domain 2^31-1)
//   int64 sent_ends[S]; int32 seqs[nnz]   (raw keys per sentence)
//   float L0[V*D]
// argv[1] = option JSON path.  Output: argv[3] = trained L0 raw floats.
#include <sys/time.h>

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <vector>
#include "buffalo/algo_impl/w2v/w2v.hpp"

template <typename T> std::vector<T> rd(FILE* f, size_t n) {
    std::vector<T> v(n);
    if (fread(v.data(), sizeof(T), n, f) != n) { perror("fread"); exit(1); }
    return v;
}

static double now_s() {
    struct timeval tv;
    gettimeofday(&tv, NULL);
    return tv.tv_sec + tv.tv_usec / 1e6;
}

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s opt.json data.bin out.bin\n", argv[0]); return 1; }
    FILE* f = fopen(argv[2], "rb");
    if (!f) { perror("data"); return 1; }
    auto hdr = rd<int32_t>(f, 4);
    int V = hdr[0], S = hdr[1], D = hdr[2], iters = hdr[3];
    auto twc = rd<int64_t>(f, 1);
    auto nraw = rd<int32_t>(f, 1);
    auto index = rd<int32_t>(f, nraw[0]);
    auto scale = rd<uint32_t>(f, V);
    auto dist = rd<int32_t>(f, V);
    auto ends = rd<int64_t>(f, S);
    size_t nnz = (size_t)ends[S - 1];
    auto seqs = rd<int32_t>(f, nnz);
    auto L0 = rd<float>(f, (size_t)V * D);
    fclose(f);

    w2v::CW2V m;
    if (!m.init(argv[1])) { fprintf(stderr, "init failed\n"); return 1; }
    m.initialize_model(L0.data(), V, index.data(), scale.data(),
                       dist.data(), twc[0]);
    double t0 = now_s();
    m.launch_workers();
    for (int it = 0; it < iters; ++it) {
        double e0 = now_s();
        m.add_jobs(0, S, ends.data(), seqs.data());
        printf("iter %d enqueue %.3f s\n", it + 1, now_s() - e0);
    }
    m.join();  // drains the queue, stops workers
    double wall = now_s() - t0;
    double words = (double)twc[0] * iters;
    printf("total wall %.3f s  raw_words/s %.0f\n", wall, words / wall);
    FILE* o = fopen(argv[3], "wb");
    fwrite(L0.data(), sizeof(float), L0.size(), o);
    fclose(o);
    return 0;
}
