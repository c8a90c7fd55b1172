// Test-only benchmark harness: times the *reference* ROC codec (compiled from
// the read-only checkout via -I) on an IVF-shaped workload — nlist lists of
// ~mean_ls distinct ids each — to produce the single-core CPU baseline that
// bench.py compares the TPU batched codec against. Calls the reference API
// only; no reference code is vendored.
//
// Usage: ref_codec_bench <nlist> <ntotal> <seed>
// Output: one line "encode_s <s> decode_s <s> ids <n> bytes <b>"
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>
#include "custom_invlist_cpp/codec.h"

int main(int argc, char** argv) {
    size_t nlist = std::atoi(argv[1]);
    size_t ntotal = std::atol(argv[2]);
    unsigned seed = std::atoi(argv[3]);

    // assign ids to lists uniformly (same workload generator as bench.py)
    std::mt19937_64 rng(seed);
    std::vector<std::vector<uint64_t>> lists(nlist);
    for (uint64_t id = 0; id < ntotal; id++) {
        lists[rng() % nlist].push_back(id);
    }
    int precision = 0;
    while ((1ULL << precision) < ntotal) precision++;

    std::vector<ANSState> states(nlist);
    auto t0 = std::chrono::steady_clock::now();
    for (size_t l = 0; l < nlist; l++) {
        compress(lists[l].size(), lists[l].data(), states[l], precision);
    }
    auto t1 = std::chrono::steady_clock::now();
    size_t bytes = 0;
    for (auto& s : states) bytes += s.size();

    std::vector<uint64_t> out;
    auto t2 = std::chrono::steady_clock::now();
    for (size_t l = 0; l < nlist; l++) {
        out.resize(lists[l].size());
        ANSState copy(states[l]);
        decompress(copy, lists[l].size(), out.data(), precision);
    }
    auto t3 = std::chrono::steady_clock::now();

    double enc = std::chrono::duration<double>(t1 - t0).count();
    double dec = std::chrono::duration<double>(t3 - t2).count();
    printf("encode_s %.6f decode_s %.6f ids %zu bytes %zu\n", enc, dec, ntotal, bytes);
    return 0;
}
