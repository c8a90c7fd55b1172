// Test-only harness: drives the *reference* ROC codec (compiled straight from
// the read-only checkout via -I/-include of /root/reference sources) so tests
// can assert bit-exact stream equality between this framework and the
// reference. No reference code is vendored; this file only calls its API.
//
// Usage: ref_codec_harness <precision> < input  > output
//   input:  first line n, then n ids (one per line)
//   output: "HEAD <head>", "STACK <len>", one stack word per line (bottom to
//           top), then "DECODED", then n decoded ids in decode order.
#include <cstdint>
#include <cstdio>
#include <vector>
#include "custom_invlist_cpp/codec.h"

int main(int argc, char** argv) {
    int precision = std::atoi(argv[1]);
    size_t n;
    if (scanf("%zu", &n) != 1) return 1;
    std::vector<uint64_t> ids(n);
    for (size_t i = 0; i < n; i++) {
        if (scanf("%llu", (unsigned long long*)&ids[i]) != 1) return 1;
    }
    ANSState state;
    compress(n, ids.data(), state, precision);
    printf("HEAD %llu\n", (unsigned long long)state.get_head());
    printf("STACK %zu\n", state.stack.size());
    for (uint32_t w : state.stack) printf("%u\n", w);
    printf("DECODED\n");
    std::vector<uint64_t> out(n);
    ANSState copy(state);
    decompress(copy, n, out.data(), precision);
    for (size_t i = 0; i < n; i++) printf("%llu\n", (unsigned long long)out[i]);
    return 0;
}
