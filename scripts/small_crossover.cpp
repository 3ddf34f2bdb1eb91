// Measures the small-n crossover between the direct insertion-sort suffix
// sort and full SA-IS, and the sais_small bench row (11-byte build).
// Drives the kSmallDirectMax threshold in sais_core.h.
//
// Build+run: g++ -O3 -march=native -std=c++17 scripts/small_crossover.cpp \
//              -o /tmp/small_crossover && /tmp/small_crossover
#include <chrono>
#include <cstdio>
#include <cstring>
#include <random>

#include "../suffix_tpu/native/csrc/sais_core.h"

static double bench(void (*fn)(const uint8_t*, uint32_t, uint32_t*),
                    const uint8_t* t, uint32_t n, int iters) {
  std::vector<uint32_t> out(n);
  // Warm.
  for (int i = 0; i < 100; i++) fn(t, n, out.data());
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; i++) fn(t, n, out.data());
  auto t1 = std::chrono::steady_clock::now();
  return std::chrono::duration<double, std::nano>(t1 - t0).count() / iters;
}

static void sais_full(const uint8_t* t, uint32_t n, uint32_t* out) {
  // The general path, bypassing the small-n dispatch.
  std::vector<uint32_t> s(static_cast<size_t>(n) + 1);
  for (uint32_t i = 0; i < n; i++) s[i] = t[i] + 1u;
  s[n] = 0;
  std::vector<uint32_t> sa;
  stpu::sais_core(s, 257, sa);
  std::memcpy(out, sa.data() + 1, sizeof(uint32_t) * n);
}

int main() {
  const char* miss = "mississippi";
  printf("mississippi (n=11):\n");
  printf("  dispatched sais_u8: %8.0f ns\n",
         bench(stpu::sais_u8, (const uint8_t*)miss, 11, 2000000));
  printf("  direct small sort : %8.0f ns\n",
         bench(stpu::small_sort_u8, (const uint8_t*)miss, 11, 2000000));
  printf("  full SA-IS        : %8.0f ns\n",
         bench(sais_full, (const uint8_t*)miss, 11, 200000));

  std::mt19937 rng(42);
  printf("\ncrossover ladder (random 4-letter text):\n");
  for (uint32_t n : {16u, 24u, 32u, 48u, 64u, 96u, 128u, 192u, 256u}) {
    std::vector<uint8_t> t(n);
    for (auto& c : t) c = "acgt"[rng() & 3];
    int iters = n <= 64 ? 500000 : 100000;
    double small = bench(stpu::small_sort_u8, t.data(), n, iters);
    double full = bench(sais_full, t.data(), n, iters);
    printf("  n=%4u  small %9.0f ns   sais %9.0f ns   %s\n", n, small, full,
           small < full ? "small" : "sais");
  }
  // Adversarial for insertion sort: all-equal bytes (maximal shifting,
  // maximal memcmp lengths).
  printf("\nall-'a' texts (worst case for the direct path):\n");
  for (uint32_t n : {32u, 64u, 96u, 128u}) {
    std::vector<uint8_t> t(n, 'a');
    double small = bench(stpu::small_sort_u8, t.data(), n, 200000);
    double full = bench(sais_full, t.data(), n, 200000);
    printf("  n=%4u  small %9.0f ns   sais %9.0f ns   %s\n", n, small, full,
           small < full ? "small" : "sais");
  }
  return 0;
}
