// gprof harness for the native VP9 host parser: parse one frame payload
// N times.  Usage: parse_prof <payload.bin> [N]
// Build: g++ -O2 -pg -pthread -o parse_prof parse_prof.cpp ../../cuda_vp9_tpu/native/vp9host.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void* vp9h_create();
void vp9h_destroy(void* h);
int vp9h_parse(void* h, const uint8_t* data, int64_t size, void* out);
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: parse_prof payload.bin [N]\n"); return 2; }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror(argv[1]); return 2; }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) return 2;
  fclose(f);
  int N = argc > 2 ? atoi(argv[2]) : 50;
  static uint8_t out[1 << 22];
  void* h = vp9h_create();
  for (int i = 0; i < N; i++) vp9h_parse(h, buf.data(), n, out);
  vp9h_destroy(h);
  printf("parsed %d times\n", N);
  return 0;
}
