// gprof harness for the native VP9 host parser.  Parses every payload
// once in order (priming decoder state: inter frames need the preceding
// keyframe's geometry/refs), then re-parses the LAST payload N times.
// Usage: parse_prof payload0.bin [payload1.bin ...] [N]
// Build: g++ -O2 -pg -pthread -o parse_prof parse_prof.cpp ../../cuda_vp9_tpu/native/vp9host.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* vp9h_create();
void vp9h_destroy(void* h);
int vp9h_parse(void* h, const uint8_t* data, int64_t size, void* out);
}

static std::vector<uint8_t> slurp(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(2); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) exit(2);
  fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: parse_prof payload.bin [more.bin ...] [N]\n");
    return 2;
  }
  int N = 50, last = argc - 1;
  char* e = nullptr;
  long v = strtol(argv[argc - 1], &e, 10);
  if (e && *e == '\0') { N = (int)v; last = argc - 2; }
  if (last < 1) { fprintf(stderr, "no payloads\n"); return 2; }
  std::vector<std::vector<uint8_t>> bufs;
  for (int i = 1; i <= last; i++) bufs.push_back(slurp(argv[i]));
  static uint8_t out[1 << 24];
  void* h = vp9h_create();
  for (auto& b : bufs)
    if (vp9h_parse(h, b.data(), (int64_t)b.size(), out) < 0) {
      fprintf(stderr, "priming parse failed\n");
      return 1;
    }
  auto& b = bufs.back();
  for (int i = 0; i < N; i++)
    if (vp9h_parse(h, b.data(), (int64_t)b.size(), out) < 0) {
      fprintf(stderr, "parse %d failed\n", i);
      return 1;
    }
  vp9h_destroy(h);
  printf("parsed %d times\n", N);
  return 0;
}
