// ASAN truncation/corruption sweep harness for the native VP9 host parser.
//
// Built by tests/test_native_robustness.py with -fsanitize=address and run
// over fixture packets: every truncated prefix and a byte-corruption sweep
// of real frame payloads must parse without any out-of-bounds access
// (the analog of libvpx test/invalid_file_test.cc run under sanitizers).
//
// Usage: native_trunc_check <packet0> [packet1 ...]
//   packet0 is parsed intact first (establishes decoder state), then each
//   subsequent packet is swept.  The final packet is also swept on a fresh
//   decoder (keyframe truncation path).

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

static std::vector<uint8_t> read_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(2); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (n && fread(buf.data(), 1, n, f) != (size_t)n) { exit(2); }
  fclose(f);
  return buf;
}

// out buffer sized far beyond sizeof(PlanOut); zeroed each call
static char out_buf[1 << 16];

static void parse_exact(void* h, const uint8_t* data, int64_t size) {
  // copy into an exactly-sized heap buffer so ASAN flags any overread
  uint8_t* tight = (uint8_t*)malloc(size ? size : 1);
  memcpy(tight, data, size);
  memset(out_buf, 0, sizeof(out_buf));
  vp9h_parse(h, tight, size, out_buf);
  free(tight);
}

static void sweep(const std::vector<uint8_t>& pkt, void* warm) {
  // truncation sweep: every prefix length (dense below 256, strided above)
  for (int64_t len = 0; len <= (int64_t)pkt.size();
       len += (len < 256 ? 1 : 7)) {
    void* h = vp9h_create();
    parse_exact(h, pkt.data(), len);
    vp9h_destroy(h);
    if (warm) parse_exact(warm, pkt.data(), len);
  }
  // corruption sweep: XOR each byte in the header region with 0xFF
  std::vector<uint8_t> mut(pkt);
  int64_t hdr_span = pkt.size() < 128 ? (int64_t)pkt.size() : 128;
  for (int64_t i = 0; i < hdr_span; i++) {
    mut[i] ^= 0xFF;
    void* h = vp9h_create();
    parse_exact(h, mut.data(), mut.size());
    vp9h_destroy(h);
    mut[i] ^= 0xFF;
  }
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s pkt0 [pkt1 ...]\n", argv[0]);
                  return 2; }
  void* warm = vp9h_create();
  std::vector<uint8_t> first = read_file(argv[1]);
  parse_exact(warm, first.data(), first.size());
  for (int a = 2; a < argc; a++) {
    std::vector<uint8_t> pkt = read_file(argv[a]);
    // keep warm decoder state fresh: re-parse the preceding packets intact
    parse_exact(warm, pkt.data(), pkt.size());
    sweep(pkt, warm);
  }
  sweep(first, nullptr);
  vp9h_destroy(warm);
  printf("OK\n");
  return 0;
}
