// ThreadSanitizer harness for the native packet pump's ring buffer
// (veloslam_tpu/io/native/packet_pump.cpp): a real UDP producer thread
// races against concurrent pollers + the drop-oldest path while TSAN
// watches.  Built and run by tests/test_udp_live.py::test_native_pump_tsan;
// any data race makes TSAN print a WARNING and exit non-zero
// (halt_on_error).  The reference hand-waves its thread safety
// (HDLManager.h:196-206 "MIGHT BE safe"); here it is machine-checked.

#include <arpa/inet.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* pp_udp_open(int port, int payload_size, long long capacity);
long long pp_udp_poll(void* h, unsigned char* out, long long* times,
                      long long max_packets);
long long pp_udp_dropped(void* h);
void pp_udp_close(void* h);
}

int main(int argc, char** argv) {
  int port = argc > 1 ? atoi(argv[1]) : 45999;
  const int PAYLOAD = 1206;
  // tiny ring so the drop-oldest path (head/tail contention) exercises
  void* h = pp_udp_open(port, PAYLOAD, 64);
  if (!h) { fprintf(stderr, "bind failed\n"); return 2; }

  std::thread sender([port]() {
    int fd = socket(AF_INET, SOCK_DGRAM, 0);
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    inet_pton(AF_INET, "127.0.0.1", &addr.sin_addr);
    std::vector<unsigned char> pkt(PAYLOAD, 0xAB);
    for (int i = 0; i < 5000; ++i) {
      memcpy(pkt.data(), &i, sizeof(i));
      sendto(fd, pkt.data(), PAYLOAD, 0, (sockaddr*)&addr, sizeof(addr));
      if (i % 50 == 0) usleep(100);
    }
    close(fd);
  });

  std::vector<unsigned char> out(256 * PAYLOAD);
  std::vector<long long> times(256);
  long long total = 0;
  unsigned long long checksum = 0;
  for (int iter = 0; iter < 4000 && total < 4000; ++iter) {
    long long n = pp_udp_poll(h, out.data(), times.data(), 256);
    total += n;
    // touch the payloads so TSAN sees the consumer-side reads
    for (long long k = 0; k < n; ++k)
      checksum += out[k * PAYLOAD] + out[k * PAYLOAD + 5];
    if (n == 0) usleep(200);
  }
  sender.join();
  // drain the tail
  total += pp_udp_poll(h, out.data(), times.data(), 256);
  long long dropped = pp_udp_dropped(h);
  pp_udp_close(h);
  fprintf(stderr, "received=%lld dropped=%lld checksum=%llu\n", total,
          dropped, checksum);
  if (total + dropped < 2000) { fprintf(stderr, "too few packets\n"); return 4; }
  printf("TSAN_OK\n");
  return 0;
}
