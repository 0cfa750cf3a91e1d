// Native host runtime for pplp_tpu: framed TCP transport + Bloom hot paths.
//
// The reference's transport is C++ (include/util.h:47-335: blocking sockets,
// 128-byte ASCII length prefix); this library is its equivalent for the new
// framework, exposed through a C ABI consumed via ctypes
// (pplp_tpu/protocol/native_transport.py). Also carries the AP-hash batch
// index computation used by host-side Bloom-filter serialization paths.
//
// Build: make -C native   (produces libpplp_native.so)

#include <arpa/inet.h>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <netdb.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

static const int kSizeBuffer = 128;  // util.h:47 framing header size

// ---------------------------------------------------------------------
// Connection setup (util.h:95-178 / 181-335 equivalents)
// ---------------------------------------------------------------------

int pplp_connect_server(const char *ip, uint16_t port, int ipv6) {
  int family = ipv6 ? AF_INET6 : AF_INET;
  int fd = socket(family, SOCK_STREAM, 0);
  if (fd < 0) return -1;

  char portstr[16];
  snprintf(portstr, sizeof portstr, "%u", (unsigned)port);
  struct addrinfo hints, *ai = nullptr;
  memset(&hints, 0, sizeof hints);
  hints.ai_family = family;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(ip, portstr, &hints, &ai) != 0 || !ai) {
    close(fd);
    return -1;
  }
  int rc = connect(fd, ai->ai_addr, ai->ai_addrlen);
  freeaddrinfo(ai);
  if (rc < 0) {
    close(fd);
    return -1;
  }
  return fd;
}

int pplp_connect_client(const char *ip, uint16_t port, int ipv6) {
  int family = ipv6 ? AF_INET6 : AF_INET;
  int lfd = socket(family, SOCK_STREAM, 0);
  if (lfd < 0) return -1;
  int option = 1;
  setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &option, sizeof option);

  char portstr[16];
  snprintf(portstr, sizeof portstr, "%u", (unsigned)port);
  struct addrinfo hints, *ai = nullptr;
  memset(&hints, 0, sizeof hints);
  hints.ai_family = family;
  hints.ai_socktype = SOCK_STREAM;
  hints.ai_flags = AI_PASSIVE;
  if (getaddrinfo(ip, portstr, &hints, &ai) != 0 || !ai) {
    close(lfd);
    return -1;
  }
  int rc = bind(lfd, ai->ai_addr, ai->ai_addrlen);
  freeaddrinfo(ai);
  if (rc < 0 || listen(lfd, 8) < 0) {
    close(lfd);
    return -1;
  }
  int cfd = accept(lfd, nullptr, nullptr);
  close(lfd);  // stop listening (util.h:230)
  return cfd;
}

// ---------------------------------------------------------------------
// Framing (util.h:51-93 semantics, exact recv loops)
// ---------------------------------------------------------------------

static int send_exact(int fd, const uint8_t *buf, size_t len) {
  while (len) {
    ssize_t k = send(fd, buf, len, 0);
    if (k <= 0) return -1;
    buf += k;
    len -= (size_t)k;
  }
  return 0;
}

static int recv_exact(int fd, uint8_t *buf, size_t len) {
  while (len) {
    ssize_t k = recv(fd, buf, len, 0);
    if (k <= 0) return -1;
    buf += k;
    len -= (size_t)k;
  }
  return 0;
}

// Returns payload length on success, -1 on error.
long pplp_send_frame(int fd, const uint8_t *payload, uint64_t len) {
  uint8_t header[kSizeBuffer];
  memset(header, 0, sizeof header);
  snprintf((char *)header, sizeof header, "%llu", (unsigned long long)len);
  if (send_exact(fd, header, sizeof header) < 0) return -1;
  if (send_exact(fd, payload, len) < 0) return -1;
  return (long)len;
}

// Reads the 128-byte header; returns the announced payload length (-1 error).
long pplp_recv_frame_size(int fd) {
  uint8_t header[kSizeBuffer];
  if (recv_exact(fd, header, sizeof header) < 0) return -1;
  header[kSizeBuffer - 1] = 0;
  return strtol((char *)header, nullptr, 10);
}

long pplp_recv_exact(int fd, uint8_t *buf, uint64_t len) {
  return recv_exact(fd, buf, len) < 0 ? -1 : (long)len;
}

int pplp_close(int fd) { return close(fd); }

// ---------------------------------------------------------------------
// Bloom filter hot path: AP hash of 8-byte keys, batched
// (bloomfilter.h:527-583 semantics for the one-iteration u64 case).
// ---------------------------------------------------------------------

void pplp_bf_indices_u64(const uint64_t *keys, uint64_t n_keys,
                         const uint32_t *salts, uint32_t n_salts,
                         uint64_t table_size, int mixed,
                         uint64_t *out /* n_keys * n_salts */) {
  for (uint64_t i = 0; i < n_keys; ++i) {
    uint32_t i1 = (uint32_t)(keys[i] & 0xFFFFFFFFu);
    uint32_t i2 = (uint32_t)(keys[i] >> 32);
    for (uint32_t s = 0; s < n_salts; ++s) {
      uint32_t h = salts[s];
      h ^= (h << 7) ^ (i1 * (h >> 3)) ^ (~((h << 11) + (i2 ^ (h >> 5))));
      if (mixed) {  // murmur3 fmix32 finalizer (index_mode="mixed")
        h ^= h >> 16;
        h *= 0x85EBCA6Bu;
        h ^= h >> 13;
        h *= 0xC2B2AE35u;
        h ^= h >> 16;
      }
      out[i * n_salts + s] = h % table_size;
    }
  }
}

void pplp_bf_insert_u64(const uint64_t *keys, uint64_t n_keys,
                        const uint32_t *salts, uint32_t n_salts,
                        uint64_t table_size, int mixed, uint8_t *bit_table) {
  for (uint64_t i = 0; i < n_keys; ++i) {
    uint32_t i1 = (uint32_t)(keys[i] & 0xFFFFFFFFu);
    uint32_t i2 = (uint32_t)(keys[i] >> 32);
    for (uint32_t s = 0; s < n_salts; ++s) {
      uint32_t h = salts[s];
      h ^= (h << 7) ^ (i1 * (h >> 3)) ^ (~((h << 11) + (i2 ^ (h >> 5))));
      if (mixed) {
        h ^= h >> 16;
        h *= 0x85EBCA6Bu;
        h ^= h >> 13;
        h *= 0xC2B2AE35u;
        h ^= h >> 16;
      }
      uint64_t idx = h % table_size;
      bit_table[idx >> 3] |= (uint8_t)(1u << (idx & 7));
    }
  }
}

}  // extern "C"
