// Native safetensors data plane: mmap + header scan + prefetch control.
//
// TPU-native analog of the reference's C++ weight-loading stack
// (include/metalchat/container.h basic_memfile mmap + declare_mapped,
// src/safetensor.cc header parse): the file is mapped read-only, the JSON
// header located, and the data section exposed as a raw pointer the Python
// layer wraps zero-copy into numpy views for jax.device_put. madvise
// controls page-in behaviour for multi-GB checkpoints (WILLNEED before a
// bulk device upload ≈ the reference's declare_mapped residency pin).
//
// C ABI only — consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct MappedFile {
  int fd;
  void* data;
  uint64_t size;
};

// Open + mmap a file read-only. Returns nullptr on failure.
MappedFile* mc_mmap_open(const char* path) {
  int fd = ::open(path, O_RDONLY | O_CLOEXEC);
  if (fd < 0) return nullptr;
  struct stat st;
  if (::fstat(fd, &st) != 0 || st.st_size <= 0) {
    ::close(fd);
    return nullptr;
  }
  void* data = ::mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                      MAP_PRIVATE, fd, 0);
  if (data == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* mf = new MappedFile{fd, data, static_cast<uint64_t>(st.st_size)};
  return mf;
}

const uint8_t* mc_mmap_data(const MappedFile* mf) {
  return static_cast<const uint8_t*>(mf->data);
}

uint64_t mc_mmap_size(const MappedFile* mf) { return mf->size; }

// Parse the 8-byte little-endian header length; returns 0 on implausible
// headers (mirrors the Python-side validation).
uint64_t mc_header_len(const MappedFile* mf) {
  if (mf->size < 8) return 0;
  uint64_t n;
  std::memcpy(&n, mf->data, 8);
  if (n > (100ull << 20) || 8 + n > mf->size) return 0;
  return n;
}

// advice: 0 = normal, 1 = willneed (prefetch), 2 = sequential, 3 = dontneed
int mc_mmap_advise(MappedFile* mf, uint64_t offset, uint64_t length, int advice) {
  static const int kAdvice[] = {MADV_NORMAL, MADV_WILLNEED, MADV_SEQUENTIAL,
                                MADV_DONTNEED};
  if (advice < 0 || advice > 3) return -1;
  long page = ::sysconf(_SC_PAGESIZE);
  uint64_t aligned = offset & ~static_cast<uint64_t>(page - 1);
  uint64_t delta = offset - aligned;
  return ::madvise(static_cast<uint8_t*>(mf->data) + aligned, length + delta,
                   kAdvice[advice]);
}

void mc_mmap_close(MappedFile* mf) {
  if (!mf) return;
  ::munmap(mf->data, mf->size);
  ::close(mf->fd);
  delete mf;
}

}  // extern "C"
