// ditsep_io: native audio IO + batch assembly for the TPU input pipeline.
//
// The reference's native layer is two CUDA kernels plus a
// torch.multiprocessing data/eval pool (reference:
// src/models/diffsep/ncsnpp_utils/op/*.cu, src/utils/processing_pool.py).
// On TPU the compute kernels live in XLA; the runtime-native piece that
// still pays off is the host input pipeline: WAV decode + crop + pad +
// batch collation, which feeds the chip between steps. This library is a
// dependency-free C++17 implementation exposed through a C ABI and loaded
// via ctypes (ditsep_tpu/native.py) with a pure-numpy fallback.
//
// Build: make -C native   (produces libditsep_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV ----

// Parse a RIFF/WAVE file. Supports PCM16, PCM24, PCM32 and IEEE float32,
// any channel count. Writes interleaved float32 samples into `out`
// (caller-allocated, capacity `max_samples` floats). Returns the number of
// frames written, or a negative error code:
//   -1 file not found      -2 not a RIFF/WAVE      -3 unsupported format
//   -4 truncated           -5 output buffer too small
long ditsep_load_wav_f32(const char* path, float* out, long max_samples,
                         int* out_channels, int* out_fs) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 ||
      std::memcmp(riff, "RIFF", 4) != 0 ||
      std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return -2;
  }

  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  long data_offset = -1;
  uint32_t data_size = 0;

  // walk chunks
  for (;;) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1)
      break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[40];
      if (size < 16) { std::fclose(f); return -3; }  // truncated fmt:
      // reading fewer bytes would leave bits/rate uninitialized
      uint32_t n = size < sizeof(buf) ? size : (uint32_t)sizeof(buf);
      if (std::fread(buf, 1, n, f) != n) { std::fclose(f); return -4; }
      if (size > n) std::fseek(f, size - n, SEEK_CUR);
      audio_format = (uint16_t)(buf[0] | (buf[1] << 8));
      channels = (uint16_t)(buf[2] | (buf[3] << 8));
      std::memcpy(&sample_rate, buf + 4, 4);
      bits = (uint16_t)(buf[14] | (buf[15] << 8));
      if (audio_format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        audio_format = (uint16_t)(buf[24] | (buf[25] << 8));
      }
    } else if (std::memcmp(id, "data", 4) == 0) {
      data_offset = std::ftell(f);
      data_size = size;
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
    } else {
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);
    }
    if (data_offset >= 0 && audio_format != 0) break;
  }

  if (data_offset < 0 || channels == 0) { std::fclose(f); return -2; }
  const bool is_float = audio_format == 3;
  const bool is_pcm = audio_format == 1;
  if (!is_float && !is_pcm) { std::fclose(f); return -3; }
  if (bits != 16 && bits != 24 && bits != 32) { std::fclose(f); return -3; }
  if (is_float && bits != 32) { std::fclose(f); return -3; }

  const long bytes_per_sample = bits / 8;
  const long n_samples = (long)(data_size / bytes_per_sample);
  if (n_samples > max_samples) { std::fclose(f); return -5; }

  std::fseek(f, data_offset, SEEK_SET);
  std::vector<uint8_t> raw((size_t)data_size);
  if (std::fread(raw.data(), 1, data_size, f) != data_size) {
    std::fclose(f);
    return -4;
  }
  std::fclose(f);

  if (is_float) {
    std::memcpy(out, raw.data(), (size_t)n_samples * 4);
  } else if (bits == 16) {
    const int16_t* p = reinterpret_cast<const int16_t*>(raw.data());
    for (long i = 0; i < n_samples; ++i) out[i] = p[i] / 32768.0f;
  } else if (bits == 24) {
    const uint8_t* p = raw.data();
    for (long i = 0; i < n_samples; ++i) {
      int32_t v = (int32_t)((uint32_t)p[3 * i] << 8 |
                            (uint32_t)p[3 * i + 1] << 16 |
                            (uint32_t)p[3 * i + 2] << 24) >> 8;
      out[i] = v / 8388608.0f;
    }
  } else {  // PCM32
    const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
    for (long i = 0; i < n_samples; ++i)
      out[i] = (float)(p[i] / 2147483648.0);
  }

  *out_channels = (int)channels;
  *out_fs = (int)sample_rate;
  return n_samples / channels;  // frames
}

// Write a PCM16 WAV (mono or interleaved multichannel).
int ditsep_write_wav_pcm16(const char* path, const float* data, long frames,
                           int channels, int fs) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = (uint32_t)(frames * channels * 2);
  const uint32_t riff_size = 36 + data_bytes;
  const uint16_t fmt = 1, ch = (uint16_t)channels, bits = 16;
  const uint32_t byte_rate = (uint32_t)fs * channels * 2;
  const uint16_t block_align = (uint16_t)(channels * 2);
  const uint32_t fmt_size = 16, rate = (uint32_t)fs;
  std::fwrite("RIFF", 1, 4, f);
  std::fwrite(&riff_size, 4, 1, f);
  std::fwrite("WAVEfmt ", 1, 8, f);
  std::fwrite(&fmt_size, 4, 1, f);
  std::fwrite(&fmt, 2, 1, f);
  std::fwrite(&ch, 2, 1, f);
  std::fwrite(&rate, 4, 1, f);
  std::fwrite(&byte_rate, 4, 1, f);
  std::fwrite(&block_align, 2, 1, f);
  std::fwrite(&bits, 2, 1, f);
  std::fwrite("data", 1, 4, f);
  std::fwrite(&data_bytes, 4, 1, f);
  std::vector<int16_t> buf((size_t)frames * channels);
  for (long i = 0; i < frames * channels; ++i) {
    float v = data[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    buf[(size_t)i] = (int16_t)(v * 32767.0f);
  }
  size_t wrote = std::fwrite(buf.data(), 2, (size_t)(frames * channels), f);
  int rc = (wrote == (size_t)(frames * channels)) ? 0 : -2;
  if (std::fclose(f) != 0 && rc == 0) rc = -3;  // flush can fail (ENOSPC)
  return rc;
}

// --------------------------------------------------------- batch build ----

// Center-pad/crop a set of variable-length mono signals into a contiguous
// (n, out_len) float32 batch (the max_collator hot path,
// reference: src/datasets/wsj0_mix.py:104-120).
void ditsep_collate_center(const float** signals, const long* lengths,
                           long n, long out_len, float* out) {
  for (long i = 0; i < n; ++i) {
    float* row = out + i * out_len;
    std::memset(row, 0, (size_t)out_len * 4);
    long len = lengths[i] < out_len ? lengths[i] : out_len;
    long lo = (out_len - len) / 2;
    std::memcpy(row + lo, signals[i], (size_t)len * 4);
  }
}

// Random-crop (given start offsets) into a contiguous batch.
void ditsep_collate_crop(const float** signals, const long* lengths,
                         const long* starts, long n, long out_len,
                         float* out) {
  for (long i = 0; i < n; ++i) {
    float* row = out + i * out_len;
    long avail = lengths[i] - starts[i];
    long len = avail < out_len ? (avail > 0 ? avail : 0) : out_len;
    if (len < out_len) std::memset(row, 0, (size_t)out_len * 4);
    if (len > 0) std::memcpy(row, signals[i] + starts[i], (size_t)len * 4);
  }
}

}  // extern "C"
