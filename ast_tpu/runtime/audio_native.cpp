// Native audio I/O + resampling for the host-side data pipeline.
//
// The reference delegates decode/resample to torchaudio's C++/ffmpeg stack
// (reference: utilityFunctions.py:105-122 load_audio). This is the TPU
// framework's own native equivalent: a dependency-free RIFF/WAVE decoder
// (PCM 8/16/24/32-bit and float32/64) and a windowed-sinc polyphase
// resampler, exposed with a C ABI consumed from Python via ctypes
// (ast_tpu/data/audio_io.py). Keeping this native matters on this image:
// the host has a single CPU core, so per-clip Python decode loops would
// starve the TPU.
//
// Build: ast_tpu/runtime/build.py (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM, 3 = IEEE float
  long data_offset = 0;
  long data_bytes = 0;
};

bool read_header(FILE* f, WavInfo* info) {
  char tag[5] = {0};
  uint32_t chunk_size = 0;
  if (fread(tag, 1, 4, f) != 4 || strncmp(tag, "RIFF", 4) != 0) return false;
  if (fread(&chunk_size, 4, 1, f) != 1) return false;
  if (fread(tag, 1, 4, f) != 4 || strncmp(tag, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (fread(tag, 1, 4, f) == 4 && fread(&chunk_size, 4, 1, f) == 1) {
    if (strncmp(tag, "fmt ", 4) == 0) {
      uint16_t fmt, ch, block, bits;
      uint32_t sr, byte_rate;
      if (fread(&fmt, 2, 1, f) != 1) return false;
      if (fread(&ch, 2, 1, f) != 1) return false;
      if (fread(&sr, 4, 1, f) != 1) return false;
      if (fread(&byte_rate, 4, 1, f) != 1) return false;
      if (fread(&block, 2, 1, f) != 1) return false;
      if (fread(&bits, 2, 1, f) != 1) return false;
      if (fmt == 0xFFFE) {  // WAVE_FORMAT_EXTENSIBLE: read SubFormat tag
        uint16_t ext_size = 0;
        if (chunk_size >= 18 && fread(&ext_size, 2, 1, f) == 1 && ext_size >= 22) {
          uint16_t valid_bits; uint32_t mask; uint16_t sub_fmt;
          fread(&valid_bits, 2, 1, f);
          fread(&mask, 4, 1, f);
          fread(&sub_fmt, 2, 1, f);
          fmt = sub_fmt;
          fseek(f, (long)chunk_size - 18 - 8, SEEK_CUR);
        } else {
          fseek(f, (long)chunk_size - 18, SEEK_CUR);
        }
      } else if (chunk_size > 16) {
        fseek(f, (long)chunk_size - 16, SEEK_CUR);
      }
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = (int)sr;
      info->bits = bits;
      have_fmt = true;
    } else if (strncmp(tag, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = (long)chunk_size;
      return have_fmt;
    } else {
      fseek(f, (long)(chunk_size + (chunk_size & 1)), SEEK_CUR);
    }
  }
  return false;
}

long frames_of(const WavInfo& info) {
  const int bytes_per = info.bits / 8;
  if (bytes_per <= 0 || info.channels <= 0) return 0;
  return info.data_bytes / (bytes_per * info.channels);
}

}  // namespace

extern "C" {

// Query a wav file: returns 0 on success.
int ast_wav_info(const char* path, int* sample_rate, int* channels,
                 long* n_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  const bool ok = read_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  *n_frames = frames_of(info);
  return 0;
}

// Decode interleaved float32 samples in [-1, 1]. out must hold
// n_frames * channels floats. Returns frames read, < 0 on error.
long ast_wav_read(const char* path, float* out, long max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!read_header(f, &info)) {
    fclose(f);
    return -2;
  }
  const long n = std::min(frames_of(info), max_frames);
  const int ch = info.channels;
  const long total = n * ch;
  fseek(f, info.data_offset, SEEK_SET);

  const int bytes_per = info.bits / 8;
  std::vector<uint8_t> raw((size_t)total * bytes_per);
  const long got = (long)fread(raw.data(), bytes_per, (size_t)total, f);
  fclose(f);

  if (info.format == 3 && info.bits == 32) {
    memcpy(out, raw.data(), (size_t)got * 4);
  } else if (info.format == 3 && info.bits == 64) {
    const double* src = reinterpret_cast<const double*>(raw.data());
    for (long i = 0; i < got; ++i) out[i] = (float)src[i];
  } else if (info.bits == 16) {
    const int16_t* src = reinterpret_cast<const int16_t*>(raw.data());
    for (long i = 0; i < got; ++i) out[i] = src[i] / 32768.0f;
  } else if (info.bits == 32) {
    const int32_t* src = reinterpret_cast<const int32_t*>(raw.data());
    for (long i = 0; i < got; ++i) out[i] = (float)(src[i] / 2147483648.0);
  } else if (info.bits == 24) {
    for (long i = 0; i < got; ++i) {
      const uint8_t* p = raw.data() + (size_t)i * 3;
      int32_t v = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                            (uint32_t)p[2] << 24) >> 8;
      out[i] = (float)(v / 8388608.0);
    }
  } else if (info.bits == 8) {
    for (long i = 0; i < got; ++i) out[i] = (raw[i] - 128) / 128.0f;
  } else {
    return -3;
  }
  return got / ch;
}

// Output length of a resample (ceil(n * out/in), torchaudio convention).
long ast_resample_len(long n_in, int sr_in, int sr_out) {
  return (long)std::ceil((double)n_in * sr_out / sr_in);
}

// Windowed-sinc polyphase resampler: identical kernel to
// ast_tpu/dsp/resample.py (hann^2-windowed sinc, lowpass_filter_width=6,
// rolloff=0.99, torchaudio's construction). Mono. Returns samples written,
// < 0 on error.
long ast_resample(const float* in, long n_in, int sr_in, int sr_out,
                  float* out, long max_out) {
  if (sr_in == sr_out) {
    const long n = std::min(n_in, max_out);
    memcpy(out, in, (size_t)n * 4);
    return n;
  }
  long g = sr_in, b = sr_out;
  while (b) { long t = g % b; g = b; b = t; }
  const long up = sr_out / g, down = sr_in / g;
  const double lpw = 6.0, rolloff = 0.99;
  const double base = (double)std::min(up, down) * rolloff;
  const long width = (long)std::ceil(lpw * down / base);

  const long n_out = std::min(ast_resample_len(n_in, sr_in, sr_out), max_out);
  const double scale = base / down;

  // out[j = p + up*blk] = sum_i in[blk*down + i] * h(((i)/down - p/up)*base),
  // i in [-width, width + down)
  for (long j = 0; j < n_out; ++j) {
    const long p = j % up;
    const long blk = j / up;
    double acc = 0.0;
    for (long i = -width; i < width + down; ++i) {
      const long src = blk * down + i;
      if (src < 0 || src >= n_in) continue;
      double t = ((double)i / down - (double)p / up) * base;
      t = std::max(-lpw, std::min(lpw, t));
      const double c = std::cos(t * kPi / lpw / 2.0);
      const double sinc = (t == 0.0) ? 1.0 : std::sin(t * kPi) / (t * kPi);
      acc += in[src] * sinc * c * c * scale;
    }
    out[j] = (float)acc;
  }
  return n_out;
}

// The reference load_audio semantics in one call
// (utilityFunctions.py:105-122): decode, pad/cut to cut_seconds at the
// ORIGINAL rate, resample to target_sr, downmix stereo->mono by mean.
// Returns samples written, < 0 on error. out must hold
// ceil(cut_seconds * max(sr_orig, target_sr)) + transition slack.
long ast_load_audio(const char* path, int target_sr, double cut_seconds,
                    float* out, long max_out) {
  int sr = 0, ch = 0;
  long frames = 0;
  if (ast_wav_info(path, &sr, &ch, &frames) != 0) return -1;

  const long cut = (long)(cut_seconds * sr);
  std::vector<float> inter((size_t)std::min(frames, cut) * ch);
  const long got = ast_wav_read(path, inter.data(), std::min(frames, cut));
  if (got < 0) return got;

  // downmix + zero-pad to cut length
  std::vector<float> mono((size_t)cut, 0.0f);
  for (long i = 0; i < got; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) acc += inter[(size_t)i * ch + c];
    mono[(size_t)i] = (float)(acc / ch);
  }

  return ast_resample(mono.data(), cut, sr, target_sr, out, max_out);
}

}  // extern "C"
