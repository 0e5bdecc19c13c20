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
//
// mp3 support (reference: torchaudio.load on .mp3, utilityFunctions.py:109;
// AudioSegment mp3 export at 192k, Preprocessing_Dataset/unifies_violin_
// datasets.py): decode via the system libmpg123 and encode via the system
// libmp3lame, both resolved lazily with dlopen against their stable C ABIs
// (no headers or link-time deps needed). When the libraries are absent the
// mp3 entry points report failure and the Python layer degrades to wav-only
// with a clear error.

#include <dlfcn.h>

#include <algorithm>
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

// ------------------------- mp3 decode: libmpg123 ---------------------------

using mpg123_handle = void;
constexpr int kMpg123Done = -12;          // MPG123_DONE
constexpr int kMpg123EncFloat32 = 0x200;  // MPG123_ENC_FLOAT_32
constexpr int kMpg123AddFlags = 2;        // MPG123_ADD_FLAGS
constexpr long kMpg123ForceFloat = 0x400; // MPG123_FORCE_FLOAT

struct Mpg123 {
  int (*init)() = nullptr;  // optional (no-op in modern versions)
  mpg123_handle* (*make)(const char*, int*) = nullptr;
  void (*destroy)(mpg123_handle*) = nullptr;
  int (*param)(mpg123_handle*, int, long, double) = nullptr;
  int (*open)(mpg123_handle*, const char*) = nullptr;
  int (*close)(mpg123_handle*) = nullptr;
  int (*getformat)(mpg123_handle*, long*, int*, int*) = nullptr;
  int (*format_none)(mpg123_handle*) = nullptr;
  int (*format)(mpg123_handle*, long, int, int) = nullptr;
  int (*read)(mpg123_handle*, unsigned char*, size_t, size_t*) = nullptr;
  int (*scan)(mpg123_handle*) = nullptr;
  int64_t (*length)(mpg123_handle*) = nullptr;

  bool ok() const {
    return make && destroy && param && open && close && getformat &&
           format_none && format && read;
  }
};

void* sym2(void* dso, const char* primary, const char* fallback) {
  void* s = dlsym(dso, primary);
  return s ? s : dlsym(dso, fallback);
}

const Mpg123* mpg123() {
  static Mpg123 api;
  static bool tried = false, usable = false;
  if (!tried) {
    tried = true;
    void* dso = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!dso) dso = dlopen("libmpg123.so", RTLD_NOW | RTLD_LOCAL);
    if (dso) {
      api.init = (int (*)())dlsym(dso, "mpg123_init");
      api.make = (mpg123_handle * (*)(const char*, int*)) dlsym(dso, "mpg123_new");
      api.destroy = (void (*)(mpg123_handle*))dlsym(dso, "mpg123_delete");
      api.param = (int (*)(mpg123_handle*, int, long, double))
          dlsym(dso, "mpg123_param");
      // LFS: prefer the explicit 64-bit entry points where they exist
      api.open = (int (*)(mpg123_handle*, const char*))
          sym2(dso, "mpg123_open_64", "mpg123_open");
      api.close = (int (*)(mpg123_handle*))dlsym(dso, "mpg123_close");
      api.getformat = (int (*)(mpg123_handle*, long*, int*, int*))
          dlsym(dso, "mpg123_getformat");
      api.format_none = (int (*)(mpg123_handle*))dlsym(dso, "mpg123_format_none");
      api.format = (int (*)(mpg123_handle*, long, int, int))
          sym2(dso, "mpg123_format_64", "mpg123_format");
      api.read = (int (*)(mpg123_handle*, unsigned char*, size_t, size_t*))
          dlsym(dso, "mpg123_read");
      api.scan = (int (*)(mpg123_handle*))dlsym(dso, "mpg123_scan");
      api.length = (int64_t (*)(mpg123_handle*))
          sym2(dso, "mpg123_length_64", "mpg123_length");
      usable = api.ok();
      if (usable && api.init) api.init();
    }
  }
  return usable ? &api : nullptr;
}

// Open an mp3 and negotiate interleaved float32 output at the native rate.
// Returns the handle (caller closes+deletes) or nullptr.
mpg123_handle* mp3_open(const char* path, long* rate, int* channels) {
  const Mpg123* m = mpg123();
  if (!m) return nullptr;
  int err = 0;
  mpg123_handle* h = m->make(nullptr, &err);
  if (!h) return nullptr;
  // force float32 output BEFORE open — format() restrictions applied after
  // open only take effect at the next stream, so the flag is the reliable way
  m->param(h, kMpg123AddFlags, kMpg123ForceFloat, 0.0);
  if (m->open(h, path) != 0) {
    m->destroy(h);
    return nullptr;
  }
  int enc = 0;
  if (m->getformat(h, rate, channels, &enc) != 0 || *channels <= 0 ||
      enc != kMpg123EncFloat32) {
    m->close(h);
    m->destroy(h);
    return nullptr;
  }
  return h;
}

// ------------------------- mp3 encode: libmp3lame --------------------------

struct Lame {
  void* (*init)() = nullptr;
  int (*set_in_samplerate)(void*, int) = nullptr;
  int (*set_num_channels)(void*, int) = nullptr;
  int (*set_brate)(void*, int) = nullptr;
  int (*set_quality)(void*, int) = nullptr;
  int (*init_params)(void*) = nullptr;
  int (*encode_ieee_float)(void*, const float*, const float*, int,
                           unsigned char*, int) = nullptr;
  int (*flush)(void*, unsigned char*, int) = nullptr;
  size_t (*lametag)(void*, unsigned char*, size_t) = nullptr;  // optional
  int (*close)(void*) = nullptr;

  bool ok() const {
    return init && set_in_samplerate && set_num_channels && set_brate &&
           init_params && encode_ieee_float && flush && close;
  }
};

const Lame* lame() {
  static Lame api;
  static bool tried = false, usable = false;
  if (!tried) {
    tried = true;
    void* dso = dlopen("libmp3lame.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!dso) dso = dlopen("libmp3lame.so", RTLD_NOW | RTLD_LOCAL);
    if (dso) {
      api.init = (void* (*)())dlsym(dso, "lame_init");
      api.set_in_samplerate = (int (*)(void*, int))dlsym(dso, "lame_set_in_samplerate");
      api.set_num_channels = (int (*)(void*, int))dlsym(dso, "lame_set_num_channels");
      api.set_brate = (int (*)(void*, int))dlsym(dso, "lame_set_brate");
      api.set_quality = (int (*)(void*, int))dlsym(dso, "lame_set_quality");
      api.init_params = (int (*)(void*))dlsym(dso, "lame_init_params");
      api.encode_ieee_float = (int (*)(void*, const float*, const float*, int,
                                       unsigned char*, int))
          dlsym(dso, "lame_encode_buffer_ieee_float");
      api.flush = (int (*)(void*, unsigned char*, int))
          dlsym(dso, "lame_encode_flush");
      api.lametag = (size_t (*)(void*, unsigned char*, size_t))
          dlsym(dso, "lame_get_lametag_frame");
      api.close = (int (*)(void*))dlsym(dso, "lame_close");
      usable = api.ok();
    }
  }
  return usable ? &api : nullptr;
}

// File-kind sniff: 1 = RIFF/WAVE, 2 = mp3 (ID3 tag or MPEG frame sync),
// 0 = unknown.
int sniff_kind(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  unsigned char b[4] = {0};
  const size_t got = fread(b, 1, 4, f);
  fclose(f);
  if (got < 4) return 0;
  if (memcmp(b, "RIFF", 4) == 0) return 1;
  if (memcmp(b, "ID3", 3) == 0) return 2;
  if (b[0] == 0xFF && (b[1] & 0xE0) == 0xE0) return 2;
  return 0;
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

// Capability probes (0 = available).
int ast_mp3_decode_available() { return mpg123() ? 0 : -1; }
int ast_mp3_encode_available() { return lame() ? 0 : -1; }

// Query an mp3: returns 0 on success. frames = samples per channel
// (sample-accurate via a full stream scan).
int ast_mp3_info(const char* path, int* sample_rate, int* channels,
                 long* n_frames) {
  const Mpg123* m = mpg123();
  if (!m) return -1;
  long rate = 0;
  int ch = 0;
  mpg123_handle* h = mp3_open(path, &rate, &ch);
  if (!h) return -2;
  long frames = -1;
  if (m->scan && m->length) {
    if (m->scan(h) == 0) {
      const int64_t len = m->length(h);
      if (len > 0) frames = (long)len;
    }
  }
  if (frames < 0) {  // no scan support: decode to count
    std::vector<unsigned char> buf(1 << 16);
    size_t done = 0;
    int64_t total = 0;
    while (true) {
      const int rc = m->read(h, buf.data(), buf.size(), &done);
      total += (int64_t)(done / (sizeof(float) * ch));
      if (rc != 0) break;
    }
    frames = (long)total;
  }
  m->close(h);
  m->destroy(h);
  *sample_rate = (int)rate;
  *channels = ch;
  *n_frames = frames;
  return 0;
}

// Decode interleaved float32 samples. out must hold max_frames * channels
// floats. Returns frames read, < 0 on error.
long ast_mp3_read(const char* path, float* out, long max_frames) {
  const Mpg123* m = mpg123();
  if (!m) return -1;
  long rate = 0;
  int ch = 0;
  mpg123_handle* h = mp3_open(path, &rate, &ch);
  if (!h) return -2;
  const size_t want_bytes = (size_t)max_frames * ch * sizeof(float);
  size_t filled = 0;
  while (filled < want_bytes) {
    size_t done = 0;
    const int rc = m->read(h, reinterpret_cast<unsigned char*>(out) + filled,
                           want_bytes - filled, &done);
    filled += done;
    if (rc == kMpg123Done || (rc != 0 && done == 0)) break;
  }
  m->close(h);
  m->destroy(h);
  return (long)(filled / (sizeof(float) * ch));
}

// Encode interleaved float32 [-1,1] to mp3 at `kbps` (the reference's
// dataset unifier exports mp3-192k). Mono or stereo. Returns 0 on success.
int ast_mp3_write(const char* path, const float* interleaved, int channels,
                  long n_frames, int sample_rate, int kbps) {
  const Lame* l = lame();
  if (!l || (channels != 1 && channels != 2)) return -1;
  void* gf = l->init();
  if (!gf) return -2;
  l->set_in_samplerate(gf, sample_rate);
  l->set_num_channels(gf, channels);
  l->set_brate(gf, kbps);
  if (l->set_quality) l->set_quality(gf, 2);
  if (l->init_params(gf) < 0) {
    l->close(gf);
    return -3;
  }

  FILE* f = fopen(path, "wb");
  if (!f) {
    l->close(gf);
    return -4;
  }
  // deinterleave (lame takes per-channel planes; mono passes the same plane)
  std::vector<float> left((size_t)n_frames), right;
  if (channels == 2) right.resize((size_t)n_frames);
  for (long i = 0; i < n_frames; ++i) {
    left[(size_t)i] = interleaved[(size_t)i * channels];
    if (channels == 2) right[(size_t)i] = interleaved[(size_t)i * channels + 1];
  }
  std::vector<unsigned char> buf((size_t)(1.25 * n_frames) + 7200);
  int written = l->encode_ieee_float(
      gf, left.data(), channels == 2 ? right.data() : left.data(),
      (int)n_frames, buf.data(), (int)buf.size());
  int rc = 0;
  if (written < 0) rc = -5;
  if (rc == 0 && written > 0 &&
      fwrite(buf.data(), 1, (size_t)written, f) != (size_t)written)
    rc = -6;
  if (rc == 0) {
    written = l->flush(gf, buf.data(), (int)buf.size());
    if (written > 0 &&
        fwrite(buf.data(), 1, (size_t)written, f) != (size_t)written)
      rc = -6;
  }
  if (rc == 0 && l->lametag) {
    // rewrite the placeholder Xing/LAME frame at the file start so decoders
    // can trim the codec delay/padding (sample-accurate lengths)
    const size_t tag = l->lametag(gf, buf.data(), buf.size());
    if (tag > 0 && fseek(f, 0, SEEK_SET) == 0)
      if (fwrite(buf.data(), 1, tag, f) != tag) rc = -6;
  }
  fclose(f);
  l->close(gf);
  return rc;
}

// Generic probe: wav or mp3 by content sniff. Returns 0 on success and sets
// *kind to 1 (wav) or 2 (mp3).
int ast_audio_info(const char* path, int* sample_rate, int* channels,
                   long* n_frames, int* kind) {
  const int k = sniff_kind(path);
  *kind = k;
  if (k == 1) return ast_wav_info(path, sample_rate, channels, n_frames);
  if (k == 2) return ast_mp3_info(path, sample_rate, channels, n_frames);
  return -1;
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
// (utilityFunctions.py:105-122): decode (wav OR mp3, sniffed by content),
// pad/cut to cut_seconds at the ORIGINAL rate, resample to target_sr,
// downmix stereo->mono by mean. Returns samples written, < 0 on error.
// out must hold ceil(cut_seconds * max(sr_orig, target_sr)) + slack.
long ast_load_audio(const char* path, int target_sr, double cut_seconds,
                    float* out, long max_out) {
  int sr = 0, ch = 0, kind = 0;
  long frames = 0;
  if (ast_audio_info(path, &sr, &ch, &frames, &kind) != 0) return -1;

  const long cut = (long)(cut_seconds * sr);
  const long want = std::min(frames, cut);
  std::vector<float> inter((size_t)want * ch);
  const long got = (kind == 2) ? ast_mp3_read(path, inter.data(), want)
                               : ast_wav_read(path, inter.data(), want);
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

// Single-pass serving ingest: probe + decode + pad/cut + resample in ONE
// call, returning the probe results the caller would otherwise re-derive
// with separate ast_audio_info/ast_load_audio calls (each of which re-scans
// an mp3 stream). Clip seconds = clamp(stream length, min_seconds,
// max_seconds). out must hold ceil(max_seconds * target_sr) + slack (the
// output is at target_sr regardless of the source rate). Returns samples
// written, < 0 on error.
long ast_load_audio_probed(const char* path, int target_sr,
                           double max_seconds, double min_seconds,
                           float* out, long max_out, int* sr_orig,
                           long* n_frames_out, int* kind_out) {
  int sr = 0, ch = 0, kind = 0;
  long frames = 0;
  if (ast_audio_info(path, &sr, &ch, &frames, &kind) != 0) return -1;
  *sr_orig = sr;
  *n_frames_out = frames;
  *kind_out = kind;
  if (sr <= 0 || ch <= 0) return -2;

  double seconds = (double)frames / sr;
  if (seconds > max_seconds) seconds = max_seconds;
  if (seconds < min_seconds) seconds = min_seconds;

  const long cut = (long)(seconds * sr);
  const long want = std::min(frames, cut);
  std::vector<float> inter((size_t)want * ch);
  const long got = (kind == 2) ? ast_mp3_read(path, inter.data(), want)
                               : ast_wav_read(path, inter.data(), want);
  if (got < 0) return got;

  std::vector<float> mono((size_t)cut, 0.0f);
  for (long i = 0; i < got; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) acc += inter[(size_t)i * ch + c];
    mono[(size_t)i] = (float)(acc / ch);
  }

  return ast_resample(mono.data(), cut, sr, target_sr, out, max_out);
}

}  // extern "C"
