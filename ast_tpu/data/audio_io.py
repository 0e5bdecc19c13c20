"""Host-side audio loading with the reference's load_audio semantics.

Reference behavior (utilityFunctions.py:105-122): decode -> zero-pad/cut to
`cut_time_seconds` at the ORIGINAL sample rate -> resample to target ->
stereo->mono mean. The fast path is the framework's own C++ decoder +
polyphase resampler (ast_tpu/runtime/audio_native.cpp, the TPU-native
equivalent of the torchaudio/ffmpeg stack the reference leans on); the
wav fallback is the stdlib `wave` module + the same-kernel numpy resampler,
so both paths produce identical audio.

mp3 decode (torchaudio.load on .mp3, utilityFunctions.py:109) and mp3-192k
encode (the reference's AudioSegment export, Preprocessing_Dataset/
unifies_violin_datasets.py) go through the native runtime's dlopen'd system
libmpg123/libmp3lame with sample-accurate gapless lengths; when those
libraries are missing, mp3 paths raise a clear error and wav continues to
work."""

from __future__ import annotations

import ctypes
import functools
import math
import wave
from typing import Tuple

import numpy as np

from ast_tpu.dsp.resample import resample_np


@functools.lru_cache(maxsize=1)
def _native():
    """Load (building if needed) the native library; None if unavailable."""
    try:
        from ast_tpu.runtime.build import build

        lib = ctypes.CDLL(build())
        lib.ast_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_long)]
        lib.ast_wav_info.restype = ctypes.c_int
        lib.ast_wav_read.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.ast_wav_read.restype = ctypes.c_long
        lib.ast_load_audio.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_double,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_long]
        lib.ast_load_audio.restype = ctypes.c_long
        lib.ast_audio_info.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_long),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.ast_audio_info.restype = ctypes.c_int
        lib.ast_mp3_read.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.ast_mp3_read.restype = ctypes.c_long
        lib.ast_mp3_write.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int, ctypes.c_long,
                                      ctypes.c_int, ctypes.c_int]
        lib.ast_mp3_write.restype = ctypes.c_int
        lib.ast_mp3_decode_available.restype = ctypes.c_int
        lib.ast_mp3_encode_available.restype = ctypes.c_int
        lib.ast_load_audio_probed.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int)]
        lib.ast_load_audio_probed.restype = ctypes.c_long
        return lib
    except Exception:
        return None


def mp3_supported() -> bool:
    """True when native mp3 decode AND encode are available (system
    libmpg123 + libmp3lame resolved by the native runtime)."""
    lib = _native()
    return (lib is not None and lib.ast_mp3_decode_available() == 0
            and lib.ast_mp3_encode_available() == 0)


def wav_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, frames)."""
    lib = _native()
    if lib is not None:
        sr, ch, n = ctypes.c_int(), ctypes.c_int(), ctypes.c_long()
        if lib.ast_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                            ctypes.byref(n)) == 0:
            return sr.value, ch.value, n.value
    with wave.open(path, "rb") as w:
        return w.getframerate(), w.getnchannels(), w.getnframes()


def audio_info(path: str) -> Tuple[int, int, int, str]:
    """(sample_rate, channels, frames, kind) for wav OR mp3 (content-sniffed)."""
    lib = _native()
    if lib is not None:
        sr, ch, kind = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        n = ctypes.c_long()
        if lib.ast_audio_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                              ctypes.byref(n), ctypes.byref(kind)) == 0:
            return sr.value, ch.value, n.value, {1: "wav", 2: "mp3"}[kind.value]
        if kind.value == 2:
            if lib.ast_mp3_decode_available() == 0:
                # libmpg123 loaded fine — the FILE is the problem
                raise RuntimeError(f"{path}: unreadable mp3 stream "
                                   "(truncated or unsupported)")
            raise RuntimeError(
                f"{path}: mp3 detected but native mp3 decode is unavailable "
                "(system libmpg123 not found)")
    sr, ch, n = wav_info(path)
    return sr, ch, n, "wav"


def read_mp3(path: str) -> Tuple[np.ndarray, int]:
    """Decode an mp3 -> ((channels, samples) float32 in [-1,1], sr).
    Sample-accurate (gapless) when the encoder wrote a LAME/Xing tag."""
    lib = _native()
    if lib is None or lib.ast_mp3_decode_available() != 0:
        raise RuntimeError("native mp3 decode unavailable (libmpg123 missing)")
    sr, ch, n, kind = audio_info(path)
    if kind != "mp3":
        raise ValueError(f"{path} is not an mp3 file")
    buf = np.zeros(n * ch, np.float32)
    got = lib.ast_mp3_read(path.encode(),
                           buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        raise RuntimeError(f"mp3 decode failed for {path} (rc={got})")
    return buf[: got * ch].reshape(got, ch).T.copy(), sr


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Decode wav or mp3 (content-sniffed) -> ((channels, samples), sr)."""
    lib = _native()
    if lib is not None:
        _, _, _, kind = audio_info(path)
        if kind == "mp3":
            return read_mp3(path)
    return read_wav(path)


def write_mp3(path: str, data: np.ndarray, sample_rate: int = 22050,
              bitrate_kbps: int = 192) -> None:
    """Encode mono/stereo float32 [-1,1] to mp3 (defaults to the reference's
    192k export, Preprocessing_Dataset/unifies_violin_datasets.py)."""
    lib = _native()
    if lib is None or lib.ast_mp3_encode_available() != 0:
        raise RuntimeError("native mp3 encode unavailable (libmp3lame missing)")
    data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[None, :]
    if data.shape[0] > 2:
        raise ValueError("mp3 encode supports mono/stereo only")
    inter = np.ascontiguousarray(data.T.reshape(-1))
    rc = lib.ast_mp3_write(path.encode(),
                           inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           data.shape[0], data.shape[1], sample_rate,
                           int(bitrate_kbps))
    if rc != 0:
        raise RuntimeError(f"mp3 encode failed for {path} (rc={rc})")


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode a wav file -> ((channels, samples) float32 in [-1,1], sr)."""
    lib = _native()
    if lib is not None:
        sr, ch, n = wav_info(path)
        buf = np.zeros(n * ch, np.float32)
        got = lib.ast_wav_read(path.encode(),
                               buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        if got >= 0:
            return buf[: got * ch].reshape(got, ch).T.copy(), sr

    with wave.open(path, "rb") as w:
        sr, ch, n = w.getframerate(), w.getnchannels(), w.getnframes()
        raw = w.readframes(n)
        bits = w.getsampwidth() * 8
    if bits == 16:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif bits == 32:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif bits == 8:
        data = (np.frombuffer(raw, "u1").astype(np.float32) - 128.0) / 128.0
    elif bits == 24:
        b = np.frombuffer(raw, "u1").reshape(-1, 3)
        v = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        data = v.astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported wav bit depth {bits} in {path}")
    return data.reshape(-1, ch).T.copy(), sr


def load_audio(path: str, sample_rate: int = 22050,
               cut_time_seconds: float = 10.0,
               use_native: bool = True) -> Tuple[np.ndarray, int]:
    """Reference load_audio (utilityFunctions.py:105-122): returns
    ((1, samples) float32, sample_rate)."""
    lib = _native() if use_native else None
    if lib is not None:
        sr_orig, _, _, _ = audio_info(path)
        max_out = int(math.ceil(cut_time_seconds * max(sr_orig, sample_rate))) + 16
        buf = np.zeros(max_out, np.float32)
        got = lib.ast_load_audio(
            path.encode(), sample_rate, float(cut_time_seconds),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
        if got >= 0:
            return buf[:got][None, :].copy(), sample_rate

    wav, sr = read_audio(path)
    cut = int(cut_time_seconds * sr)
    if wav.shape[1] < cut:
        wav = np.pad(wav, ((0, 0), (0, cut - wav.shape[1])))
    wav = wav[:, :cut]
    if sr != sample_rate:
        wav = np.stack([resample_np(c, sr, sample_rate) for c in wav])
    if wav.shape[0] >= 2:
        wav = wav.mean(axis=0, keepdims=True)
    return wav.astype(np.float32), sample_rate


def load_audio_probed(path: str, sample_rate: int = 22050,
                      max_seconds: float = 300.0, min_seconds: float = 0.05,
                      ) -> Tuple[np.ndarray, int, int, str]:
    """Serving ingest: decode wav/mp3 with clip length = the stream's own
    duration clamped to [min_seconds, max_seconds], in ONE native call that
    also returns the probe info — ((1, n) float32, sr_orig, n_frames, kind).

    Unlike `load_audio` (the reference's fixed-10 s semantics,
    utilityFunctions.py:105-122) this derives the cut from the file itself,
    and an mp3 body is scanned once for headers + once for decode instead of
    the 3 probe passes the separate audio_info + load_audio calls cost."""
    lib = _native()
    if lib is not None:
        sr_o, kind_c = ctypes.c_int(), ctypes.c_int()
        frames = ctypes.c_long()
        max_out = int(math.ceil(max_seconds * sample_rate)) + 16
        buf = np.zeros(max_out, np.float32)
        got = lib.ast_load_audio_probed(
            path.encode(), sample_rate, float(max_seconds), float(min_seconds),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out,
            ctypes.byref(sr_o), ctypes.byref(frames), ctypes.byref(kind_c))
        if got >= 0:
            return (buf[:got][None, :].copy(), sr_o.value, frames.value,
                    {1: "wav", 2: "mp3"}.get(kind_c.value, "unknown"))
        raise RuntimeError(f"audio decode failed for {path} (rc={got})")

    sr, ch, n_frames, kind = audio_info(path)
    seconds = min(max(n_frames / max(1, sr), min_seconds), max_seconds)
    wav, _ = load_audio(path, sample_rate, seconds, use_native=False)
    return wav, sr, n_frames, kind


def write_wav(path: str, data: np.ndarray, sample_rate: int = 22050) -> None:
    """Write mono/stereo float32 [-1,1] as 16-bit PCM (the .wav export role
    soundfile plays in the reference's inference notebook)."""
    data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[None, :]
    pcm = np.clip(np.round(data.T * 32768.0), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(data.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
