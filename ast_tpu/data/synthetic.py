"""Synthetic data fixtures.

Capability parity with the reference's only synthetic backend
(Preprocessing_Dataset/dummy_dataloader.py:5-28: random (S, 2, 287, 597)
windows + random label), plus a wav-fixture generator the reference lacks so
the real decode->featurize->train path is testable without a dataset."""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np

from ast_tpu.config import AudioConfig
from ast_tpu.data.audio_io import write_wav


def dummy_batches(batch_size: int = 16, sections: int = 4,
                  window_size: int = 287, feat_bins: int = 597,
                  seed: int = 0, num_batches: int = 8,
                  ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Random balanced batches in the model input layout — the
    dummy_dataloader.py equivalent."""
    rng = np.random.default_rng(seed)
    half = batch_size // 2
    for _ in range(num_batches):
        x = rng.standard_normal(
            (batch_size, sections, 2, window_size, feat_bins)).astype(np.float32)
        labels = np.concatenate([np.zeros(half, np.int32), np.ones(half, np.int32)])
        yield x, labels


# Physically-flavored synthesis. The reference trained on real piano/violin
# corpora (Preprocessing_Dataset/README); no audio can be downloaded here, so
# the fixture aims for instrument-like spectra instead of sine mixtures:
# piano = Karplus-Strong struck strings (sharp attack, fast per-partial
# decay, slight two-string detune), violin = bowed-string additive model
# (sawtooth-weighted harmonics shaped by body formants, 5.5 Hz vibrato, bow
# noise, slow attack). Transfer metrics (MFCC distance, instrumentation
# similarity, evaluation_style_transfer.py:99-119) become directionally
# meaningful on this fixture: the two classes have genuinely different
# spectral envelopes and onset statistics.

_SCALE = np.array([0, 2, 4, 5, 7, 9, 11, 12])  # major scale semitones
_MINOR = np.array([0, 2, 3, 5, 7, 8, 10, 12])  # natural minor semitones


def _melody(rng: np.random.Generator, dur: float, note_min: float,
            note_max: float, base: float = 220.0, scale: np.ndarray = None):
    """Random-walk melody over a scale: [(onset_s, dur_s, freq_hz)]."""
    scale = _SCALE if scale is None else scale
    notes = []
    t0 = 0.0
    deg = rng.integers(0, len(scale))
    while t0 < dur - 0.15:
        step = int(rng.integers(-2, 3))
        deg = int(np.clip(deg + step, 0, len(scale) - 1))
        note_dur = float(rng.uniform(note_min, note_max))
        f = base * 2 ** (scale[deg] / 12)
        notes.append((t0, min(note_dur, dur - t0), f))
        t0 += note_dur
    return notes


def _karplus_strong(f0: float, n: int, sr: int, rng: np.random.Generator,
                    decay: float = 0.996, blend: float = 0.5) -> np.ndarray:
    """Karplus-Strong plucked/struck string, vectorized period-by-period.

    Each period is the average of the previous period and its one-sample
    shift, scaled by `decay` — the classic y[n] = g*(y[n-L]+y[n-L-1])/2
    comb+lowpass loop evaluated a whole period at a time."""
    L = max(2, int(round(sr / f0)))
    buf = rng.uniform(-1.0, 1.0, L)
    # lowpass the excitation (felt hammer, not a metal pick): 3x 3-point MA
    for _ in range(3):
        buf = (buf + np.roll(buf, 1) + np.roll(buf, -1)) / 3.0
    buf -= buf.mean()
    buf /= np.abs(buf).max() + 1e-9
    out = np.empty(n, np.float64)
    pos = 0
    prev = buf
    while pos < n:
        m = min(L, n - pos)
        out[pos:pos + m] = prev[:m]
        prev = decay * (blend * prev + (1 - blend) * np.roll(prev, 1))
        pos += m
    return out


def _piano_clip(rng: np.random.Generator, n: int, sr: int,
                variety: float = 0.0) -> np.ndarray:
    """Struck-string clip: KS pairs slightly detuned, percussive envelope.

    variety > 0 randomizes per-clip register (±5/+7 semitone transpose),
    tempo, string decay, detune, octave-double level, hammer hardness and
    envelope decay — so a corpus spans genuinely different pianos/registers
    instead of one instrument replaying one tempo (the round-3 fixture)."""
    dur = n / sr
    clip = np.zeros(n)
    v = float(variety)
    # per-clip instrument/performance parameters (defaults = v=0 constants)
    transpose = 2.0 ** (v * rng.uniform(-5, 7) / 12) if v else 1.0
    tempo = rng.uniform(1 - 0.5 * v, 1 + 0.5 * v) if v else 1.0
    ks_decay = 0.996 + v * rng.uniform(-0.002, 0.002) if v else 0.996
    detune = 1.003 + v * rng.uniform(-0.002, 0.003) if v else 1.003
    oct_amp = 0.5 + v * rng.uniform(-0.2, 0.2) if v else 0.5
    env_decay = 1.6 * (rng.uniform(0.7, 1.4) if v else 1.0)
    hammer_amp = 0.5 + v * rng.uniform(-0.25, 0.35) if v else 0.5
    scale = (_MINOR if (v and rng.random() < 0.5) else _SCALE)
    # low register (the piano's energy mass sits low; KS damps highs fast)
    for (t0, note_dur, f) in _melody(rng, dur, 0.2 * tempo, 0.5 * tempo,
                                     base=110.0 * transpose, scale=scale):
        i0 = int(t0 * sr)
        # ring past the nominal note end, like a sustain pedal
        m = min(n - i0, int(sr * min(2.5, note_dur * 4)))
        if m <= 0:
            continue
        s = (_karplus_strong(f, m, sr, rng, decay=ks_decay)
             + 0.6 * _karplus_strong(f * detune, m, sr, rng, decay=ks_decay)
             + oct_amp * _karplus_strong(f * 2.0, m, sr, rng,
                                         decay=ks_decay))  # octave double
        tt = np.arange(m) / sr
        hammer = 1.0 + hammer_amp * np.exp(-tt * 40.0)  # attack transient
        s *= np.exp(-tt * env_decay) * hammer
        clip[i0:i0 + m] += 0.8 * s
    return clip


_FORMANTS = ((300.0, 1.0), (700.0, 0.9), (1800.0, 0.55), (3200.0, 0.35))


def _violin_clip(rng: np.random.Generator, n: int, sr: int,
                 variety: float = 0.0) -> np.ndarray:
    """Bowed-string clip: sawtooth-weighted additive harmonics with body
    formant emphasis, 5.5 Hz vibrato, bow-noise floor, slow attacks.

    variety > 0 randomizes per-clip register, tempo, vibrato rate/depth,
    body-formant emphasis, bow-noise level and attack/release times."""
    dur = n / sr
    clip = np.zeros(n)
    v = float(variety)
    transpose = 2.0 ** (v * rng.uniform(-5, 7) / 12) if v else 1.0
    tempo = rng.uniform(1 - 0.5 * v, 1 + 0.5 * v) if v else 1.0
    vib_rate = 5.5 + v * rng.uniform(-1.2, 1.5) if v else 5.5
    vib_depth = 0.007 + v * rng.uniform(-0.003, 0.004) if v else 0.007
    noise_amp = 0.02 + v * rng.uniform(-0.01, 0.02) if v else 0.02
    attack = 0.06 * (rng.uniform(0.6, 1.8) if v else 1.0)
    release = 0.05 * (rng.uniform(0.6, 1.8) if v else 1.0)
    # per-clip body response: jitter each formant's gain (a different box)
    formants = (tuple((fc, g * rng.uniform(1 - 0.4 * v, 1 + 0.4 * v))
                      for fc, g in _FORMANTS) if v else _FORMANTS)
    scale = (_MINOR if (v and rng.random() < 0.5) else _SCALE)
    # violin register sits well above the piano walk (A4 base)
    for (t0, note_dur, f) in _melody(rng, dur, 0.3 * tempo, 0.8 * tempo,
                                     base=440.0 * transpose, scale=scale):
        i0 = int(t0 * sr)
        m = min(n - i0, int(note_dur * sr))
        if m <= 0:
            continue
        tt = np.arange(m) / sr
        vib = f * (1 + vib_depth * np.sin(2 * np.pi * vib_rate * tt
                                          + rng.uniform(0, 6)))
        phase = 2 * np.pi * np.cumsum(vib) / sr
        s = np.zeros(m)
        for h in range(1, 16):
            fh = f * h
            if fh > 0.45 * sr:
                break
            # sawtooth 1/h roll-off shaped by the nearest body formant
            w = max(0.08, max(g * np.exp(-((fh - fc) / fc) ** 2)
                              for fc, g in formants))
            s += (w / h) * np.sin(h * phase)
        # bow noise: white noise amplitude-modulated by the fundamental
        noise = rng.standard_normal(m) * noise_amp * (1 + 0.5 * np.sin(phase))
        env = np.minimum(1.0, tt / attack) * np.minimum(1.0, (note_dur - tt) / release)
        clip[i0:i0 + m] += (s + noise) * np.clip(env, 0, None)
    # sympathetic open-string resonance (A4/E5): a quiet sustained layer that
    # anchors the instrument's spectral signature across clips
    tfull = np.arange(n) / sr
    wobble = 1 + 0.15 * np.sin(2 * np.pi * 0.4 * tfull + rng.uniform(0, 6))
    for fo in (440.0, 659.26):
        for h in range(1, 8):
            fh = fo * h
            if fh > 0.45 * sr:
                break
            w = max(0.08, max(g * np.exp(-((fh - fc) / fc) ** 2)
                              for fc, g in _FORMANTS))
            clip += 0.10 * (w / h) * np.sin(2 * np.pi * fh * tfull) * wobble
    return clip


# --- Phase-locked "chorale" fixtures -------------------------------------
#
# Why these exist: the decoder emits every window through one
# Linear(d_model -> 2*287*513) from a single 256-dim token (reference:
# SimpleDecoder_TransformerOnly.py:63-67), so its per-window outputs live in
# a rank-256 linear subspace. Measured on the free-phase variety corpus
# (scripts/pca_ceiling.py), the z-scored complex STFT windows are almost
# linearly white: a rank-1024 PCA captures ~1% of held-out energy, i.e. NO
# training can push held-out teacher-forced rel-L2 meaningfully below 1.0
# with this architecture — which is also a capacity explanation for the
# reference's own reported non-convergence on real piano/violin
# (README.md:152-154). The chorale fixtures bound the corpus's linear
# complexity so the architecture's ceiling is low while the MELODY stays
# random: note onsets/durations are quantized to the window step
# (191 frames), every pitch's excitation and phase are deterministic, and
# the only continuous free parameter is per-note velocity (a scalar on a
# dictionary atom — rank-free). Every window is then a combination of a
# finite atom dictionary (~100-200 atoms << 256), and held-out clips are
# UNSEEN melodies over that dictionary: compositional generalization the
# rank-256 codec can actually express.

_CHORALE_DEGREES = sorted(set(_SCALE) | set(_MINOR))  # 11 semitone degrees


def _chorale_melody(rng: np.random.Generator, n_steps: int,
                    octaves=(1.0, 2.0)):
    """Random-walk melody on the quantized grid: one note per window step,
    pitch = base * octave * 2^(degree/12), degree/octave drawn per note."""
    deg = int(rng.integers(0, len(_CHORALE_DEGREES)))
    notes = []
    for _ in range(n_steps):
        deg = int(np.clip(deg + rng.integers(-2, 3), 0,
                          len(_CHORALE_DEGREES) - 1))
        octave = float(octaves[int(rng.integers(0, len(octaves)))])
        vel = float(rng.uniform(0.5, 1.0))
        notes.append((_CHORALE_DEGREES[deg], octave, vel))
    return notes


def _chorale_piano_note(f0: float, m: int, sr: int) -> np.ndarray:
    """Deterministic struck string: KS excitation seeded by pitch, fixed
    decay/detune/octave-double — one reusable dictionary atom per pitch."""
    rng = np.random.default_rng(int(round(f0 * 16)))
    s = (_karplus_strong(f0, m, sr, rng)
         + 0.6 * _karplus_strong(f0 * 1.003, m, sr, rng)
         + 0.5 * _karplus_strong(f0 * 2.0, m, sr, rng))
    tt = np.arange(m) / sr
    return s * np.exp(-tt * 1.6) * (1.0 + 0.5 * np.exp(-tt * 40.0))


def _chorale_violin_note(f0: float, m: int, sr: int) -> np.ndarray:
    """Deterministic bowed string: fixed vibrato phase, pitch-seeded bow
    noise, fixed formant body and attack/release."""
    rng = np.random.default_rng(int(round(f0 * 16)) + 1)
    tt = np.arange(m) / sr
    vib = f0 * (1 + 0.007 * np.sin(2 * np.pi * 5.5 * tt))
    phase = 2 * np.pi * np.cumsum(vib) / sr
    s = np.zeros(m)
    for h in range(1, 16):
        fh = f0 * h
        if fh > 0.45 * sr:
            break
        w = max(0.08, max(g * np.exp(-((fh - fc) / fc) ** 2)
                          for fc, g in _FORMANTS))
        s += (w / h) * np.sin(h * phase)
    noise = rng.standard_normal(m) * 0.02 * (1 + 0.5 * np.sin(phase))
    dur = m / sr
    env = np.minimum(1.0, tt / 0.06) * np.minimum(1.0, (dur - tt) / 0.05)
    return (s + noise) * np.clip(env, 0, None)


def _chorale_clip(rng: np.random.Generator, n: int, sr: int, instrument: str,
                  cfg: AudioConfig) -> np.ndarray:
    """One chorale clip: one note per window step (step = 191 frames of
    hop 256 = 48896 samples), deterministic atoms scaled by random
    velocities. Base registers match the free-mode fixtures (110/440 Hz)."""
    step = (cfg.window_size - cfg.overlap_frames) * cfg.hop_length
    n_steps = -(-n // step)
    base = 110.0 if instrument == "piano" else 440.0
    clip = np.zeros(n)
    for k, (deg, octave, vel) in enumerate(
            _chorale_melody(rng, n_steps)):
        i0 = k * step
        f0 = base * octave * 2.0 ** (deg / 12)
        if instrument == "piano":
            # ring one fixed length past the step (sustain), like free mode
            m = min(n - i0, int(sr * 2.5))
            note = _chorale_piano_note(f0, int(sr * 2.5), sr)[:m]
        else:
            m = min(n - i0, step)
            note = _chorale_violin_note(f0, step, sr)[:m]
        clip[i0:i0 + m] += 0.8 * vel * note
    if instrument == "violin":
        # fixed-phase sympathetic resonance layer (identical every clip)
        tfull = np.arange(n) / sr
        wobble = 1 + 0.15 * np.sin(2 * np.pi * 0.4 * tfull)
        for fo in (440.0, 659.26):
            for h in range(1, 8):
                fh = fo * h
                if fh > 0.45 * sr:
                    break
                w = max(0.08, max(g * np.exp(-((fh - fc) / fc) ** 2)
                                  for fc, g in _FORMANTS))
                clip += 0.10 * (w / h) * np.sin(2 * np.pi * fh * tfull) * wobble
    return clip


def make_wav_fixture(root: str, n_clips: int = 3,
                     cfg: AudioConfig = AudioConfig(), seed: int = 0,
                     seconds: float = None,
                     variety: float = 0.0,
                     mode: str = "free") -> Tuple[str, str]:
    """Write deterministic synthetic piano/violin wav trees under `root`;
    returns (piano_dir, violin_dir). Piano clips are Karplus-Strong struck
    strings; violin clips are formant-shaped bowed-string tones — physically
    flavored enough that instrumentation/MFCC transfer metrics separate the
    classes (unlike sine mixtures).

    variety=0 (default) reproduces the round-3 fixtures bit-for-bit; at 1.0
    each clip draws its own register (±5/+7 semitones), tempo, scale
    (major/minor), string/bow parameters and body response — the corpus
    spread a held-out-generalization training run needs.

    mode="chorale" generates the phase-locked corpus instead (see the
    _chorale_* block above): window-step-quantized onsets, deterministic
    per-pitch atoms, random melodies/velocities — the corpus whose linear
    complexity the rank-256 output codec can actually cover (variety is
    ignored; melodic variety IS the generalization axis)."""
    rng = np.random.default_rng(seed)
    sr = cfg.sample_rate
    dur = cfg.clip_seconds if seconds is None else seconds
    n = int(dur * sr)

    piano_dir = os.path.join(root, "piano")
    violin_dir = os.path.join(root, "violin")
    os.makedirs(piano_dir, exist_ok=True)
    os.makedirs(violin_dir, exist_ok=True)

    def _norm(x: np.ndarray) -> np.ndarray:
        # RMS normalization (the reference preprocesses its violin corpus to
        # RMS 0.07, unifies_violin_datasets.py:24-30) + peak safety clip
        x = x * (0.1 / (np.sqrt((x ** 2).mean()) + 1e-9))
        return np.clip(x, -0.99, 0.99)

    for i in range(n_clips):
        if mode == "chorale":
            pc = _chorale_clip(rng, n, sr, "piano", cfg)
            vc = _chorale_clip(rng, n, sr, "violin", cfg)
        else:
            pc = _piano_clip(rng, n, sr, variety=variety)
            vc = _violin_clip(rng, n, sr, variety=variety)
        write_wav(os.path.join(piano_dir, f"piano_{i:03d}.wav"), _norm(pc), sr)
        write_wav(os.path.join(violin_dir, f"violin_{i:03d}.wav"), _norm(vc), sr)

    return piano_dir, violin_dir
