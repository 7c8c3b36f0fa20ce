"""Speech Commands keyword spotting (10-class subset or all 35 words).

Counterpart of the reference's ``SpeechCommands`` class
(ref dataloaders/basic.py:216-281) — which never worked there: its
``setup()`` imports a nonexistent ``src.dataloaders`` package.  This is a
functioning implementation of the same capability surface (``_name_: sc``,
``mfcc`` / ``dropped_rate`` / ``length`` / ``all_classes`` knobs, d_input
1-or-20 (+1 with dropped-sample masking), d_output 10/35, L 16000 raw or
161 MFCC frames).

Real data: the Google Speech Commands v0.02 directory layout
(``<word>/<file>.wav`` + ``validation_list.txt`` / ``testing_list.txt``)
is read with the stdlib ``wave`` module (16-bit PCM mono, no torchaudio
dependency).  Offline fallback: a synthetic harmonic-keyword generator —
each class is a distinct fundamental with class-specific harmonic envelope
and AM contour plus noise, so the classification task is learnable and
shape-faithful even without the corpus.

MFCC is a numpy log-mel + DCT-II pipeline (hann window, n_fft 400, hop 100
→ 161 center-padded frames at 16 kHz, 20 coefficients).  Byte-parity with
a torchaudio pipeline is explicitly NOT a target (the reference's own sc
path cannot run), only the standard feature semantics.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .base import SequenceDataset, argmax_accuracy

# the standard 10-word command subset (s4/lra convention)
SC10 = ("yes", "no", "up", "down", "left", "right", "on", "off", "stop", "go")
SC35 = SC10 + (
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "bed", "bird", "cat", "dog", "happy", "house", "marvin", "sheila",
    "tree", "wow", "backward", "forward", "follow", "learn", "visual",
)


def _read_wav(path: Path) -> np.ndarray:
    """16-bit PCM mono wav → float32 in [-1, 1] (stdlib only)."""
    import wave

    with wave.open(str(path), "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        channels = w.getnchannels()
    if width != 2:
        raise ValueError(f"{path}: only 16-bit PCM supported (width {width})")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x


def _fix_length(x: np.ndarray, length: int) -> np.ndarray:
    if len(x) >= length:
        return x[:length]
    return np.pad(x, (0, length - len(x)))


def _mel_filterbank(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale), (n_mels, n_fft//2+1)."""
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    pts = imel(np.linspace(mel(0.0), mel(sr / 2), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


def mfcc(
    x: np.ndarray, sr: int = 16000, n_mfcc: int = 20, n_fft: int = 400,
    hop: int = 100, n_mels: int = 64,
) -> np.ndarray:
    """(L,) waveform → (frames, n_mfcc) MFCC; 16000 samples → 161 frames."""
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    melspec = power @ _mel_filterbank(n_mels, n_fft, sr).T
    logmel = np.log(melspec + 1e-6)
    # orthonormal DCT-II over the mel axis
    k = np.arange(n_mels)
    basis = np.cos(np.pi / n_mels * (k[None, :] + 0.5) * np.arange(n_mfcc)[:, None])
    scale = np.full((n_mfcc, 1), np.sqrt(2.0 / n_mels))
    scale[0] = np.sqrt(1.0 / n_mels)
    return (logmel @ (basis * scale).T).astype(np.float32)


def _synthetic_keyword(rng, cls: int, n_classes: int, length: int, sr: int = 16000):
    """A distinct harmonic 'keyword' per class: class-specific fundamental,
    harmonic amplitude signature and AM contour, plus noise."""
    t = np.arange(length, dtype=np.float32) / sr
    f0 = 110.0 * (1.0 + cls * 0.35)  # well-separated fundamentals
    sig = np.zeros(length, np.float32)
    for h in range(1, 4):
        amp = 1.0 / h * (1.0 + 0.5 * np.sin(cls + h))  # class harmonic signature
        sig += amp * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    # class-dependent amplitude modulation (syllable rhythm)
    am = 0.55 + 0.45 * np.sin(2 * np.pi * (1.5 + 0.7 * (cls % 5)) * t)
    sig = sig * am.astype(np.float32)
    sig += rng.normal(0, 0.1, length).astype(np.float32)
    return sig


def _load_sc_tree(
    data_dir: Path, classes: Tuple[str, ...], length: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Google Speech Commands v0.02 layout → (train_x, train_y, test_x,
    test_y) raw waveforms; None when the tree is absent."""
    if not any((data_dir / c).is_dir() for c in classes):
        return None
    test_files = set()
    for lst in ("testing_list.txt", "validation_list.txt"):
        f = data_dir / lst
        if f.is_file():
            test_files.update(line.strip() for line in f.read_text().splitlines())
    tr_x: List[np.ndarray] = []
    tr_y: List[int] = []
    te_x: List[np.ndarray] = []
    te_y: List[int] = []
    for ci, cls in enumerate(classes):
        cdir = data_dir / cls
        if not cdir.is_dir():
            continue
        for wav in sorted(cdir.glob("*.wav")):
            x = _fix_length(_read_wav(wav), length)
            if f"{cls}/{wav.name}" in test_files:
                te_x.append(x)
                te_y.append(ci)
            else:
                tr_x.append(x)
                tr_y.append(ci)
    if not tr_x or not te_x:
        return None
    return (
        np.stack(tr_x), np.asarray(tr_y, np.int64),
        np.stack(te_x), np.asarray(te_y, np.int64),
    )


class SpeechCommands(SequenceDataset):
    _name_ = "sc"

    @property
    def init_defaults(self):
        # knob surface of ref dataloaders/basic.py:219-227
        return {
            "mfcc": False,
            "dropped_rate": 0.0,
            "length": 16000,
            "all_classes": False,
            "seed": 42,
            "synthetic": False,
            "synthetic_train": 512,
            "synthetic_test": 128,
        }

    @property
    def d_input(self) -> int:
        d = 20 if self.mfcc else 1
        return d + (1 if self.dropped_rate > 0.0 else 0)

    @property
    def d_output(self) -> int:
        return 35 if self.all_classes else 10

    @property
    def l_max(self) -> int:
        return 161 if self.mfcc else self.length

    def get_metrics(self, layer: str = "s4"):
        return argmax_accuracy

    def _featurize(self, waves: np.ndarray, rng) -> np.ndarray:
        # dropped_rate note: samples are dropped at the FEATURE rate (raw
        # timesteps, or MFCC frames when mfcc=True).  The s4-lineage SC
        # implementations drop raw samples pre-MFCC; the reference's own
        # class never ran, so there is no behavior to match — frame-level
        # dropping keeps the mask channel aligned with the model's input
        # sequence, which is what the d_input "+1" contract describes.
        if self.mfcc:
            feats = np.stack([mfcc(w) for w in waves])  # (N, 161, 20)
        else:
            # per-example standardized raw waveform
            mu = waves.mean(axis=1, keepdims=True)
            sd = waves.std(axis=1, keepdims=True) + 1e-6
            feats = ((waves - mu) / sd)[..., None]  # (N, L, 1)
        if self.dropped_rate > 0.0:
            # randomly zero samples and append the binary drop mask channel
            mask = rng.random(feats.shape[:2]) < self.dropped_rate
            feats = feats.copy()
            feats[mask] = 0.0
            feats = np.concatenate(
                [feats, mask[..., None].astype(np.float32)], axis=-1
            )
        return feats.astype(np.float32)

    def setup(self) -> None:
        classes = SC35 if self.all_classes else SC10
        loaded = None
        if self.data_dir and not self.synthetic:
            loaded = _load_sc_tree(Path(self.data_dir), classes, self.length)
        if loaded is None:
            if not self.synthetic:
                print(
                    f"SpeechCommands | no corpus under {self.data_dir!r}; "
                    "using the synthetic harmonic-keyword generator"
                )
            rng = np.random.default_rng(self.seed)
            nc = len(classes)
            tr_y = np.arange(self.synthetic_train, dtype=np.int64) % nc
            te_y = np.arange(self.synthetic_test, dtype=np.int64) % nc
            tr_x = np.stack([
                _synthetic_keyword(rng, int(c), nc, self.length) for c in tr_y
            ])
            te_x = np.stack([
                _synthetic_keyword(rng, int(c), nc, self.length) for c in te_y
            ])
        else:
            tr_x, tr_y, te_x, te_y = loaded

        rng = np.random.default_rng(self.seed + 1)
        self.train_inputs = self._featurize(tr_x, rng)
        self.train_labels = tr_y
        self.test_inputs = self._featurize(te_x, rng)
        self.test_labels = te_y
        print(
            f"SpeechCommands | {'mfcc' if self.mfcc else 'raw'} L={self.l_max} "
            f"classes={self.d_output} | train {len(tr_y)} test {len(te_y)}"
        )
