"""Input pipeline: 1-second clip dataset + prefetching batch loader.

Reference equivalent: OneSecClipsDataset (recursive *.wav glob, mono mean,
resample to 16 kHz, truncate/pad to 16000 samples; ref: py/main14.py:49-67)
plus DataLoader(num_workers=8..16, pin_memory) (ref: py/main14.py:383-385).

TPU-native shape: decode on host threads while the device computes, hand the
training loop ready (B, T) numpy batches; device transfer happens once per
batch inside the jitted step.  An optional native C++ WAV decoder
(awm_tpu.data.native) replaces the Python decode path when built.
"""

from __future__ import annotations

import concurrent.futures as cf
import glob
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from awm_tpu.config import AUDIO_LEN, SAMPLE_RATE
from awm_tpu.utils.audio_io import load_audio, resample, to_mono


class OneSecClips:
    """Recursive *.wav dataset of fixed-length clips (ref: py/main14.py:49-67)."""

    def __init__(self, root_dir: str, sample_rate: int = SAMPLE_RATE, audio_len: int = AUDIO_LEN):
        self.filepaths: List[str] = sorted(
            glob.glob(os.path.join(root_dir, "**", "*.wav"), recursive=True)
        )
        self.sample_rate = sample_rate
        self.audio_len = audio_len

    def __len__(self) -> int:
        return len(self.filepaths)

    def __getitem__(self, idx: int) -> np.ndarray:
        wav, sr = load_audio(self.filepaths[idx])
        x = to_mono(wav)
        if sr != self.sample_rate:
            x = resample(x, sr, self.sample_rate)
        if x.shape[-1] > self.audio_len:
            x = x[: self.audio_len]
        elif x.shape[-1] < self.audio_len:
            x = np.pad(x, (0, self.audio_len - x.shape[-1]))
        return np.asarray(x, dtype=np.float32)


def split_indices(
    n: int, fractions: Sequence[float] = (0.8, 0.1, 0.1), seed: int = 42
) -> Tuple[np.ndarray, ...]:
    """Deterministic random split (the reference's 80/10/10 random_split,
    ref: py/main14.py:370-385)."""
    idx = np.random.default_rng(seed).permutation(n)
    out, start = [], 0
    for frac in fractions[:-1]:
        k = int(round(frac * n))
        out.append(idx[start : start + k])
        start += k
    out.append(idx[start:])
    return tuple(out)


class BatchLoader:
    """Threaded prefetching loader: decodes clips with a worker pool and
    keeps up to `prefetch` ready batches ahead of the consumer — the host
    stays busy while the device runs the previous step."""

    def __init__(
        self,
        dataset: OneSecClips,
        batch_size: int,
        *,
        indices: Optional[np.ndarray] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 4,
        native: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0
        self.n_errors = 0  # undecodable clips seen (skip-and-count)
        # native C++ batch decoder (one C call per batch); requires a
        # filepath-backed dataset and a built libawmwav.so — falls back to
        # the Python decode path otherwise
        self._native = False
        if native and hasattr(dataset, "filepaths"):
            from awm_tpu.data import native as _native_mod

            self._native = _native_mod.available()
            self._native_mod = _native_mod

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        if not self.shuffle:
            return self.indices
        rng = np.random.default_rng(self.seed + self._epoch)
        return rng.permutation(self.indices)

    def __iter__(self) -> Iterator[np.ndarray]:
        order = self._epoch_order()
        self._epoch += 1
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        if not batches:
            return iter(())

        def safe_item(i: int) -> np.ndarray:
            """Skip-and-count on undecodable clips (the reference's per-file
            try/except spirit, ref: py/main14.py:1006-1009): a bad file
            becomes silence instead of killing the epoch."""
            try:
                return self.dataset[int(i)]
            except Exception as e:
                self.n_errors += 1
                if self.n_errors <= 5:
                    import warnings

                    warnings.warn(f"skipping undecodable clip idx {i}: {e}")
                return np.zeros(self.dataset.audio_len, dtype=np.float32)

        def load_batch(batch_idx: np.ndarray) -> np.ndarray:
            if self._native:
                paths = [self.dataset.filepaths[int(i)] for i in batch_idx]
                out, ok = self._native_mod.load_clips(
                    paths,
                    clip_len=self.dataset.audio_len,
                    target_sr=self.dataset.sample_rate,
                    n_threads=self.num_workers,
                )
                if ok.all():
                    return out
                # fall back per-file for anything the native decoder rejects
                for j in np.nonzero(~ok)[0]:
                    out[j] = safe_item(int(batch_idx[j]))
                return out
            return np.stack([safe_item(int(i)) for i in batch_idx])

        def gen():
            with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                futures: List[cf.Future] = []
                it = iter(batches)
                for _ in range(min(self.prefetch, len(batches))):
                    futures.append(pool.submit(load_batch, next(it)))
                for b in it:
                    done = futures.pop(0)
                    futures.append(pool.submit(load_batch, b))
                    yield done.result()
                for fut in futures:
                    yield fut.result()

        return gen()


class ConcatClips:
    """Concatenation of clip datasets — the speech+music training mix
    (VERDICT round-2 item 3: tonal content as a curriculum axis).  Index
    space is the datasets laid end to end; split_indices' shuffled split
    then distributes both sources across train/val/test."""

    def __init__(self, *datasets):
        assert datasets
        self.datasets = datasets
        self.audio_len = datasets[0].audio_len
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int) -> np.ndarray:
        k = int(np.searchsorted(self._offsets, idx, "right")) - 1
        return self.datasets[k][int(idx - self._offsets[k])]


class SyntheticClips:
    """Deterministic synthetic speech-like clips — fixture data for tests,
    benchmarks, and smoke training when no corpus is mounted."""

    def __init__(self, n: int = 256, audio_len: int = AUDIO_LEN, seed: int = 0):
        self.n = n
        self.audio_len = audio_len
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        t = np.arange(self.audio_len) / SAMPLE_RATE
        f0 = 120.0 + 200.0 * rng.random()
        x = (
            0.3 * np.sin(2 * np.pi * f0 * t)
            + 0.15 * np.sin(2 * np.pi * 2.3 * f0 * t + rng.random())
            + 0.05 * np.sin(2 * np.pi * 5.1 * f0 * t)
        ) * (0.6 + 0.4 * np.sin(2 * np.pi * (2.0 + 3.0 * rng.random()) * t))
        x = x + 0.02 * rng.standard_normal(self.audio_len)
        return x.astype(np.float32)


class SyntheticMusicClips:
    """Deterministic synthetic music-like clips: sustained triads on an
    equal-tempered scale with per-note decay envelopes and a percussive
    noise-burst pattern — deliberately OUT-OF-DOMAIN for the speech-like
    training distribution.  Stands in for the reference's music
    generalization sweeps (GTZAN ref: py/main15.py:1907, FMA :2030, personal
    songs py/main14.py:1641) in this corpus-free environment."""

    def __init__(self, n: int = 256, audio_len: int = AUDIO_LEN, seed: int = 0):
        self.n = n
        self.audio_len = audio_len
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 2_000_003 + idx)
        t = np.arange(self.audio_len) / SAMPLE_RATE
        root = 110.0 * 2.0 ** (rng.integers(0, 25) / 12.0)  # A2..A4 chromatic
        x = np.zeros_like(t)
        for ratio in (1.0, 2 ** (4 / 12), 2 ** (7 / 12)):  # major triad
            f = root * ratio
            decay = np.exp(-t / (0.4 + 0.8 * rng.random()))
            for harm, amp in ((1, 0.2), (2, 0.08), (3, 0.04)):
                x += amp * decay * np.sin(2 * np.pi * f * harm * t + rng.random())
        # percussive hits: short filtered noise bursts on a beat grid
        beat = int(SAMPLE_RATE / (1.8 + 1.4 * rng.random()))
        for start in range(0, self.audio_len, beat):
            dur = min(800, self.audio_len - start)
            burst = rng.standard_normal(dur) * np.exp(-np.arange(dur) / 150.0)
            x[start : start + dur] += 0.15 * burst
        x = x + 0.005 * rng.standard_normal(self.audio_len)
        return (0.9 * x / max(np.abs(x).max(), 1e-6) * 0.35).astype(np.float32)
