"""File-backed audio-visual corpus pipeline (LRS2-style real data).

The reference is synthetic-only — its single dataset draws sine mixtures on
the fly (reference dataset.py:23-151).  Real training corpora (LRS2/LRS3,
VoxCeleb2) are files on disk: per-utterance audio plus lip-crop frame
stacks.  This module provides that tier with the exact same batch contract
as the synthetic generator, so every downstream consumer (train step,
Separator, bench) is agnostic to where the data came from:

    {"mixed_spec":  (F, T) float32,
     "lip_frames":  (S * num_frames, H, W) float32,
     "clean_specs": (S, F, T) float32}

Layout: a corpus directory of ``sample_*.npz`` files, each holding
``audios`` (S, N_audio) float32 waveforms and ``lip_frames``
(S * num_frames, H, W) float32, plus a ``manifest.json`` recording the
geometry.  16-bit PCM WAV is also readable (stdlib ``wave`` — no external
audio deps in this image).

Two mixing modes:
  - **static**: each npz is a complete S-speaker sample (pre-paired);
  - **dynamic** (``dynamic_mix=True``): each draw picks S distinct
    utterances and mixes their first waveforms — the standard on-the-fly
    mixture augmentation for separation training (every epoch sees new
    speaker pairings).

``write_synthetic_corpus`` materializes the bit-matching synthetic generator
into this format (used by tests and as a format example), and
``PrefetchIterator`` overlaps host IO/STFT with device steps via a bounded
background thread pool.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import wave
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from av_separation_tpu.config import DataConfig
from av_separation_tpu.data.synthetic import (
    SyntheticAVDataset,
    stft_magnitude_np,
)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a mono/multichannel 16-bit PCM WAV -> ((C, N) float32 in [-1, 1],
    sample_rate).  Stdlib-only (no soundfile/librosa in this image)."""
    with wave.open(path, "rb") as f:
        assert f.getsampwidth() == 2, "only 16-bit PCM WAV supported"
        n = f.getnframes()
        raw = f.readframes(n)
        channels = f.getnchannels()
        rate = f.getframerate()
    pcm = np.frombuffer(raw, dtype="<i2").reshape(n, channels)
    return (pcm.T.astype(np.float32) / 32768.0), rate


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write (N,) or (C, N) float32 in [-1, 1] as 16-bit PCM WAV."""
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    pcm = np.clip(audio * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(pcm.shape[0])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.T.tobytes())


def write_synthetic_corpus(root: str, cfg: DataConfig,
                           num_samples: Optional[int] = None) -> str:
    """Materialize the synthetic generator into the file-corpus format.

    Writes sample_%05d.npz (audios (S, N) + lip_frames) and manifest.json.
    Sample i is bit-identical to SyntheticAVDataset(cfg)[i]'s sources.
    """
    os.makedirs(root, exist_ok=True)
    ds = SyntheticAVDataset(cfg)
    n = num_samples if num_samples is not None else cfg.num_samples
    for i in range(n):
        audios, rng = ds.clean_audios(i)
        lips = ds._lip_stream(audios, rng)
        np.savez(os.path.join(root, f"sample_{i:05d}.npz"),
                 audios=audios, lip_frames=lips)
    manifest = {
        "num_samples": n,
        "sample_rate": cfg.sample_rate,
        "num_speakers": cfg.num_speakers,
        "num_samples_audio": cfg.num_samples_audio,
        "num_frames": cfg.num_frames,
        "frame_h": cfg.frame_h,
        "frame_w": cfg.frame_w,
    }
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return root


class FileAVDataset:
    """File-backed AV separation dataset with the synthetic batch contract.

    Parameters
    ----------
    root        : corpus directory of sample_*.npz (+ manifest.json).
    cfg         : DataConfig supplying STFT geometry (n_fft, hop) and the
                  expected shapes; validated against the manifest.
    dynamic_mix : if True, sample i mixes the first-speaker waveforms of S
                  distinct utterances drawn deterministically from seed+i
                  (fresh pairings per epoch come from reseeding the loader).
    """

    def __init__(self, root: str, cfg: Optional[DataConfig] = None,
                 dynamic_mix: bool = False, seed: int = 0, **overrides):
        if cfg is None:
            cfg = DataConfig(**overrides)
        elif overrides:
            cfg = cfg.replace(**overrides)
        self.cfg = cfg
        self.root = root
        self.dynamic_mix = dynamic_mix
        self.seed = seed
        self.paths: List[str] = sorted(
            os.path.join(root, f) for f in os.listdir(root)
            if f.endswith(".npz"))
        if not self.paths:
            raise FileNotFoundError(f"no sample_*.npz under {root}")
        mpath = os.path.join(root, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                man = json.load(f)
            for key, want in (("sample_rate", cfg.sample_rate),
                              ("num_samples_audio", cfg.num_samples_audio),
                              ("frame_h", cfg.frame_h),
                              ("frame_w", cfg.frame_w)):
                have = man.get(key)
                if have is not None and have != want:
                    raise ValueError(
                        f"corpus manifest {key}={have} != config {want}")

    def __len__(self) -> int:
        return len(self.paths)

    def _load(self, path: str) -> Dict[str, np.ndarray]:
        with np.load(path) as z:
            return {"audios": z["audios"].astype(np.float32),
                    "lip_frames": z["lip_frames"].astype(np.float32)}

    def sources(self, idx: int) -> Dict[str, np.ndarray]:
        """Clean waveforms (S, N) + lip frames for sample `idx` (mixing
        applied in dynamic mode)."""
        cfg = self.cfg
        if not self.dynamic_mix:
            return self._load(self.paths[idx])
        rng = np.random.default_rng((self.seed, idx))
        picks = rng.choice(len(self.paths), size=cfg.num_speakers,
                           replace=False)
        audios, lips = [], []
        for p in picks:
            rec = self._load(self.paths[p])
            audios.append(rec["audios"][0])
            # per-utterance lip stream: first speaker's num_frames frames
            lips.append(rec["lip_frames"][:cfg.num_frames])
        return {"audios": np.stack(audios),
                "lip_frames": np.concatenate(lips, axis=0)}

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rec = self.sources(idx)
        audios = rec["audios"]
        mixed = audios.sum(axis=0).astype(np.float32)
        mixed_spec = stft_magnitude_np(mixed, cfg.n_fft, cfg.hop_length,
                                       cfg.num_stft_frames)
        clean_specs = np.stack([
            stft_magnitude_np(audios[s], cfg.n_fft, cfg.hop_length,
                              cfg.num_stft_frames)
            for s in range(audios.shape[0])
        ], axis=0)
        return {"mixed_spec": mixed_spec,
                "lip_frames": rec["lip_frames"],
                "clean_specs": clean_specs}


class PrefetchIterator:
    """Background-threaded shuffled batch iterator over a FileAVDataset.

    Host IO + STFT for the next batches overlaps the device step on the
    current one (bounded queue, `num_threads` loader threads).  Yields the
    standard stacked batch dict forever; `close()` (or GC) stops workers.

    Batch ORDER is deterministic regardless of `num_threads`: each index
    batch carries a sequence ticket assigned at shuffle time, and the
    consumer reorders worker output by ticket — so a resumed run replays
    bit-identical batches in the same order an uninterrupted run would
    (the property the other three pipelines already have; tested with
    num_threads=4 in tests/test_files.py).
    """

    def __init__(self, dataset: FileAVDataset, batch_size: int,
                 seed: int = 0, num_threads: int = 4, queue_depth: int = 4,
                 start_step: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        # Fast-forward the epoch-shuffle stream to the resume point: the
        # resumed run replays the same batch stream an uninterrupted run
        # would, in the same order (tickets serialize worker output).
        n = len(dataset)
        bpe = max(1, n // batch_size)
        for _ in range(start_step // bpe):
            self.rng.permutation(n)
        self._skip = start_step % bpe
        self._ticket = 0        # next ticket to assign (under _epoch_lock)
        self._next_ticket = 0   # next ticket to deliver (consumer only)
        self._stash: Dict[int, Dict[str, np.ndarray]] = {}
        self._idx_q: "queue.Queue[tuple]" = queue.Queue()
        self._out_q: "queue.Queue[tuple]" = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._epoch_lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_threads)
        ]
        self._refill()
        for t in self._threads:
            t.start()

    def _refill(self) -> None:
        n = len(self.ds)
        order = self.rng.permutation(n)
        for start in range(0, n - self.batch_size + 1, self.batch_size):
            if self._skip:
                self._skip -= 1
                continue
            self._idx_q.put((self._ticket,
                             list(order[start:start + self.batch_size])))
            self._ticket += 1

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                ticket, idx = self._idx_q.get(timeout=0.1)
            except queue.Empty:
                with self._epoch_lock:
                    if self._idx_q.empty():
                        self._refill()
                continue
            samples = [self.ds[i] for i in idx]
            batch = {k: np.stack([s[k] for s in samples])
                     for k in samples[0]}
            while not self._stop.is_set():
                try:
                    self._out_q.put((ticket, batch), timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        # Reorder worker output by ticket.  The stash is bounded by
        # num_threads + queue_depth: the consumer keeps draining the queue
        # while waiting for the next ticket, so a worker holding it never
        # deadlocks against a full queue.
        while self._next_ticket not in self._stash:
            ticket, batch = self._out_q.get()
            self._stash[ticket] = batch
        batch = self._stash.pop(self._next_ticket)
        self._next_ticket += 1
        return batch

    def close(self) -> None:
        self._stop.set()

    def __del__(self):  # pragma: no cover — best-effort cleanup
        self.close()
