"""FourCastNet-style yearly-H5 MERRA2 datapipe.

Rebuilds the second legacy MERRA2 dataset of the reference,
``sres/data/era52merra2.py`` — dead code there on three counts: it imports
the nonexistent ``sres.base.source.merra2.model``, binds to NVIDIA DALI /
modulus, and its sample ``__call__`` references undefined names
(era52merra2.py:344-392: ``forecast_date``, ``day_offset``, an int
``train_steps`` iterated as a range) with the actual H5 sampling commented
out. This module implements the documented intent working:

  * yearly ``????.h5`` files holding ``fields`` of shape [N, C, H, W]
    (era52merra2.py:117-174 parse_dataset_files: per-year sample counts,
    channel validation, patch-size cropping of the image shape),
  * ``global_means.npy`` / ``global_stds.npy`` [1, C, 1, 1] normalization
    (era52merra2.py:175-208 load_statistics),
  * samples = (invar [C,H,W] at t, outvar [T,C,H,W] at t+stride..t+T*stride)
    (the commented sampler, era52merra2.py:381-390),
  * epoch-seeded shuffle identical across workers and ``array_split``
    rank sharding (era52merra2.py:336-358).

TPU-native notes: the DALI pipeline/GPU staging is replaced by host numpy
batches handed to JAX at the jit boundary — wrap the iterator with
data/input_pipeline.py backends for prefetch/pipelining. Files are opened
lazily per process (h5py handles are not fork-safe), matching the
reference's per-worker lazy open (era52merra2.py:348-352).
"""
from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class MERRA2H5Datapipe:
    """Iterable over (invar [B,C,H,W], outvar [B,T,C,H,W]) numpy batches."""

    def __init__(self, data_dir: str, stats_dir: Optional[str] = None,
                 channels: Optional[Sequence[int]] = None,
                 batch_size: int = 1, num_steps: int = 1, stride: int = 1,
                 patch_size: Optional[object] = None,
                 num_samples_per_year: Optional[int] = None,
                 shuffle: bool = True, process_rank: int = 0,
                 world_size: int = 1):
        if not os.path.isdir(data_dir):
            raise IOError(f"Error, data directory {data_dir} does not exist")
        if stats_dir is not None and not os.path.isdir(stats_dir):
            raise IOError(f"Error, stats directory {stats_dir} does not exist")
        self.data_dir, self.stats_dir = data_dir, stats_dir
        self.batch_size = int(batch_size)
        self.num_steps, self.stride = int(num_steps), int(stride)
        self.shuffle = shuffle
        self.process_rank, self.world_size = process_rank, world_size
        if isinstance(patch_size, int):
            patch_size = (patch_size, patch_size)
        self.patch_size: Optional[Tuple[int, int]] = patch_size
        self.channels = list(channels) if channels is not None else None
        self._files: Optional[List] = None
        self.epoch = 0
        self._parse_dataset_files(num_samples_per_year)
        self._load_statistics()
        # rank shard (same split as np.array_split in the reference)
        self.indices = np.array_split(np.arange(self.total_length),
                                      world_size)[process_rank]
        self.num_batches = len(self.indices) // self.batch_size

    # -- discovery (era52merra2.py:117-174) -----------------------------------
    def _parse_dataset_files(self, num_samples_per_year: Optional[int]) -> None:
        import h5py
        self.data_paths = sorted(
            p for p in glob.glob(os.path.join(self.data_dir, "????.h5"))
            if os.path.basename(p)[:4].isdigit())
        if not self.data_paths:
            raise IOError(f"no ????.h5 files under {self.data_dir}")
        self.n_years = len(self.data_paths)
        with h5py.File(self.data_paths[0], "r") as f:
            fields = f["fields"]
            # truncate to avoid out-of-range target sampling
            data_samples_per_year = fields.shape[0] - self.num_steps * self.stride
            self.img_shape = list(fields.shape[2:])
            nchan = fields.shape[1]
        if self.channels is None:
            self.channels = list(range(nchan))
        if max(self.channels) >= nchan:
            raise ValueError(f"channel index out of range: {self.channels} "
                             f"vs {nchan} fields")
        self.num_samples_per_year = (data_samples_per_year
                                     if num_samples_per_year is None
                                     else int(num_samples_per_year))
        if self.num_samples_per_year > data_samples_per_year:
            raise ValueError(
                f"num_samples_per_year ({self.num_samples_per_year}) > "
                f"samples available ({data_samples_per_year})")
        if self.patch_size is not None:
            self.img_shape = [s - s % self.patch_size[i]
                              for i, s in enumerate(self.img_shape)]
        self.total_length = self.n_years * self.num_samples_per_year

    # -- stats (era52merra2.py:175-208) ---------------------------------------
    def _load_statistics(self) -> None:
        if self.stats_dir is None:
            self.mu = self.sd = None
            return
        mean_file = os.path.join(self.stats_dir, "global_means.npy")
        std_file = os.path.join(self.stats_dir, "global_stds.npy")
        if not os.path.exists(mean_file):
            raise IOError(f"Mean statistics file {mean_file} not found")
        if not os.path.exists(std_file):
            raise IOError(f"Std statistics file {std_file} not found")
        self.mu = np.load(mean_file)[:, self.channels]
        self.sd = np.load(std_file)[:, self.channels]
        if not (self.mu.shape == self.sd.shape
                == (1, len(self.channels), 1, 1)):
            raise AssertionError("normalisation arrays have wrong shape")

    # -- sampling (the commented sampler, era52merra2.py:381-390) -------------
    def _open(self) -> List:
        if self._files is None:
            import h5py
            self._files = [h5py.File(p, "r") for p in self.data_paths]
        return self._files

    def _sample(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        files = self._open()
        year_idx = idx // self.num_samples_per_year
        in_idx = idx % self.num_samples_per_year
        data = files[year_idx]["fields"]
        invar = data[in_idx][self.channels]                     # [C,H,W]
        outvar = np.empty((self.num_steps,) + invar.shape, invar.dtype)
        for i in range(self.num_steps):
            outvar[i] = data[in_idx + (i + 1) * self.stride][self.channels]
        h, w = self.img_shape
        invar, outvar = invar[:, :h, :w], outvar[:, :, :h, :w]
        if self.mu is not None:
            invar = (invar - self.mu[0]) / self.sd[0]
            outvar = (outvar - self.mu) / self.sd
        return invar, outvar

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """One epoch of full batches; shuffle is seeded BY EPOCH so every
        rank permutes the same way (era52merra2.py:354-358)."""
        order = np.array(self.indices)
        if self.shuffle:
            np.random.default_rng(seed=self.epoch).shuffle(order)
        self.epoch += 1
        for b in range(self.num_batches):
            chunk = order[b * self.batch_size:(b + 1) * self.batch_size]
            pairs = [self._sample(int(i)) for i in chunk]
            yield (np.stack([p[0] for p in pairs]),
                   np.stack([p[1] for p in pairs]))

    def __len__(self) -> int:
        return self.num_batches

    def close(self) -> None:
        for f in (self._files or []):
            f.close()
        self._files = None
