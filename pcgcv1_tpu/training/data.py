"""Training data pipeline.

Capability parity with the reference's input path (`train_hyper.py:176-182`:
random.sample over per-cube h5 files -> host voxelize each step) plus a
faster packed format and a synthetic source for data-free smoke training.

Formats:
- h5 cube files (reference `generate_dataset.py` output): one file per
  cube, dataset key "data" = uint8/int16 [N,3] local coordinates.
- packed .npz shards: {"points": int16 [M,3], "offsets": int64 [C+1]} —
  one file holds many cubes; avoids the reference's
  one-small-file-per-cube filesystem pressure (~1e6 files).
"""

from __future__ import annotations

import glob
import random

import numpy as np

from pcgcv1_tpu.ops import voxel


def voxelize_cubes(point_lists, cube_size):
    """List of [N,3] int arrays -> uint8 [B, cs, cs, cs, 1] occupancy.

    uint8 transport: the trainer casts to compute dtype on device (the
    host->device link is the training bottleneck at f32, PERF_NOTES.md).
    """
    ids = np.concatenate([
        np.full(len(p), i, np.int64) for i, p in enumerate(point_lists)])
    pts = np.concatenate([np.asarray(p, np.int64) for p in point_lists])
    return voxel.points_to_voxels(pts, ids, len(point_lists), cube_size,
                                  dtype=np.uint8)

def prefetch(batches, depth=3):
    """Run a batch iterator in a background thread (the reference's input
    loop is fully serial with the step, train_hyper.py:176-182).

    Exceptions from the iterator re-raise in the consumer (a data-loading
    failure must abort training loudly, not end it silently), and the
    worker unblocks when the consumer stops early (generator close).
    """
    import queue as queue_mod
    import threading
    q = queue_mod.Queue(maxsize=depth)
    stop = object()
    closed = threading.Event()

    def put_until_closed(item):
        while not closed.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not put_until_closed(b):
                    return
            put_until_closed(stop)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            put_until_closed(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            b = q.get()
            if b is stop:
                return
            if isinstance(b, BaseException):
                raise b
            yield b
    finally:
        closed.set()


class H5CubeDataset:
    """Reference-format dataset: directory of per-cube .h5 files."""

    def __init__(self, pattern, cube_size=64, eval_ratio=9, seed=3):
        import h5py  # noqa: F401  (validated lazily per file)
        self.files = sorted(glob.glob(pattern))
        if not self.files:
            raise FileNotFoundError(f"no files match {pattern!r}")
        self.cube_size = cube_size
        rnd = random.Random(seed)
        # reference split: first 1/eval_ratio of the list is eval
        # (train_hyper.py:167,257)
        n_eval = len(self.files) // eval_ratio if eval_ratio else 0
        self.eval_files = self.files[:n_eval]
        self.train_files = self.files[n_eval:]
        self.rnd = rnd

    def _load(self, f):
        import h5py
        with h5py.File(f, "r") as h:
            return np.asarray(h["data"][:], np.int64)

    def batches(self, batch_size=8):
        while True:
            files = self.rnd.sample(self.train_files, batch_size)
            yield voxelize_cubes([self._load(f) for f in files],
                                 self.cube_size)

    def eval_batches(self, batch_size=8, samples=256):
        files = self.rnd.sample(
            self.eval_files, min(samples, len(self.eval_files)))
        for i in range(0, len(files) - batch_size + 1, batch_size):
            yield voxelize_cubes(
                [self._load(f) for f in files[i:i + batch_size]],
                self.cube_size)


class PackedCubeDataset:
    """Packed .npz shards of cubes, fully resident in host RAM.

    Batches sample cubes uniformly across the whole corpus, so any
    bounded shard cache would thrash (a 32-cube batch touches up to 32
    shards); the concatenated int16 corpus is small (~2 GB at 1e5 cubes)
    and one decompress pass at init beats per-batch shard reloads.
    """

    def __init__(self, pattern, cube_size=64, eval_ratio=9, seed=3):
        self.shards = sorted(glob.glob(pattern))
        if not self.shards:
            raise FileNotFoundError(f"no shards match {pattern!r}")
        self.cube_size = cube_size
        self.rnd = random.Random(seed)
        pts_parts, offs_parts = [], [np.zeros(1, np.int64)]
        base = 0
        for s in self.shards:
            with np.load(s) as z:
                pts_parts.append(z["points"])
                off = z["offsets"]
            offs_parts.append(off[1:] + base)
            base += off[-1]
        self._points = np.concatenate(pts_parts)
        self._offsets = np.concatenate(offs_parts)
        n_cubes = len(self._offsets) - 1
        n_eval = n_cubes // eval_ratio if eval_ratio else 0
        self.eval_ids = list(range(n_eval))
        self.train_ids = list(range(n_eval, n_cubes))

    def _load(self, ci):
        return self._points[
            self._offsets[ci]:self._offsets[ci + 1]].astype(np.int64)

    def batches(self, batch_size=8):
        while True:
            ids = self.rnd.sample(self.train_ids, batch_size)
            yield voxelize_cubes([self._load(i) for i in ids],
                                 self.cube_size)

    def eval_batches(self, batch_size=8, samples=256):
        ids = self.rnd.sample(self.eval_ids,
                              min(samples, len(self.eval_ids)))
        for i in range(0, len(ids) - batch_size + 1, batch_size):
            yield voxelize_cubes(
                [self._load(j) for j in ids[i:i + batch_size]],
                self.cube_size)


class SyntheticCubeDataset:
    """Procedural occupancy cubes (random smooth surfaces) for smoke
    training and benchmarks when no ShapeNet-style corpus is present."""

    def __init__(self, cube_size=64, seed=0, density=0.05):
        self.cube_size = cube_size
        self.rng = np.random.default_rng(seed)
        self.density = density

    def _one(self):
        cs = self.cube_size
        rng = self.rng
        xx, yy = np.meshgrid(np.arange(cs), np.arange(cs), indexing="ij")
        pts = []
        for _ in range(rng.integers(1, 3)):  # 1-2 surface sheets
            c = rng.normal(0, 1, 6)
            zz = (c[0] * cs / 2 + c[1] * xx / 4 + c[2] * yy / 4
                  + c[3] * xx * yy / (4 * cs) + c[4] * xx ** 2 / (4 * cs)
                  + c[5] * yy ** 2 / (4 * cs)) + cs / 2
            zz = np.clip(np.round(zz + rng.normal(0, 0.6, zz.shape)),
                         0, cs - 1).astype(np.int64)
            keep = rng.random(zz.shape) < 0.85
            sheet = np.stack([xx[keep], yy[keep], zz[keep]], 1)
            # random axis permutation so surfaces face every direction
            sheet = sheet[:, rng.permutation(3)]
            pts.append(sheet)
        return np.unique(np.concatenate(pts), axis=0)

    def batches(self, batch_size=8):
        while True:
            yield voxelize_cubes([self._one() for _ in range(batch_size)],
                                 self.cube_size)

    def eval_batches(self, batch_size=8, samples=32):
        for _ in range(max(1, samples // batch_size)):
            yield voxelize_cubes([self._one() for _ in range(batch_size)],
                                 self.cube_size)


def make_dataset(source, cube_size=64, **kw):
    """source: 'synthetic' | glob of .h5 files | glob of .npz shards.

    ``seed`` (accepted by every dataset) decorrelates per-host sampling
    in multi-host training (each process feeds its own batch shard).
    """
    if source == "synthetic":
        return SyntheticCubeDataset(cube_size=cube_size,
                                    seed=kw.get("seed", 0))
    if source.endswith(".npz"):
        return PackedCubeDataset(source, cube_size=cube_size, **kw)
    return H5CubeDataset(source, cube_size=cube_size, **kw)
