"""Multi-host (DCN) cube sharding.

The codec is embarrassingly parallel over cubes (SURVEY.md §2): the only
sequential component is the per-cube host range coder, and per-cube
payloads are independent. Multi-host deployment therefore needs no tensor
traffic over DCN at all:

1. every host partitions the same cloud (cheap, 0.1 s) or receives the
   canonical cube list from host 0;
2. each host takes a contiguous slice of the canonical cube order,
   compresses it on its local chips, and produces its per-cube strings;
3. the strings are concatenated in canonical cube order (the container is
   per-cube ragged, so concatenation is byte-exact);
4. z streams: each host codes the z slice of its own cubes; the container
   stores one z stream per shard (shard boundaries are implicit from the
   cube slice table).

This module provides the slicing/merging arithmetic, usable today on one
host (slices = chunks) and under `jax.distributed` on real multi-host pods.
"""

from __future__ import annotations

import numpy as np


def host_slices(num_cubes, num_hosts):
    """Contiguous balanced slices of the canonical cube order.

    Returns list of (start, stop) per host; all cubes covered, order
    preserved.
    """
    if num_hosts < 1:
        raise ValueError("num_hosts must be >= 1")
    base = num_cubes // num_hosts
    rem = num_cubes % num_hosts
    out = []
    start = 0
    for h in range(num_hosts):
        n = base + (1 if h < rem else 0)
        out.append((start, start + n))
        start += n
    return out


def shard_preprocess(pre, num_hosts, host_id):
    """Slice a PreprocessResult to this host's cubes."""
    lo, hi = host_slices(pre.cubes.shape[0], num_hosts)[host_id]
    import dataclasses
    return dataclasses.replace(
        pre, cubes=pre.cubes[lo:hi],
        cube_positions=pre.cube_positions[lo:hi],
        points_numbers=pre.points_numbers[lo:hi]), (lo, hi)


def merge_hyper_shards(shards):
    """Merge per-host HyperStreams (in host order == canonical cube order)
    into one multi-host HyperStreams.

    The merged object carries the per-host sub-streams in ``.shards`` —
    each an independent coding unit with its own coder tag/ranges/rANS
    states, so the merge is byte-exact (no re-coding). `bitstream.
    write_hyper` serializes it as the framed multi-host container and
    `read_hyper` round-trips it; the codec decodes shard by shard
    (`transforms.decompress_hyper*`).

    Aggregate fields (y payload list, ranges, z_shape, side info) are also
    populated so the merged object answers the same questions a
    single-host HyperStreams does.
    """
    from pcgcv1_tpu.codec.bitstream import HyperStreams

    first = shards[0]
    y_strings = [s for sh in shards for s in sh.y_strings]
    return HyperStreams(
        y_strings=y_strings,
        y_min_vs=np.concatenate([sh.y_min_vs for sh in shards]),
        y_max_vs=np.concatenate([sh.y_max_vs for sh in shards]),
        y_shape=first.y_shape,
        z_strings=b"".join(sh.z_strings for sh in shards),
        z_min_v=min(sh.z_min_v for sh in shards),
        z_max_v=max(sh.z_max_v for sh in shards),
        z_shape=(sum(sh.z_shape[0] for sh in shards),) + tuple(
            first.z_shape[1:]),
        points_numbers=np.concatenate(
            [np.asarray(sh.points_numbers) for sh in shards])
        if first.points_numbers is not None else None,
        cube_positions=np.concatenate(
            [np.asarray(sh.cube_positions) for sh in shards])
        if first.cube_positions is not None else None,
        coder=first.coder, lanes=first.lanes, chunk=first.chunk,
        prior=first.prior, prior_scales=first.prior_scales,
        y_range=first.y_range,
        shards=tuple(shards),
    )
