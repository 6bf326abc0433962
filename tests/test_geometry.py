"""Geometry core: PLY io, partition, voxelize, top-k — round-trip tests.

Mirrors the reference's by-hand smoke checks (`inout_points.py:182-217`,
`process.py:84-109`) as a real unit suite (SURVEY.md §4).
"""

import numpy as np
import pytest

from pcgcv1_tpu.codec import pipeline
from pcgcv1_tpu.ops import partition, ply, topk, voxel


def test_ply_ascii_roundtrip(tmp_path, cloud):
    f = str(tmp_path / "a.ply")
    ply.write_ply(f, cloud)
    back = ply.load_ply(f)
    assert np.array_equal(np.sort(back, axis=0), np.sort(cloud, axis=0))


def test_ply_binary_roundtrip(tmp_path, cloud):
    f = str(tmp_path / "a.ply")
    ply.write_ply(f, cloud.astype(np.float32), ascii_fmt=False)
    back = ply.load_ply(f)
    assert np.array_equal(np.sort(back, axis=0), np.sort(cloud, axis=0))


def test_ply_normals_roundtrip(tmp_path, rng):
    pts = rng.integers(0, 100, size=(50, 3)).astype(np.float64)
    nrm = rng.normal(size=(50, 3))
    f = str(tmp_path / "n.ply")
    ply.write_ply(f, pts, normals=nrm)
    p, n = ply.load_ply_with_normals(f)
    np.testing.assert_allclose(p, pts, rtol=1e-6)
    np.testing.assert_allclose(n, nrm, rtol=1e-5)


def test_partition_matches_reference_semantics(cloud):
    """Compare the vectorized partitioner against a literal reimplementation
    of the reference algorithm (dict + linearized sort)."""
    cs, min_num = 64, 20
    local, ids, positions, counts = partition.partition_points(
        cloud, cs, min_num)

    # Literal reference algorithm (inout_points.py:50-90).
    cubes = {}
    for p in cloud:
        k = tuple(p // cs)
        cubes.setdefault(k, []).append(p % cs)
    cubes = {k: np.array(v) for k, v in cubes.items() if len(v) >= min_num}
    ref_positions = np.array(list(cubes.keys()))
    step = ref_positions.max() + 1
    lin = (ref_positions[:, 0] + ref_positions[:, 1] * step
           + ref_positions[:, 2] * step * step)
    order = np.argsort(np.sort(lin.reshape(-1)))  # identity; sort below
    ref_sorted = ref_positions[np.argsort(lin)]

    assert np.array_equal(positions, ref_sorted)
    # per-cube point sets match
    for i, pos in enumerate(positions):
        mine = local[ids == i]
        ref = cubes[tuple(pos)]
        assert np.array_equal(np.sort(mine, axis=0).astype(np.int64),
                              np.sort(ref, axis=0).astype(np.int64))
    assert counts.sum() == sum(len(v) for v in cubes.values())


def test_partition_assemble_roundtrip(cloud):
    cs = 64
    local, ids, positions, _ = partition.partition_points(cloud, cs, 1)
    per_cube = [local[ids == i] for i in range(len(positions))]
    back = partition.assemble_points(per_cube, positions, cs)
    assert np.array_equal(np.sort(back, axis=0),
                          np.sort(cloud, axis=0).astype(np.int64))


def test_voxelize_roundtrip(cloud):
    cs = 32
    local, ids, positions, _ = partition.partition_points(cloud, cs, 1)
    vox = voxel.points_to_voxels(local, ids, len(positions), cs)
    assert vox.shape == (len(positions), cs, cs, cs, 1)
    per_cube = voxel.voxels_to_points(vox)
    back = partition.assemble_points(per_cube, positions, cs)
    # voxelization dedups; cloud is already unique
    assert np.array_equal(np.sort(back, axis=0),
                          np.sort(cloud, axis=0).astype(np.int64))


def test_occupied_counts(cloud):
    cs = 64
    local, ids, positions, counts = partition.partition_points(cloud, cs, 1)
    vox = voxel.points_to_voxels(local, ids, len(positions), cs)
    occ = voxel.occupied_counts(vox)
    # cloud is unique, so occupied voxels == raw counts
    assert np.array_equal(occ, counts)


def test_select_voxels_counts(rng):
    vols = rng.normal(size=(4, 16, 16, 16, 1)).astype(np.float32)
    nums = np.array([100, 17, 3000, 1])
    mask = topk.select_voxels(vols, nums, rho=1.0)
    sel = mask.reshape(4, -1).sum(axis=1)
    # no ties in continuous random data: exact counts
    assert np.array_equal(sel.astype(int), nums)


def test_select_voxels_matches_reference(rng):
    """Against a literal reimplementation of get_adaptive_thres."""
    vols = (rng.random(size=(3, 8, 8, 8, 1)) * 100 - 50).astype(np.float32)
    nums = np.array([10, 200, 350])
    rho = 1.3
    mask = topk.select_voxels(vols, nums, rho=rho)
    for b in range(3):
        vol = vols[b]
        num = int(rho * nums[b])
        values = vol[vol > -2.0]
        if values.shape[0] < num:
            values = np.reshape(vol, [-1])
        values = np.sort(values)
        thres = values[-num]
        ref_mask = (vol >= thres).astype(np.float32)
        assert np.array_equal(mask[b], ref_mask[..., 0])


def test_select_voxels_fixed_threshold(rng):
    vols = rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32)
    mask = topk.select_voxels(vols, np.array([5, 5]), fixed_thres=0.0)
    assert np.array_equal(mask, (vols[..., 0] >= 0.0).astype(np.float32))


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_pipeline_lossless_roundtrip(tmp_path, cloud, scale):
    """preprocess -> (identity codec) -> postprocess must be lossless at
    scale 1 (the reference's own integration check, process.py:84-109)."""
    f = str(tmp_path / "in.ply")
    ply.write_ply(f, cloud)
    pre = pipeline.preprocess(f, scale=scale, cube_size=64, min_num=1)
    # identity "decoded" logits: occupancy 1.0 -> logit>0, empty -> <0
    logits = pre.cubes.astype(np.float32) * 10.0 - 5.0
    out = pipeline.postprocess_points(
        logits, pre.points_numbers, pre.cube_positions, scale=scale,
        cube_size=64, rho=1.0)
    if scale == 1:
        assert np.array_equal(
            np.sort(out.astype(np.int64), axis=0),
            np.sort(cloud, axis=0).astype(np.int64))
    else:
        # scaled path: reconstruction matches the scaled+descaled original
        ref = pipeline.scale_points(cloud, scale).astype(np.float64) / scale
        assert np.array_equal(np.sort(out, axis=0), np.sort(ref, axis=0))


def test_ply_vertex_count(tmp_path, cloud):
    from pcgcv1_tpu.ops.ply import ply_vertex_count
    f = str(tmp_path / "c.ply")
    ply.write_ply(f, cloud)
    assert ply_vertex_count(f) == len(cloud)


def test_topk_threshold_bf16_matches_sort(rng):
    """bf16 bisection path: threshold == k-th largest (sort semantics) in
    bf16, including heavy ties (bf16 rounding collides values)."""
    import jax.numpy as jnp
    flat32 = rng.normal(size=(5, 4096)).astype(np.float32)
    flat = jnp.asarray(flat32, jnp.bfloat16)
    k = np.array([1, 7, 100, 2048, 4096], np.int32)
    thres = np.asarray(topk.topk_threshold_bitwise(flat, jnp.asarray(k))
                       .astype(jnp.float32))
    rows = np.asarray(flat.astype(jnp.float32))
    for b in range(5):
        srt = np.sort(rows[b])[::-1]
        assert thres[b] == srt[k[b] - 1]
        # the >= mask selects at least k (ties may add more)
        assert (rows[b] >= thres[b]).sum() >= k[b]
