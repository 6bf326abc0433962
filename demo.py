"""End-to-end walkthrough (the reference demo.ipynb as a script).

Generates (or takes) a point cloud, runs both codec modes through the full
compress -> container -> decompress -> classify -> metric pipeline, and
prints the bpp breakdown, D1/D2 PSNR, timings, and the encoder/decoder
determinism check.

    python demo.py [--input cloud.ply] [--ckpt_dir checkpoints/hyper_a2b3]
"""

import argparse
import warnings

import numpy as np

from pcgcv1_tpu.utils.jaxcache import enable_cache
from pcgcv1_tpu.utils.timer import StageTimer


def synthetic_cloud(res=1024, n=850_000, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 1, int(n * 1.4))
    v = rng.uniform(0, 1, int(n * 1.4))
    x = 300 + 220 * u + 60 * np.sin(6.28 * v)
    y = (res - 24) * v
    z = 400 + 150 * np.sin(3.1 * u + 2.0 * v) + 90 * u
    pts = np.stack([x, y, z], 1) + rng.normal(0, 1.2, (len(u), 3))
    return np.unique(np.clip(np.round(pts), 0, res - 1).astype(np.int32),
                     axis=0)


def main():
    enable_cache()
    warnings.simplefilter("ignore")
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="")
    ap.add_argument("--ckpt_dir", default="")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--n_points", type=int, default=850_000)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--rho", type=float, default=1.0)
    args = ap.parse_args()

    from pcgcv1_tpu.codec import bitstream, pipeline
    from pcgcv1_tpu.codec.transforms import PointCloudCodec
    from pcgcv1_tpu.metrics import estimate_normals, pc_error
    from pcgcv1_tpu.ops import load_ply

    timer = StageTimer()
    if args.input:
        pts = load_ply(args.input)
    else:
        pts = synthetic_cloud(args.res, args.n_points)
    print(f"input: {len(pts)} points, res {args.res}")

    with timer("preprocess"):
        pre = pipeline.preprocess_points(pts, cube_size=64, min_num=64)
    n_in = int(pre.points_numbers.astype(np.int64).sum())
    print(f"{pre.cubes.shape[0]} cubes, {n_in} occupied voxels")

    with timer("normals (for D2)"):
        normals = estimate_normals(pts)

    for mode in ("factorized", "hyper"):
        print(f"\n===== {mode} =====")
        codec = PointCloudCodec(mode=mode, chunk=args.chunk,
                                ckpt_dir=args.ckpt_dir or None)
        with timer(f"{mode}: encode"):
            if mode == "factorized":
                strings, mn, mx, shape = codec.compress_factorized(pre)
                fs = bitstream.FactorizedStreams(
                    strings, mn, mx, shape, pre.points_numbers,
                    pre.cube_positions)
                sizes = bitstream.write_factorized("demo", fs, "compressed")
            else:
                hs = codec.compress_hyper(pre)
                hs.points_numbers = pre.points_numbers
                hs.cube_positions = pre.cube_positions
                sizes = bitstream.write_hyper("demo", hs, "compressed")
        total = sum(sizes.values())
        parts = " + ".join(f"{k} {8*v/n_in:.4f}" for k, v in sizes.items())
        print(f"bpp: {8*total/n_in:.4f}  ({parts})")

        with timer(f"{mode}: decode"):
            if mode == "factorized":
                back = bitstream.read_factorized("demo", "compressed")
                masks = codec.decompress_factorized_masks(
                    back.strings, back.min_v, back.max_v, back.shape,
                    back.points_numbers, args.rho)
            else:
                back = bitstream.read_hyper("demo", "compressed")
                masks = codec.decompress_hyper_masks(
                    back, back.points_numbers, args.rho)
        with timer(f"{mode}: postprocess"):
            rec = pipeline.postprocess_from_masks(
                masks, back.cube_positions, 1.0, 64)
        with timer(f"{mode}: pc_error"):
            m = pc_error(pts, rec, args.res - 1, normals_a=normals)
        print(f"D1 PSNR {m['mseF,PSNR (p2point)']:.4f} dB   "
              f"D2 PSNR {m['mseF,PSNR (p2plane)']:.4f} dB   "
              f"({len(rec)} points out)")

        if mode == "hyper":
            _, recon_enc = codec.compress_hyper(pre,
                                                return_recon=True)
            logits_dec = codec.decompress_hyper(back)
            drift = float(np.abs(logits_dec - recon_enc).max())
            print(f"encoder-vs-decoder reconstruction drift: {drift} "
                  "(reference GPU bug: 1.14e-05)")

    print()
    timer.report()


if __name__ == "__main__":
    main()
