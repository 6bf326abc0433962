"""Interleaved A/B of rANS lane width on the decode direction.

Relay weather drifts minute to minute, so sequential bench runs confound
config with time. This alternates the two configs pass by pass in ONE
process (ABAB...), reporting per-pair deltas and medians — the only
protocol that has produced stable adoption decisions on this link
(PERF_NOTES round-3 lessons).

Usage: python scripts/ab_lanes.py [lanesA] [lanesB] [pairs] [chunk]
"""

import os
import statistics
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

warnings.simplefilter("ignore")

from pcgcv1_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import _release_ckpt  # noqa: E402
from pcgcv1_tpu.codec import pipeline  # noqa: E402
from pcgcv1_tpu.codec.transforms import PointCloudCodec  # noqa: E402
from pcgcv1_tpu.ops import load_ply  # noqa: E402


def main():
    la = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    lb = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 96
    ckpt = _release_ckpt()
    pts = load_ply("artifacts/composite_vox10.ply").astype(np.int32)
    pre = pipeline.preprocess_points(pts, cube_size=64, min_num=64)
    b = pre.cubes.shape[0]
    print(f"workload: {b} cubes, chunk {chunk}, ckpt {ckpt}")

    codecs, streams = {}, {}
    for lanes in (la, lb):
        c = PointCloudCodec(mode="hyper", chunk=chunk, dtype=jnp.bfloat16,
                            coder="device", ckpt_dir=ckpt, lanes=lanes,
                            mask_wire="rans")
        if lanes != la:
            c.params = codecs[la].params  # identical weights
        hs = c.compress_hyper(pre)          # also warms encode programs
        c.decompress_hyper_masks(hs, pre.points_numbers, 1.0)  # warm dec
        codecs[lanes], streams[lanes] = c, hs
        ys = sum(len(s) for s in hs.y_strings)
        print(f"lanes {lanes}: y stream {ys} B")

    deltas, rows = [], {la: [], lb: []}
    for i in range(pairs):
        for lanes in (la, lb):
            t0 = time.time()
            codecs[lanes].decompress_hyper_masks(
                streams[lanes], pre.points_numbers, 1.0)
            dt = time.time() - t0
            rows[lanes].append(b / dt)
        d = rows[lb][-1] - rows[la][-1]
        deltas.append(d)
        print(f"pair {i}: A({la}) {rows[la][-1]:.1f} c/s  "
              f"B({lb}) {rows[lb][-1]:.1f} c/s  delta {d:+.1f}")
    print(f"medians: A {statistics.median(rows[la]):.1f}  "
          f"B {statistics.median(rows[lb]):.1f}  "
          f"pairwise-delta median {statistics.median(deltas):+.1f} c/s")


if __name__ == "__main__":
    main()
