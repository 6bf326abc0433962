"""Round-5 checkpoint selection on held-out data.

The round-5 cosine-restart training of the a0.75 rung improves quality
but inflates the z stream on held-out content (encoder/estimator
co-adaptation: crop z bpp 0.132 @ 8.5k -> 0.170 @ 13k -> 0.223 @ 17.5k
while the TRAIN z falls — measured 2026-08-21). Rather than trust the
last step, score candidate checkpoints at the rung's operating point on
the held-out composite crop and release the winner:

    score = D1_psnr - SLOPE * bpp      (SLOPE = local R-D slope, dB/bpp)

The winner is snapshotted params-only into checkpoints/r5_<rung>_sel/
and the selected ladder written to artifacts/r5_ladder.txt (consumed by
scripts/round5_eval.sh's INI regen).

Usage: python scripts/round5_select.py [rung=a0.75b3] [steps=...]
"""

import os
import sys
import tempfile
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

from pcgcv1_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pcgcv1_tpu.codec import pipeline  # noqa: E402
from pcgcv1_tpu.codec.transforms import PointCloudCodec  # noqa: E402
from pcgcv1_tpu.metrics import estimate_normals, pc_error  # noqa: E402
from pcgcv1_tpu.ops import load_ply_with_normals  # noqa: E402
from pcgcv1_tpu.utils import checkpoint as ckpt_lib  # noqa: E402

# local release-curve slope around each rung's operating point (dB/bpp),
# read off the round-4 composite curve between adjacent rungs
# (R4->R5 +1.75 dB/+0.065 bpp, R5->R6 +0.9/+0.10, R6->R7 +0.34/+0.14)
SLOPES = {"a0.75b3": 26.0, "a2b3": 15.0, "a6b3": 6.0, "a16b3": 2.5}
CROP = "artifacts/composite_crop_vox10.ply"


def eval_step(ckpt_src, pre, pts, nrm, n):
    codec = PointCloudCodec(mode="hyper", chunk=96, dtype=jnp.bfloat16,
                            coder="device", ckpt_dir=ckpt_src)
    hs = codec.compress_hyper(pre)
    tot = sum(len(s) for s in hs.y_strings) + len(hs.z_strings)
    masks = codec.decompress_hyper_masks(hs, pre.points_numbers, 1.0)
    rec = pipeline.postprocess_from_masks(masks, pre.cube_positions,
                                          1.0, 64)
    m = pc_error(pts, rec, 1023, normals_a=nrm)
    return (8 * tot / n, m["mseF,PSNR (p2point)"],
            m["mseF,PSNR (p2plane)"])


def select_rung(rung, steps_arg, pre, pts, nrm, n):
    ckdir = f"checkpoints/r2_{rung}"
    avail = sorted(int(d.split("-")[1]) for d in os.listdir(ckdir)
                   if d.startswith("ckpt-"))
    if steps_arg:
        steps = [int(s) for s in steps_arg.split(",")]
    elif rung == "a0.75b3":
        # round-4 release state, mid-restart, and the last two saves
        steps = sorted({s for s in (8500, 13000, avail[-2], avail[-1])
                        if s in avail})
    else:
        # untouched this round: last save vs two earlier ones
        cand = [avail[-1]]
        if len(avail) > 3:
            cand += [avail[-4]]
        if len(avail) > 7:
            cand += [avail[-8]]
        steps = sorted(set(cand))
    print(f"{ckdir}: candidates {steps} "
          f"(available {avail[0]}..{avail[-1]})", flush=True)
    if len(steps) == 1:
        return ckdir  # nothing to choose

    rows = []
    for s in steps:
        with tempfile.TemporaryDirectory() as td:
            os.symlink(os.path.abspath(f"{ckdir}/ckpt-{s}"),
                       os.path.join(td, f"ckpt-{s}"))
            bpp, d1, d2 = eval_step(td, pre, pts, nrm, n)
        score = d1 - SLOPES[rung] * bpp
        rows.append((score, s, bpp, d1, d2))
        print(f"  step {s}: {bpp:.4f} bpp  D1 {d1:.2f}  D2 {d2:.2f}  "
              f"score {score:.2f}", flush=True)
    rows.sort(reverse=True)
    _, best, bpp, d1, d2 = rows[0]
    print(f"{rung} winner: step {best} ({bpp:.4f} bpp, D1 {d1:.2f})")
    if best == avail[-1]:
        return ckdir  # latest won; keep the live dir

    out = f"checkpoints/r5_{rung}_sel"
    with tempfile.TemporaryDirectory() as td:
        os.symlink(os.path.abspath(f"{ckdir}/ckpt-{best}"),
                   os.path.join(td, f"ckpt-{best}"))
        state = ckpt_lib.restore(td)
    ckpt_lib.save(out, {"params": state["params"]}, step=best)
    print(f"snapshotted -> {out} (step {best})")
    return out


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    steps_arg = sys.argv[2] if len(sys.argv) > 2 else ""

    pts, nrm = load_ply_with_normals(CROP)
    if nrm is None:
        nrm = estimate_normals(pts)
    pts = np.asarray(pts)
    pre = pipeline.preprocess_points(pts.astype(np.int32),
                                     cube_size=64, min_num=64)
    n = int(pre.points_numbers.astype(np.int64).sum())

    ladder = []
    for rung in ("a0.75b3", "a2b3", "a6b3", "a16b3"):
        if only and rung != only:
            ladder.append(f"checkpoints/r2_{rung}")
            continue
        ladder.append(select_rung(rung, steps_arg if only else "",
                                  pre, pts, nrm, n))
    with open("artifacts/r5_ladder.txt", "w") as f:
        f.write("\n".join(ladder) + "\n")
    print(f"ladder -> artifacts/r5_ladder.txt: {ladder}")


if __name__ == "__main__":
    main()
