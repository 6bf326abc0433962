"""Generate the vox9 (res 511) held-out composite eval cloud.

Same mesh family / seed scheme as make_corpus.gen_eval_clouds but at the
MVUB-like vox9 resolution: ~4x fewer points than the vox10 composite, so
the 6-variant ablation sweep (~24 rate points, each an encode+decode+
pc_error round trip) fits a session deadline the vox10 cloud cannot. The
reference's own eval set spans vox9 content (MVUB) alongside 8iVFB vox10
(reference README.md:58-61), so BD comparisons at this resolution are
in-domain.
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
from make_corpus import (mesh_composite, sample_mesh_points,  # noqa: E402
                         random_rotation)
from pcgcv1_tpu.ops import ply  # noqa: E402


def main(out="artifacts/eval/eval_composite_vox9.ply", seed=786):
    rng = np.random.default_rng(seed)
    res, npts = 511, 1_500_000
    verts, faces = mesh_composite(rng)
    pts = sample_mesh_points(verts, faces, npts, rng)
    pts = pts @ random_rotation(rng).T
    pts = pts - pts.min(axis=0)
    pts = pts * (res / pts.max())
    pts = np.unique(np.round(pts), axis=0).astype(np.int32)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    ply.write_ply(out, pts)
    print(f"[vox9] {out}: {len(pts)} points @ res {res}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
