"""Point-cloud geometry quality metrics (MPEG pc_error equivalent).

Capability parity with the reference's bundled MPEG PCC quality binary
(`myutils/pc_error_d`, driven via `myutils/pc_error_wrapper.py`): D1
point-to-point and D2 point-to-plane MSE/PSNR plus Hausdorff variants, with
the MPEG conventions:

- per direction, each source point is matched to its nearest neighbor in
  the other cloud (squared euclidean);
- p2plane projects the error vector onto the unit normal at the matched
  point of the *original* cloud A (the only cloud with normals; pc_error's
  `-n` flag supplies normals for file A, `pc_error_wrapper.py:48-53`);
- the symmetric ("F") metric takes the max of the two directional MSEs;
- PSNR = 10 log10(3 * peak^2 / mse) with peak = resolution
  (the wrapper passes `--resolution=res-1`, e.g. 1023 for vox10).

Implementation: scipy cKDTree nearest neighbors (exact), vectorized numpy.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def _psnr(peak, mse):
    if mse <= 0:
        return float("inf")
    return 10.0 * np.log10(3.0 * float(peak) ** 2 / mse)


def _directional(src, dst):
    """NN match src->dst.

    Returns (sq_dists [n], err_vectors [n,3], nn_indices [n]).
    """
    tree = cKDTree(dst)
    d, idx = tree.query(src, k=1, workers=-1)
    err = src - dst[idx]
    return d ** 2, err, idx


def pc_error(points_a, points_b, resolution, normals_a=None):
    """Compute D1/D2 metrics between original A and reconstruction B.

    Args:
      points_a: [Na,3] original points.
      points_b: [Nb,3] reconstructed points.
      resolution: peak value (pass res-1, e.g. 1023 for vox10, matching the
        reference wrapper convention).
      normals_a: optional [Na,3] normals of A (enables D2).

    Returns: dict with keys matching the reference wrapper's scraped headers
      (`pc_error_wrapper.py:29-44`): per-direction and symmetric mse/PSNR
      for p2point (and p2plane when normals are given), plus Hausdorff.
    """
    a = np.asarray(points_a, np.float64)
    b = np.asarray(points_b, np.float64)
    peak = float(resolution)

    # direction 1: A as source, match into B; p2plane normal = n_a
    sq_ab, err_ab, idx_ab = _directional(a, b)
    # direction 2: B as source, match into A; p2plane normal = n_a[idx]
    sq_ba, err_ba, idx_ba = _directional(b, a)

    mse1 = float(sq_ab.mean())
    mse2 = float(sq_ba.mean())
    mseF = max(mse1, mse2)
    h1 = float(sq_ab.max())
    h2 = float(sq_ba.max())
    hF = max(h1, h2)

    out = {
        "mse1      (p2point)": mse1,
        "mse1,PSNR (p2point)": _psnr(peak, mse1),
        "mse2      (p2point)": mse2,
        "mse2,PSNR (p2point)": _psnr(peak, mse2),
        "mseF      (p2point)": mseF,
        "mseF,PSNR (p2point)": _psnr(peak, mseF),
        "h.       1(p2point)": h1,
        "h.,PSNR  1(p2point)": _psnr(peak, h1),
        "h.       2(p2point)": h2,
        "h.,PSNR  2(p2point)": _psnr(peak, h2),
        "h.        (p2point)": hF,
        "h.,PSNR   (p2point)": _psnr(peak, hF),
    }

    if normals_a is not None:
        n = np.asarray(normals_a, np.float64)
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.where(norm > 0, norm, 1.0)
        # pc_error (v0.13.4, averageNormals=1) transfers normals onto B by
        # reverse splatting: normal(b) := mean of the normals of every a
        # whose (tied) nearest neighbor is b, NOT re-normalized. Direction 1
        # (loop over A, "use normals on B") projects the error onto that
        # transferred normal. Validated against the MPEG binary: Hausdorff
        # matches to 4 decimals, MSE within ~0.1% (residual = NN tie-pick
        # order inside its kd-tree).
        k_t = min(8, len(b))
        d_t, i_t = cKDTree(b).query(a, k=k_t, workers=-1)
        d_t = d_t.reshape(len(a), -1)
        i_t = i_t.reshape(len(a), -1)
        tied = np.abs(d_t - d_t[:, :1]) < 1e-9
        n_b = np.zeros((len(b), 3), np.float64)
        cnt = np.zeros(len(b), np.float64)
        for k in range(k_t):
            sel = tied[:, k]
            np.add.at(n_b, i_t[sel, k], n[sel])
            np.add.at(cnt, i_t[sel, k], 1)
        mapped = cnt > 0
        n_b[mapped] /= cnt[mapped, None]
        p1 = (err_ab * n_b[idx_ab]).sum(axis=1) ** 2
        # direction 2 (loop over B, normals on A): true normal at the match
        p2 = (err_ba * n[idx_ba]).sum(axis=1) ** 2
        mse1p = float(p1.mean())
        mse2p = float(p2.mean())
        mseFp = max(mse1p, mse2p)
        h1p, h2p = float(p1.max()), float(p2.max())
        hFp = max(h1p, h2p)
        out.update({
            "mse1      (p2plane)": mse1p,
            "mse1,PSNR (p2plane)": _psnr(peak, mse1p),
            "mse2      (p2plane)": mse2p,
            "mse2,PSNR (p2plane)": _psnr(peak, mse2p),
            "mseF      (p2plane)": mseFp,
            "mseF,PSNR (p2plane)": _psnr(peak, mseFp),
            "h.       1(p2plane)": h1p,
            "h.,PSNR  1(p2plane)": _psnr(peak, h1p),
            "h.       2(p2plane)": h2p,
            "h.,PSNR  2(p2plane)": _psnr(peak, h2p),
            "h.        (p2plane)": hFp,
            "h.,PSNR   (p2plane)": _psnr(peak, hFp),
        })
    return out


def estimate_normals(points, k=16):
    """KNN-PCA normal estimation (the reference generates normals with
    open3d's estimate_normals, `dataprocess/mesh2pc_open3d.py:78`; this is
    the same local-plane-fit method).

    Returns unit normals [N,3] (sign is arbitrary, as in the reference's D2
    usage — the metric squares the projection).
    """
    pts = np.asarray(points, np.float64)
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=min(k, len(pts)), workers=-1)
    nbrs = pts[idx]                        # [N, k, 3]
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered)
    _, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    return vecs[:, :, 0]
