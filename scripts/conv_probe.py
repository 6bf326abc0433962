"""Probe alternative TPU lowerings of the hot 3D convolution.

The shipped codec's conv stack runs at ~4-5% MXU (PERF_NOTES.md): NDHWC
3^3 convs at C in {4..64} leave the 128-lane systolic array mostly idle.
This script measures candidate reformulations of the SAME math on the real
chip, checks them for numerical equivalence against lax conv, and reports
achieved TFLOP/s (useful FLOPs only — padding/waste FLOPs are the
candidate's problem).

Run: python scripts/conv_probe.py [--quick]
"""

import argparse
import functools
import time

import numpy as np

from pcgcv1_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def timed(fn, *args, iters=8):
    """Median wall time of fn(*args) with a reduction-fetch sync
    (block_until_ready is unreliable through the axon relay)."""
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.time() - t0)
    return float(np.median(ts))


# ---------------------------------------------------------------- variants
DN = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                ("NDHWC", "DHWIO", "NDHWC"))


def conv3d_ref(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=DN)


def conv2d_sum(x, w):
    """Fold D into batch; one 3x3 conv2d per dz tap, summed.

    x: [B, D, H, W, C]; w: [3, 3, 3, Cin, Cout]. The dz shifts come from
    slicing a zero-padded copy (one pad, three aliased views).
    """
    b, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    dn2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))
    out = None
    for dz in range(3):
        xs = xp[:, dz:dz + d].reshape(b * d, h, wd, c)
        y = lax.conv_general_dilated(xs, w[dz], (1, 1), "SAME",
                                     dimension_numbers=dn2)
        out = y if out is None else out + y
    return out.reshape(b, d, h, wd, -1)


def conv2d_packed(x, w):
    """Fold D into batch; pack the 3 dz taps into input channels, ONE
    3x3 conv2d with Cin*3 channels (K = 3*3*3C in the gemm)."""
    b, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xs = jnp.concatenate([xp[:, dz:dz + d] for dz in range(3)], axis=-1)
    dn2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))
    wk = jnp.concatenate([w[dz] for dz in range(3)], axis=2)  # [3,3,3C,Co]
    y = lax.conv_general_dilated(xs.reshape(b * d, h, wd, 3 * c), wk,
                                 (1, 1), "SAME", dimension_numbers=dn2)
    return y.reshape(b, d, h, wd, -1)


def fold2(x):
    """Space-to-depth by 2: [B,D,H,W,C] -> [B,D/2,H/2,W/2,8C]."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, d // 2, h // 2, w // 2, 8 * c)


def unfold2(x):
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, d, h, w, 2, 2, 2, c)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, d * 2, h * 2, w * 2, c)


def fold_weights(w):
    """3^3 conv weights -> folded 3^3 conv weights on the fold-2 layout.

    Per output slot o in {0,1} and tap t in {0,1,2}, the input original
    offset is v = o + t - 1 in [-1, 2]; folded block offset floor(v/2) in
    {-1, 0, 1} (so the folded kernel must be 3 wide), within-block slot
    v mod 2. Dense folded compute is 27*8ci*8co vs 27*ci*co useful -> 8x
    padding waste, traded for K=27*8ci, N=8co matmul shapes.
    w: [3,3,3,Ci,Co] -> [3,3,3, 8Ci, 8Co].
    """
    ci, co = w.shape[3], w.shape[4]
    wf = np.zeros((3, 3, 3, 8 * ci, 8 * co), np.float32)
    w_np = np.asarray(w, np.float32)

    def split(o, t):
        v = o + t - 1
        return (v // 2) + 1, v % 2  # folded kernel index in {0,1,2}, slot

    for oz in range(2):
        for oy in range(2):
            for ox in range(2):
                o_idx = oz * 4 + oy * 2 + ox
                for tz in range(3):
                    for ty in range(3):
                        for tx in range(3):
                            kz, iz = split(oz, tz)
                            ky, iy = split(oy, ty)
                            kx, ix = split(ox, tx)
                            i_idx = iz * 4 + iy * 2 + ix
                            wf[kz, ky, kx,
                               i_idx * ci:(i_idx + 1) * ci,
                               o_idx * co:(o_idx + 1) * co] = \
                                w_np[tz, ty, tx]
    return jnp.asarray(wf)


def conv_folded(xf, wf):
    """3^3 conv on the folded layout (stays folded)."""
    return lax.conv_general_dilated(xf, wf, (1, 1, 1), "SAME",
                                    dimension_numbers=DN)


def conv_folded_mm(xf, wf):
    """Folded conv as 27 shifted pointwise matmuls (no conv op)."""
    b, d, h, w, c = xf.shape
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                wk = wf[kz, ky, kx]
                xs = xp[:, kz:kz + d, ky:ky + h, kx:kx + w]
                y = jnp.einsum("bdhwc,co->bdhwo", xs, wk,
                               preferred_element_type=jnp.float32)
                out = y if out is None else out + y
    return out.astype(xf.dtype)


def tap_einsum(x, w):
    """27 shifted pointwise matmuls (K=Cin control)."""
    b, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for tz in range(3):
        for ty in range(3):
            for tx in range(3):
                xs = xp[:, tz:tz + d, ty:ty + h, tx:tx + wd]
                y = jnp.einsum("bdhwc,co->bdhwo", xs, w[tz, ty, tx],
                               preferred_element_type=jnp.float32)
                out = y if out is None else out + y
    return out.astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--cin", type=int, default=16)
    ap.add_argument("--cout", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    print("platform:", jax.devices()[0].platform)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b, s, ci, co = args.batch, args.size, args.cin, args.cout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, s, s, ci)), dt)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.1, dt)
    useful_flops = 2 * b * s ** 3 * 27 * ci * co

    # numerical check on a small f32 slice
    xs32 = jnp.asarray(rng.normal(size=(2, 8, 8, 8, ci)), jnp.float32)
    w32 = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)), jnp.float32)
    ref = np.asarray(conv3d_ref(xs32, w32))
    wf32 = fold_weights(np.asarray(w32))

    def check(name, got):
        err = np.max(np.abs(np.asarray(got) - ref))
        ok = err < 1e-3
        print(f"  equivalence {name}: max|err|={err:.2e} "
              f"{'OK' if ok else 'MISMATCH'}")
        return ok

    check("conv2d_sum", conv2d_sum(xs32, w32))
    check("conv2d_packed", conv2d_packed(xs32, w32))
    check("folded", unfold2(conv_folded(fold2(xs32), wf32)))
    check("folded_mm", unfold2(conv_folded_mm(fold2(xs32), wf32)))
    check("tap_einsum", tap_einsum(xs32, w32))

    wf = fold_weights(np.asarray(w)).astype(dt)
    xf = jax.jit(fold2)(x)
    _ = float(jnp.sum(xf.astype(jnp.float32)))

    variants = {
        "conv3d (lax, shipped)": (jax.jit(conv3d_ref), (x, w)),
        "conv2d_sum": (jax.jit(conv2d_sum), (x, w)),
        "conv2d_packed": (jax.jit(conv2d_packed), (x, w)),
        "folded conv2^3 (steady-state)": (jax.jit(conv_folded), (xf, wf)),
        "folded 8x matmul (steady-state)": (jax.jit(conv_folded_mm),
                                            (xf, wf)),
        "tap_einsum 27x (K=Cin)": (jax.jit(tap_einsum), (x, w)),
        "fold2 transpose alone": (jax.jit(fold2), (x,)),
    }
    iters = 3 if args.quick else 8
    for name, (fn, a) in variants.items():
        try:
            t = timed(fn, *a, iters=iters)
            print(f"{name:38s} {t * 1e3:8.2f} ms   "
                  f"{useful_flops / t / 1e12:6.2f} TF/s useful")
        except Exception as e:  # noqa: BLE001
            print(f"{name:38s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
