"""Probe: the analysis transform's 64^3 stage in original vs folded layout.

The VRN stack's convs run at C in {4..16} at 64^3 — single-digit MXU lane
occupancy (PERF_NOTES.md). Space-to-depth fold-2 turns the same math into
convs at C in {32..128} on 32^3, paying 8x padded FLOPs for dense lanes.
This measures the REAL stage-1 stack (conv_in + 3xVRN(16) + strided down)
both ways on chip, with weight folding done as a host-side constant (as the
codec would: derived from checkpoint weights at init).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fold_stack_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                ("NDHWC", "DHWIO", "NDHWC"))


def conv(x, w, stride=1):
    return lax.conv_general_dilated(x, w, (stride,) * 3, "SAME",
                                    dimension_numbers=DN)


def relu(x):
    return jnp.maximum(x, 0)


def vrn(x, ws, c):
    """Voxception-ResNet block on C channels (model_voxception.py:11-68)."""
    p1 = relu(conv(x, ws["p1a"]))          # 3^3 C -> C/4
    p1 = relu(conv(p1, ws["p1b"]))         # 3^3 C/4 -> C/2
    p2 = relu(conv(x, ws["p2a"]))          # 1^3 C -> C/4
    p2 = relu(conv(p2, ws["p2b"]))         # 3^3 C/4 -> C/4
    p2 = relu(conv(p2, ws["p2c"]))         # 1^3 C/4 -> C/2
    return relu(x + jnp.concatenate([p1, p2], axis=-1))


def make_vrn_weights(rng, c, dt):
    q, h = c // 4, c // 2
    mk = lambda k, ci, co: jnp.asarray(
        rng.normal(size=(k, k, k, ci, co)) * (1.0 / np.sqrt(k ** 3 * ci)), dt)
    return {"p1a": mk(3, c, q), "p1b": mk(3, q, h),
            "p2a": mk(1, c, q), "p2b": mk(3, q, q), "p2c": mk(1, q, h)}


def stage1(x, W):
    h = relu(conv(x, W["conv_in"]))
    for i in range(3):
        h = vrn(h, W[f"vrn{i}"], 16)
    return conv(h, W["down"], stride=2)    # 16 -> 32, 64^3 -> 32^3


# ------------------------------------------------------------------ folded
def fold2(x):
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, d // 2, h // 2, w // 2, 8 * c)


def fold_weights(w):
    """[3,3,3,Ci,Co] -> [3,3,3,8Ci,8Co] folded-layout equivalent (works for
    1^3 too via k=1 -> kernel [2? no: 1-tap folds to k=1] handled below)."""
    k = w.shape[0]
    ci, co = w.shape[3], w.shape[4]
    w_np = np.asarray(w, np.float32)
    if k == 1:
        wf = np.zeros((1, 1, 1, 8 * ci, 8 * co), np.float32)
        for o in range(8):
            wf[0, 0, 0, o * ci:(o + 1) * ci, o * co:(o + 1) * co] = \
                w_np[0, 0, 0]
        return jnp.asarray(wf)
    assert k == 3
    wf = np.zeros((3, 3, 3, 8 * ci, 8 * co), np.float32)

    def split(o, t):
        v = o + t - 1
        return (v // 2) + 1, v % 2

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
                            wf[kz, ky, kx, i_idx * ci:(i_idx + 1) * ci,
                               o_idx * co:(o_idx + 1) * co] = w_np[tz, ty, tx]
    return jnp.asarray(wf)


def fold_weights_down(w):
    """Strided-2 3^3 conv -> folded-input 2^3 conv, UNFOLDED output.

    Output o (on the 32^3 grid) reads original inputs 2o+dv, dv in
    {-1,0,1}: folded block (o + floor(dv/2)) slot (dv mod 2) -> folded
    kernel offsets {-1, 0}, i.e. a 2^3 kernel with index 0 <-> block o-1.
    [3,3,3,Ci,Co] -> [2,2,2,8Ci,Co].
    """
    ci, co = w.shape[3], w.shape[4]
    w_np = np.asarray(w, np.float32)
    wf = np.zeros((2, 2, 2, 8 * ci, co), np.float32)
    for tz in range(3):
        for ty in range(3):
            for tx in range(3):
                bz, iz = (tz - 1) // 2 + 1, (tz - 1) % 2
                by, iy = (ty - 1) // 2 + 1, (ty - 1) % 2
                bx, ix = (tx - 1) // 2 + 1, (tx - 1) % 2
                i_idx = iz * 4 + iy * 2 + ix
                wf[bz, by, bx, i_idx * ci:(i_idx + 1) * ci] += \
                    w_np[tz, ty, tx]
    return jnp.asarray(wf)


def conv_folded_down(xf, wf):
    """2^3 'VALID-shifted' conv: folded output block o needs folded input
    blocks {o-1, o} -> pad 1 on the LOW side only."""
    xp = jnp.pad(xf, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))
    return lax.conv_general_dilated(xp, wf, (1, 1, 1), "VALID",
                                    dimension_numbers=DN)


def stage1_folded(xf, WF):
    h = relu(conv(xf, WF["conv_in"]))
    for i in range(3):
        ws = WF[f"vrn{i}"]
        p1 = relu(conv(h, ws["p1a"]))
        p1 = relu(conv(p1, ws["p1b"]))
        p2 = relu(conv(h, ws["p2a"]))
        p2 = relu(conv(p2, ws["p2b"]))
        p2 = relu(conv(p2, ws["p2c"]))
        # folded concat must interleave per-slot: [slot0 c1 | slot0 c2 |
        # slot1 c1 | ...] — build via reshape to slot-major
        b, d, hh, w, _ = p1.shape
        c1 = p1.reshape(b, d, hh, w, 8, -1)
        c2 = p2.reshape(b, d, hh, w, 8, -1)
        cat = jnp.concatenate([c1, c2], axis=-1).reshape(b, d, hh, w, -1)
        h = relu(h + cat)
    return conv_folded_down(h, WF["down"])


def timed(fn, *args, iters=6):
    out = fn(*args)
    np.asarray(jnp.max(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.max(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    for dt_name, dt in (("bfloat16", jnp.bfloat16),):
        W = {"conv_in": jnp.asarray(rng.normal(size=(3, 3, 3, 1, 16)) * 0.2,
                                    jnp.float32),
             "down": jnp.asarray(rng.normal(size=(3, 3, 3, 16, 32)) * 0.05,
                                 jnp.float32)}
        for i in range(3):
            W[f"vrn{i}"] = make_vrn_weights(rng, 16, jnp.float32)

        # folded weights (conv_in folds 1ch -> 8ch input)
        WF = {"conv_in": fold_weights(W["conv_in"]),
              "down": fold_weights_down(W["down"])}
        for i in range(3):
            WF[f"vrn{i}"] = {k: fold_weights(v)
                             for k, v in W[f"vrn{i}"].items()}

        # equivalence on a small f32 volume
        xs = jnp.asarray(rng.integers(0, 2, size=(2, 16, 16, 16, 1)),
                         jnp.float32)
        ref = np.asarray(stage1(xs, W))
        got = np.asarray(stage1_folded(fold2(xs), WF))
        err = np.max(np.abs(got - ref))
        print(f"equivalence (f32, 16^3): max|err|={err:.2e} "
              f"{'OK' if err < 1e-4 else 'MISMATCH'}")

        cast = lambda t: jax.tree.map(lambda a: a.astype(dt), t)
        Wd, WFd = cast(W), cast(WF)
        for b in (48, 72):
            x = jnp.asarray(rng.integers(0, 2, size=(b, 64, 64, 64, 1)), dt)
            xf = jax.jit(fold2)(x)
            np.asarray(jnp.max(xf.astype(jnp.float32)))
            t0 = timed(jax.jit(stage1), x, Wd)
            t1 = timed(jax.jit(stage1_folded), xf, WFd)
            print(f"[{dt_name} B={b}] stage1 original {t0*1e3:7.1f} ms | "
                  f"folded {t1*1e3:7.1f} ms | speedup {t0/t1:.2f}x")


if __name__ == "__main__":
    main()
