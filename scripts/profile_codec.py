"""Serial stage-time breakdown of the device-coder hyper codec.

The shipped encode/decode paths overlap chunks (async D2H under compute),
so wall-clock attribution per stage is murky in situ. This diagnostic runs
the SAME jitted programs one stage at a time with an explicit sync after
each (fetch of a reduction — block_until_ready is unreliable through the
axon relay, PERF_NOTES.md), then prints ms/workload per stage next to the
overlapped end-to-end figures. Run on the real chip; the deltas steer
optimization (conv kernels vs wire vs rANS scans).

Usage: python scripts/profile_codec.py [ckpt_dir] [chunk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _release_ckpt, _workload
from pcgcv1_tpu.codec import pipeline
from pcgcv1_tpu.codec.transforms import PointCloudCodec
from pcgcv1_tpu.entropy import rans


def sync(tree):
    """Force completion: fetch a scalar reduction of every array leaf."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    for l in leaves:
        v = jnp.max(l) if l.dtype != jnp.bool_ else jnp.any(l)
        np.asarray(v)


def timed(label, fn, n=3, results=None):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    best = min(ts)
    print(f"  {label:<28s} {best:8.1f} ms   (runs: "
          + " ".join(f"{t:.0f}" for t in ts) + ")")
    if results is not None:
        results[label] = best
    return out


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else _release_ckpt()
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    vrn = sys.argv[3] if len(sys.argv) > 3 else "xla"
    print(f"ckpt={ckpt} chunk={chunk} vrn={vrn} devices={jax.devices()}")
    pts = _workload()
    pre = pipeline.preprocess_points(pts, 1.0, 64, 64)
    codec = PointCloudCodec(mode="hyper", ckpt_dir=ckpt, chunk=chunk,
                            dtype=jnp.bfloat16, coder="device", vrn=vrn)
    b = len(pre.points_numbers)
    print(f"cubes={b} chunks={-(-b // chunk)}")
    r = {}

    # ---- encode stages, serial, first chunk only (x chunks for totals) ----
    feeds = list(codec._feed_chunks(pre))
    nch = len(feeds)
    i0, prefix, args = feeds[0]
    n0 = min(chunk, b - i0)
    print(f"[encode stages: one {n0}-cube chunk x {nch} chunks/workload]")
    ana = codec._jitted(prefix + "analysis_hyper")
    yv, zh = timed("analysis+hyper", lambda: ana(codec.params, *args),
                   results=r)
    if codec.prior == "int":
        a_scales = codec._calibrate_prior_scales(zh)
        a_dev = jnp.asarray(a_scales, jnp.int32)
        qp = codec._jitted("qprior")
        lq, sq = timed("prior (int)", lambda: qp(codec.params, a_dev, zh),
                       results=r)
    else:
        pr = codec._jitted("prior")
        lq, sq = timed("prior (float)", lambda: pr(codec.params, zh),
                       results=r)
    elems = int(np.prod(codec._y_spatial))
    lanes = codec._device_lanes(b)
    m = n0 * elems
    cap = max(m // 8, 2 * lanes)
    st0 = rans.initial_states(lanes)
    enc = codec._jitted(f"rans_encode:{n0}:{cap}")
    words, count, states = timed(
        "rans encode scan", lambda: enc(codec.params, yv, lq, sq, st0),
        results=r)
    t0 = time.perf_counter()
    w_host = np.asarray(words[:int(np.asarray(count))])
    r["words D2H"] = (time.perf_counter() - t0) * 1e3
    print(f"  {'words D2H':<28s} {r['words D2H']:8.1f} ms   "
          f"({w_host.nbytes / 1e6:.2f} MB)")

    # upload cost: re-feed the chunk args cold-ish (relay caches identical
    # bytes; report but distrust)
    timed("chunk upload (cached!)",
          lambda: [codec._put([np.asarray(a)])[0] for a in args],
          results=r)

    # ---- end-to-end overlapped paths ----
    print("[end-to-end overlapped]")
    t0 = time.perf_counter()
    hs = codec.compress_hyper(pre)
    t_enc = time.perf_counter() - t0
    print(f"  encode e2e: {t_enc * 1e3:8.1f} ms "
          f"({b / t_enc:.1f} cubes/s)")

    t0 = time.perf_counter()
    masks = codec.decompress_hyper_masks(hs, pre.points_numbers)
    t_dec = time.perf_counter() - t0
    print(f"  decode e2e: {t_dec * 1e3:8.1f} ms "
          f"({b / t_dec:.1f} cubes/s)")
    del masks

    # ---- decode stages, serial ----
    print(f"[decode stages: one {n0}-cube chunk x {nch} chunks/workload]")
    magic_len = len(__import__(
        "pcgcv1_tpu.codec.bitstream", fromlist=["x"]).FACTORIZED_DEVICE_MAGIC)
    z_lanes = 1 << hs.z_strings[magic_len]
    zwords, zstates, zptr = codec._upload_words(
        hs.z_strings[magic_len + 1:], z_lanes)
    ztab = codec._lane_table(hs.z_min_v, hs.z_max_v, z_lanes)
    zdec = codec._jitted(f"zdec:{n0}:{chunk}")
    zp, _, _ = timed(
        "z decode scan",
        lambda: zdec(codec.params, zwords, ztab, jnp.int32(hs.z_min_v),
                     zstates, zptr), results=r)
    ywords, ystates, yptr = codec._upload_words(hs.y_strings[0],
                                                int(hs.lanes))
    yr = hs.y_range
    bits = max(int(np.ceil(np.log2(yr[1] - yr[0] + 1)))
               if yr[1] > yr[0] else 0, 0)
    fin = codec._jitted(f"rans_classify:{n0}:{bits}")
    if codec.prior == "int":
        lq, sq = qp(codec.params, a_dev, zp)
    else:
        lq, sq = pr(codec.params, zp)
    nums = jnp.asarray(
        np.asarray(pre.points_numbers[:n0], np.int32))
    rho = jnp.float32(1.0)
    out = timed(
        "rans dec+synth+classify",
        lambda: fin(codec.params, ywords, ystates, yptr,
                    jnp.int32(yr[0] + 128), lq, sq, nums, rho),
        results=r)
    packed = out[0]
    t0 = time.perf_counter()
    np.asarray(packed)
    r["masks D2H"] = (time.perf_counter() - t0) * 1e3
    print(f"  {'masks D2H':<28s} {r['masks D2H']:8.1f} ms")

    # ---- mask-wire alternative: device rANS coding of the packed bytes ----
    from pcgcv1_tpu import native
    menc = codec._jitted(f"maskenc:{n0}:{codec._mask_cap(n0)}")
    mw = timed("maskenc scan (mask wire)",
               lambda: menc(codec.params, packed), results=r)
    words_m, count_m, states_m, hist_m = mw
    cnt = int(np.asarray(count_m))
    t0 = time.perf_counter()
    wm = np.asarray(jax.device_get(words_m[:cnt]))
    sm = np.asarray(states_m)
    hm = np.asarray(hist_m)
    r["mask words D2H"] = (time.perf_counter() - t0) * 1e3
    print(f"  {'mask words D2H':<28s} {r['mask words D2H']:8.1f} ms   "
          f"({(2 * cnt + sm.nbytes + hm.nbytes) / 1e6:.2f} MB vs "
          f"{np.asarray(packed).nbytes / 1e6:.2f} MB packed)")
    t0 = time.perf_counter()
    native.rans_mask_decode(wm, sm, hm, int(np.prod(packed.shape)))
    r["mask host decode (C++)"] = (time.perf_counter() - t0) * 1e3
    print(f"  {'mask host decode (C++)':<28s} "
          f"{r['mask host decode (C++)']:8.1f} ms")

    ser_enc = (r.get("analysis+hyper", 0) + r.get("prior (int)",
               r.get("prior (float)", 0)) + r.get("rans encode scan", 0))
    ser_dec = (r.get("z decode scan", 0) / nch
               + r.get("rans dec+synth+classify", 0))
    print(f"[summary] serial/chunk: encode ~{ser_enc:.0f} ms, decode "
          f"~{ser_dec:.0f} ms; x{nch} chunks vs e2e "
          f"{t_enc * 1e3:.0f}/{t_dec * 1e3:.0f} ms -> overlap hides "
          f"{max(0.0, (ser_enc * nch - t_enc * 1e3)):.0f}/"
          f"{max(0.0, (ser_dec * nch - t_dec * 1e3)):.0f} ms")


if __name__ == "__main__":
    main()
