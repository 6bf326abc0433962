"""Headline benchmark: full codec throughput on a longdress-scale workload.

Measures end-to-end encode+decode of the hyper-mode voxception codec on
whatever accelerator JAX provides (the real TPU chip under the driver).

Protocol (round-3 VERDICT items 4/7):
- the HEADLINE workload is the realistic mesh-sampled cloud
  ``artifacts/composite_vox10.ply`` (~3M points, human-scale occupancy —
  the reference's timing content is longdress, demo.ipynb cells 9-48);
  the deterministic synthetic sheet is reported alongside as a secondary
  workload, and a cold one-shot guards against relay upload caching;
- the headline value is the MEDIAN of the final measurement passes on the
  chosen configuration — never best-of-run (relay-chip variance is ~2x;
  best-of-run papered over a round-3 regression); per-pass numbers and
  the max are kept as auxiliary fields;
- runs with the RELEASE checkpoint when present (decode cost depends on
  the trained y-range); override with PCGC_BENCH_CKPT (=none for random);
- config probes (alternate chunk, polyphase deconv) each run paired
  passes and are adopted only if their MEDIAN beats the incumbent's;
- vs_baseline is computed against the reference's 11.2 cubes/s
  round-trip stage sum AND the ~30 cubes/s per-direction transform
  throughput (BASELINE.md; the driver reads the round-trip ratio).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import statistics
import sys
import time
import warnings

import numpy as np

REFERENCE_ROUNDTRIP_CUBES_PER_SEC = 11.2   # BASELINE.md stage sum
REFERENCE_PER_DIRECTION_CUBES_PER_SEC = 30.0  # ~30 cubes/s transform

HERE = os.path.dirname(os.path.abspath(__file__))
REALISTIC_PLY = os.path.join(HERE, "artifacts", "composite_vox10.ply")


def _workload(n_target=860_000, res=1024, seed=0):
    """Synthetic vox10 surface cloud, longdress-ish density/cube count."""
    rng = np.random.default_rng(seed)
    # a tall curved sheet: matches the "human figure" occupancy pattern of
    # ~200 occupied 64^3 cubes at vox10 (202 for longdress)
    n = int(n_target * 1.4)
    u = rng.uniform(0, 1, n)
    v = rng.uniform(0, 1, n)
    x = 300 + 220 * u + 60 * np.sin(6.28 * v)
    y = 1000 * v
    z = 400 + 150 * np.sin(3.1 * u + 2.0 * v) + 90 * u
    pts = np.stack([x, y, z], 1) + rng.normal(0, 1.2, (n, 3))
    pts = np.clip(np.round(pts), 0, res - 1).astype(np.int32)
    return np.unique(pts, axis=0)


def _release_ckpt():
    """Best available release checkpoint (newest ladder first)."""
    env = os.environ.get("PCGC_BENCH_CKPT", "")
    if env == "none":
        return None
    if env:
        return env
    for name in ("r2_a2b3", "r2_a6b3", "r2_a0.75b3", "r2_a16b3",
                 "hyper_a2b3", "hyper_a6b3"):
        d = os.path.join(HERE, "checkpoints", name)
        if os.path.isdir(d) and any(
                e.startswith("ckpt") for e in os.listdir(d)):
            return d
    return None


def _median(xs):
    return float(statistics.median(xs)) if xs else float("nan")


def main():
    warnings.simplefilter("ignore")
    from pcgcv1_tpu.utils.jaxcache import enable_cache
    enable_cache()
    import jax
    from pcgcv1_tpu.codec import pipeline
    from pcgcv1_tpu.codec.transforms import PointCloudCodec

    # chunk 96: round-3 sweep over {48, 72, 96, 144} on the v5e chip:
    # best encode AND decode medians (enc 274, dec 261 c/s; 48 was the
    # round-2 winner at 209/212 before the bf16 top-k + tail-split work)
    chunk = int(os.environ.get("PCGC_BENCH_CHUNK", "96"))
    dtype_name = os.environ.get("PCGC_BENCH_DTYPE", "bfloat16")
    coder = os.environ.get("PCGC_BENCH_CODER", "device")
    # measured-best transport (won the bench every round; now also the
    # codec/CLI default) — PCGC_BENCH_MASKWIRE=packed pins the old one
    mask_wire = os.environ.get("PCGC_BENCH_MASKWIRE", "rans")
    vrn = os.environ.get("PCGC_BENCH_VRN", "xla")
    # "xla" | "poly" pins the synthesis upsampling lowering; "probe"
    # (default) measures xla first, then the polyphase sub-pixel lowering
    # (models/subpixel.py) and keeps the faster-median decode
    deconv_env = os.environ.get("PCGC_BENCH_DECONV", "probe")
    deconv = "xla" if deconv_env == "probe" else deconv_env
    # rANS interleave width (stream-recorded, so decode follows encode):
    # more lanes = fewer serial scan steps at +4 B/lane flush
    lanes = int(os.environ.get("PCGC_BENCH_LANES", "1024"))
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    ckpt = _release_ckpt()
    # headline content: the realistic mesh-sampled cloud when present
    # (PCGC_BENCH_PLY overrides; PCGC_BENCH_PLY=synthetic forces the
    # sheet-only round-1/2/3 behavior)
    bench_ply = os.environ.get("PCGC_BENCH_PLY", "")
    if not bench_ply and os.path.exists(REALISTIC_PLY):
        bench_ply = REALISTIC_PLY
    if bench_ply and bench_ply != "synthetic":
        from pcgcv1_tpu.ops import load_ply
        pts = load_ply(bench_ply).astype(np.int32)
        content = os.path.basename(bench_ply)
    else:
        bench_ply = ""
        pts = _workload()
        content = "synthetic-sheet"
    pre = pipeline.preprocess_points(pts, cube_size=64, min_num=64)
    n_cubes = pre.cubes.shape[0]
    n_points = int(pre.points_numbers.astype(np.int64).sum())
    print(f"workload: {content}, {len(pts)} points, {n_cubes} cubes of "
          f"64^3, platform={jax.devices()[0].platform}, chunk={chunk}, "
          f"dtype={dtype_name}, coder={coder}, ckpt={ckpt}",
          file=sys.stderr)

    def make_codec(c, use_coder, use_deconv=None):
        return PointCloudCodec(mode="hyper", chunk=c, dtype=dtype,
                               coder=use_coder, ckpt_dir=ckpt,
                               mask_wire=mask_wire, vrn=vrn, lanes=lanes,
                               deconv=use_deconv or deconv)

    codec = make_codec(chunk, coder)
    nums = pre.points_numbers

    # warmup: compile everything once (fall back to the host range coder
    # if the device-rANS path cannot run on this platform)
    try:
        hs = codec.compress_hyper(pre)
        codec.decompress_hyper_masks(hs, nums, 1.0)
    except Exception as e:  # noqa: BLE001
        if coder == "device":
            print(f"device coder failed ({type(e).__name__}: {e}); "
                  "falling back to host coder", file=sys.stderr)
            codec = make_codec(chunk, "host")
            hs = codec.compress_hyper(pre)
            codec.decompress_hyper_masks(hs, nums, 1.0)
        else:
            raise
    total_bytes = sum(len(s) for s in hs.y_strings) + len(hs.z_strings)
    print(f"stream: y+z {total_bytes} B ({8 * total_bytes / n_points:.4f} "
          "bpp, container overhead excluded)", file=sys.stderr)

    def one_pass(c, workload, tag):
        t0 = time.time()
        h = c.compress_hyper(workload)
        t_enc = time.time() - t0
        t0 = time.time()
        c.decompress_hyper_masks(h, workload.points_numbers, 1.0)
        t_dec = time.time() - t0
        nc = workload.cubes.shape[0]
        print(f"[{tag}] chunk {c.chunk}: encode {t_enc:.2f}s "
              f"({nc / t_enc:.1f} c/s) decode {t_dec:.2f}s "
              f"({nc / t_dec:.1f} c/s) -> {nc / (t_enc + t_dec):.1f} "
              "cubes/s round trip", file=sys.stderr)
        return nc / t_enc, nc / t_dec, nc / (t_enc + t_dec)

    def rt_median(ps):
        return _median([p[2] for p in ps])

    passes = [one_pass(codec, pre, f"warm {i}") for i in range(3)]
    # one alternative chunking (compiles are cached across rounds); reuse
    # the resolved coder so the host-coder fallback carries over, and keep
    # the probe non-fatal — the headline must still print. Probes compare
    # MEDIANS (best-of-two vs best-of-four flattered the probe).
    try:
        alt = 72 if chunk == 96 else 96
        codec2 = make_codec(alt, codec.coder)
        codec2.params = codec.params
        h2 = codec2.compress_hyper(pre)
        codec2.decompress_hyper_masks(h2, nums, 1.0)
        alt_passes = [one_pass(codec2, pre, f"alt {i}") for i in range(2)]
        if rt_median(alt_passes) > rt_median(passes):
            codec, passes = codec2, alt_passes
            print(f"chunk probe: {alt} wins", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"alternate-chunk probe failed ({type(e).__name__}: {e}); "
              "keeping primary measurement", file=sys.stderr)

    # deconv probe: re-run with the polyphase sub-pixel upsampling
    # (identical function/streams, MXU-friendly lowering) and keep the
    # faster-median side
    if deconv_env == "probe":
        try:
            codec4 = make_codec(codec.chunk, codec.coder, "poly")
            codec4.params = codec.params
            h4 = codec4.compress_hyper(pre)
            codec4.decompress_hyper_masks(h4, nums, 1.0)
            dc_passes = [one_pass(codec4, pre, f"deconv-poly {i}")
                         for i in range(2)]
            if rt_median(dc_passes) > rt_median(passes):
                codec, passes = codec4, dc_passes
                print("deconv: poly wins", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"deconv probe failed ({type(e).__name__}: {e}); "
                  "keeping xla", file=sys.stderr)

    # the measurement that counts: N fresh passes on the winning config,
    # reported as MEDIANS (plus per-pass detail for variance audits)
    n_final = int(os.environ.get("PCGC_BENCH_FINAL_PASSES", "5"))
    final = [one_pass(codec, pre, f"final {i}") for i in range(n_final)]
    med_enc = _median([p[0] for p in final])
    med_dec = _median([p[1] for p in final])
    med_rt = _median([p[2] for p in final])
    all_passes = passes + final
    best_rt = max(p[2] for p in all_passes)

    # secondary workload: the deterministic synthetic sheet (kept for
    # cross-round comparability with BENCH_r01-r03) — skipped when the
    # headline itself is the sheet
    synth = {}
    if content != "synthetic-sheet":
        try:
            pre_s = pipeline.preprocess_points(
                _workload(), cube_size=64, min_num=64)
            codec.warmup(n_cubes=pre_s.cubes.shape[0])
            sp = [one_pass(codec, pre_s, f"synth {i}") for i in range(3)]
            synth = {
                "synthetic_encode_cubes_per_s": round(
                    _median([p[0] for p in sp]), 2),
                "synthetic_decode_cubes_per_s": round(
                    _median([p[1] for p in sp]), 2),
                "synthetic_roundtrip_cubes_per_s": round(
                    _median([p[2] for p in sp]), 2),
            }
        except Exception as e:  # noqa: BLE001
            print(f"synthetic secondary failed ({type(e).__name__}: {e})",
                  file=sys.stderr)

    # cold one-shot: a workload whose bytes the relay has never seen
    # (PERF_NOTES.md: re-uploading identical bytes is relay-cached)
    try:
        pre_cold = pipeline.preprocess_points(
            _workload(seed=101), cube_size=64, min_num=64)
        codec.warmup(n_cubes=pre_cold.cubes.shape[0])
        cold_enc, cold_dec, cold = one_pass(codec, pre_cold, "cold")
    except Exception as e:  # noqa: BLE001
        print(f"cold pass failed ({type(e).__name__}: {e})",
              file=sys.stderr)
        cold_enc = cold_dec = cold = float("nan")

    out = {
        "metric": "hyper codec encode+decode throughput (64^3 cubes, "
                  "vox10 cloud, median of final passes)",
        "value": round(med_rt, 2),
        "unit": "cubes/s",
        "vs_baseline": round(med_rt / REFERENCE_ROUNDTRIP_CUBES_PER_SEC,
                             2),
        "encode_cubes_per_s": round(med_enc, 2),
        "decode_cubes_per_s": round(med_dec, 2),
        "best_roundtrip_cubes_per_s": round(best_rt, 2),
        "final_passes": [[round(x, 1) for x in p] for p in final],
        "cold_roundtrip_cubes_per_s": round(cold, 2),
        "cold_encode_cubes_per_s": round(cold_enc, 2),
        "cold_decode_cubes_per_s": round(cold_dec, 2),
        "vs_reference_roundtrip_11.2": round(
            med_rt / REFERENCE_ROUNDTRIP_CUBES_PER_SEC, 2),
        "vs_reference_per_direction_30": {
            "encode": round(
                med_enc / REFERENCE_PER_DIRECTION_CUBES_PER_SEC, 2),
            "decode": round(
                med_dec / REFERENCE_PER_DIRECTION_CUBES_PER_SEC, 2)},
        "checkpoint": ckpt or "random-init",
        "content": content,
        "config": {"chunk": codec.chunk, "coder": codec.coder,
                   "mask_wire": codec.mask_wire, "deconv": codec.deconv,
                   "dtype": dtype_name},
    }
    out.update(synth)
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # the axon relay occasionally kills a whole client session with a
        # transient FAILED_PRECONDITION; a fresh process usually succeeds.
        # Retry once by re-exec (a poisoned JAX client can't recover
        # in-process).
        if os.environ.get("PCGC_BENCH_RETRY"):
            raise
        print(f"bench failed ({type(e).__name__}: {e}); retrying once in "
              "a fresh process", file=sys.stderr)
        os.environ["PCGC_BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
