"""Command-line interface.

Capability parity with the reference entry points:

- ``compress`` / ``decompress``: `test.py` (same positional args and flags
  --mode/--modelname/--ckpt_dir/--scale/--cube_size/--min_num/--rho).
- ``train``: `train_factorized.py` / `train_hyper.py` flags
  (--alpha/--beta/--gamma/--delta/--lr/--batch_size/--init_ckpt_dir/
  --reset_optimizer/--lower_bound/--prefix).
- ``eval``: `eval.py` R-D sweep over an INI config.
- ``gen-dataset`` / ``mesh2pc``: `generate_dataset.py`, `mesh2pc*.py`.

Run as ``python -m pcgcv1_tpu.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from pcgcv1_tpu.utils.jaxcache import enable_cache


def _add_codec_flags(p):
    p.add_argument("--mode", default="hyper",
                   choices=["hyper", "factorized"])
    p.add_argument("--modelname", default="voxception",
                   help="voxception | simple (reference dotted aliases ok)")
    p.add_argument("--ckpt_dir", default="", help="checkpoint directory")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--cube_size", type=int, default=64)
    p.add_argument("--min_num", type=int, default=64)
    p.add_argument("--rho", type=float, default=1.0)
    p.add_argument("--fixed_thres", type=float, default=None)
    p.add_argument("--chunk", type=int, default=96,
                   help="cubes per jitted device step (encode and decode "
                        "of one stream must match)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--coder", default="host", choices=["host", "device"],
                   help="y entropy coder (hyper mode): 'host' = C++ range "
                        "coder, reference-format streams; 'device' = "
                        "on-TPU interleaved rANS, minimal link traffic. "
                        "Decode auto-detects from the stream.")
    p.add_argument("--prior", default="float",
                   choices=["float", "bf16", "int"],
                   help="hyper prior-code producer: 'float' = shared "
                        "jitted hyper-decoder (same-platform decode); "
                        "'int' = integer-quantized hyper-decoder — "
                        "streams decode bit-exactly on any backend "
                        "(requires --coder device).")
    p.add_argument("--vrn", default="xla", choices=["xla", "pallas"],
                   help="VRN block implementation: 'xla' = native conv "
                        "lowering; 'pallas' = banded block-Toeplitz MXU "
                        "kernels (ops/vrn_pallas.py, voxception family)")
    p.add_argument("--deconv", default="xla", choices=["xla", "poly"],
                   help="synthesis upsampling lowering: 'xla' = "
                        "ConvTranspose; 'poly' = polyphase sub-pixel "
                        "conv (models/subpixel.py) — same function and "
                        "parameters, MXU-friendly shapes")
    p.add_argument("--mask_wire", default="rans",
                   choices=["packed", "rans"],
                   help="decode-side mask download transport: 'packed' = "
                        "raw bit-packed bytes; 'rans' = device nibble "
                        "rANS + C++ host decode (~10-20x smaller wire). "
                        "Transport only — streams are unaffected.")
    p.add_argument("--rootdir", default="./compressed")


def _make_codec(args):
    import jax.numpy as jnp
    from pcgcv1_tpu.codec.transforms import PointCloudCodec
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    return PointCloudCodec(
        model=args.modelname, mode=args.mode,
        ckpt_dir=args.ckpt_dir or None, dtype=dtype, chunk=args.chunk,
        cube_size=args.cube_size, coder=getattr(args, "coder", "host"),
        prior=getattr(args, "prior", "float"),
        vrn=getattr(args, "vrn", "xla"),
        mask_wire=getattr(args, "mask_wire", "rans"),
        deconv=getattr(args, "deconv", "xla"))


def cmd_compress(args):
    from pcgcv1_tpu.codec import bitstream, pipeline
    t0 = time.time()
    pre = pipeline.preprocess(args.input, args.scale, args.cube_size,
                              args.min_num)
    print(f"preprocess: {time.time()-t0:.2f}s  "
          f"{pre.cubes.shape[0]} cubes, "
          f"{int(pre.points_numbers.astype(np.int64).sum())} points")
    codec = _make_codec(args)
    name = args.output or os.path.splitext(
        os.path.basename(args.input))[0]
    num_hosts = getattr(args, "num_hosts", 1)
    host_id = getattr(args, "host_id", -1)
    if args.mode == "hyper" and num_hosts > 1:
        from pcgcv1_tpu.parallel import multihost
        t0 = time.time()
        if host_id >= 0:
            # one shard of a multi-host job: compress this host's slice of
            # the canonical cube order; merge later with `merge-shards`
            pre_h, (lo, hi) = multihost.shard_preprocess(
                pre, num_hosts, host_id)
            hs = codec.compress_hyper(pre_h.cubes)
            hs.points_numbers = pre_h.points_numbers
            hs.cube_positions = pre_h.cube_positions
            sizes = bitstream.write_hyper(f"{name}.host{host_id}", hs,
                                          rootdir=args.rootdir)
            print(f"host {host_id}/{num_hosts}: cubes [{lo},{hi}) "
                  f"encode: {time.time()-t0:.2f}s")
        else:
            # single-process simulation of all hosts -> merged container
            shards = []
            for h in range(num_hosts):
                pre_h, _ = multihost.shard_preprocess(pre, num_hosts, h)
                hs = codec.compress_hyper(pre_h.cubes)
                hs.points_numbers = pre_h.points_numbers
                hs.cube_positions = pre_h.cube_positions
                shards.append(hs)
            merged = multihost.merge_hyper_shards(shards)
            sizes = bitstream.write_hyper(name, merged,
                                          rootdir=args.rootdir)
            print(f"encode ({num_hosts} simulated hosts): "
                  f"{time.time()-t0:.2f}s")
    else:
        t0 = time.time()
        if args.mode == "factorized":
            strings, mn, mx, shape = codec.compress_factorized(pre)
            fs = bitstream.FactorizedStreams(
                strings, mn, mx, shape, pre.points_numbers,
                pre.cube_positions)
            sizes = bitstream.write_factorized(name, fs,
                                               rootdir=args.rootdir)
        else:
            hs = codec.compress_hyper(pre)
            hs.points_numbers = pre.points_numbers
            hs.cube_positions = pre.cube_positions
            sizes = bitstream.write_hyper(name, hs, rootdir=args.rootdir)
        print(f"encode: {time.time()-t0:.2f}s")
    n_points = int(pre.points_numbers.astype(np.int64).sum())
    total = sum(sizes.values())
    for k, v in sizes.items():
        print(f"  {k}: {v} B ({8*v/n_points:.4f} bpp)")
    print(f"total: {total} B  bpp: {8*total/n_points:.4f}")


def cmd_merge_shards(args):
    """Merge per-host shard files (compress --num_hosts N --host_id H)
    into one multi-host container."""
    from pcgcv1_tpu.codec import bitstream
    from pcgcv1_tpu.parallel import multihost
    shards = []
    for prefix in args.inputs:
        rootdir, name = os.path.split(prefix)
        shards.append(bitstream.read_hyper(name, rootdir or "."))
    merged = multihost.merge_hyper_shards(shards)
    rootdir, name = os.path.split(args.output)
    sizes = bitstream.write_hyper(name, merged, rootdir=rootdir or ".")
    total = sum(sizes.values())
    print(f"merged {len(shards)} shards -> {args.output} ({total} B)")


def cmd_decompress(args):
    from pcgcv1_tpu.codec import bitstream, pipeline
    rootdir, name = os.path.split(args.input)
    rootdir = rootdir or "."
    out = args.output or name + "_rec.ply"
    codec = _make_codec(args)
    t0 = time.time()
    if args.mode == "factorized":
        fs = bitstream.read_factorized(name, rootdir)
        nums, pos = fs.points_numbers, fs.cube_positions
        if args.fixed_thres is None:
            masks = codec.decompress_factorized_masks(
                fs.strings, fs.min_v, fs.max_v, fs.shape, nums, args.rho)
        else:
            logits = codec.decompress_factorized(
                fs.strings, fs.min_v, fs.max_v, fs.shape)
    else:
        hs = bitstream.read_hyper(name, rootdir)
        nums, pos = hs.points_numbers, hs.cube_positions
        if args.fixed_thres is None:
            masks = codec.decompress_hyper_masks(hs, nums, args.rho)
        else:
            logits = codec.decompress_hyper(hs)
    print(f"decode: {time.time()-t0:.2f}s")
    t0 = time.time()
    if args.fixed_thres is None:
        points = pipeline.postprocess_from_masks(
            masks, pos, args.scale, args.cube_size)
        from pcgcv1_tpu.ops import write_ply
        write_ply(out, points.astype(np.int64) if args.scale == 1
                  else points)
    else:
        pipeline.postprocess(out, logits, nums, pos, args.scale,
                             args.cube_size, args.rho, args.fixed_thres)
    print(f"postprocess -> {out}: {time.time()-t0:.2f}s")


def cmd_train(args):
    import jax

    if args.distributed:
        # multi-host training: "coordinator_host:port,num_processes,pid".
        # Must run before any other JAX use in this process; afterwards
        # jax.devices() is the GLOBAL device list and the mesh (and the
        # gradient psums) spans every host.
        coord, nproc, pid = args.distributed.rsplit(",", 2)
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))

    import jax.numpy as jnp
    from pcgcv1_tpu.training import data as data_lib
    from pcgcv1_tpu.training.train import TrainConfig, Trainer
    from pcgcv1_tpu.parallel import make_mesh

    ckpt_dir = args.ckpt_dir or os.path.join(
        "checkpoints",
        f"{args.prefix}{args.mode}_a{args.alpha:.2f}b{args.beta:.2f}")
    cfg = TrainConfig(
        model=args.modelname, mode=args.mode, alpha=args.alpha,
        beta=args.beta, gamma=args.gamma, delta=args.delta, lr=args.lr,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        lr_final=args.lr_final,
        batch_size=args.batch_size, cube_size=args.cube_size,
        num_iterations=int(args.num_iteration),
        scale_lower_bound=args.lower_bound, ckpt_dir=ckpt_dir,
        quant=args.quant,
        eb_init_scale=args.eb_init_scale,
        est_lr=args.est_lr,
        latent_gain=args.latent_gain,
        save_every=args.save_every,
        init_ckpt_dir=args.init_ckpt_dir,
        reset_optimizer=bool(args.reset_optimizer),
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    mesh = None
    if (args.data_parallel > 1 or args.model_parallel > 1
            or jax.process_count() > 1):
        mesh = make_mesh(args.data_parallel or None, args.model_parallel)
    trainer = Trainer(cfg, mesh=mesh)
    # each process feeds its local shard of the global batch, sampled with
    # a decorrelated per-host seed (single-process: the full batch)
    local_bs = cfg.batch_size // jax.process_count()
    kw = ({"seed": 3 + 17 * jax.process_index()}
          if jax.process_count() > 1 else {})
    ds = data_lib.make_dataset(args.data, cube_size=args.cube_size, **kw)
    from pcgcv1_tpu.utils.logging import MetricLogger
    pid = jax.process_index()
    log_fn = MetricLogger(ckpt_dir,
                          name="train" if pid == 0 else f"train_p{pid}")

    trainer.fit(ds.batches(local_bs), log_fn=log_fn,
                eval_batches_fn=(None if jax.process_count() > 1 else
                                 lambda: ds.eval_batches(
                                     cfg.batch_size, cfg.eval_samples)))
    trainer.save()


def cmd_eval(args):
    from pcgcv1_tpu import evalharness
    evalharness.run_eval(args)


def cmd_info(args):
    from pcgcv1_tpu.codec import bitstream
    rootdir, name = os.path.split(args.input)
    rootdir = rootdir or "."
    hyper = os.path.exists(os.path.join(rootdir, name + ".strings_head"))
    mode = "hyper" if hyper else "factorized"
    if hyper:
        hs = bitstream.read_hyper(name, rootdir)
        nums, pos = hs.points_numbers, hs.cube_positions
        print(f"mode: hyper   cubes: {len(nums)}   coder: {hs.coder}")
        if hs.coder == "device":
            zdev = bytes(hs.z_strings[:len(
                bitstream.FACTORIZED_DEVICE_MAGIC)]) == \
                bitstream.FACTORIZED_DEVICE_MAGIC
            print(f"y shape/cube: {hs.y_shape}  chained rANS: "
                  f"{hs.lanes} lanes, encode chunk {hs.chunk}, "
                  f"prior {hs.prior}"
                  + (f" (scales {hs.prior_scales})"
                     if hs.prior == "int" else ""))
            if hs.y_range:
                print(f"y range: [{hs.y_range[0]}, {hs.y_range[1]}]")
            print(f"z shape: {hs.z_shape}  z range: "
                  f"[{hs.z_min_v}, {hs.z_max_v}]  "
                  f"z coder: {'device' if zdev else 'host'}")
        else:
            print(f"y shape/cube: {hs.y_shape}  range packs: "
                  f"min {hs.y_min_vs.min()}..{hs.y_min_vs.max()}, "
                  f"max {hs.y_max_vs.min()}..{hs.y_max_vs.max()}")
            print(f"z shape: {hs.z_shape}  z range: "
                  f"[{hs.z_min_v}, {hs.z_max_v}]")
    else:
        fs = bitstream.read_factorized(name, rootdir)
        nums, pos = fs.points_numbers, fs.cube_positions
        print(f"mode: factorized   shape: {fs.shape}  "
              f"range: [{fs.min_v}, {fs.max_v}]")
    n_points = int(np.asarray(nums, np.int64).sum())
    exts = ([".strings", ".strings_head", ".strings_hyper"] if hyper
            else [".strings"]) + [".pointnums", ".cubepos"]
    total = 0
    for ext in exts:
        size = os.path.getsize(os.path.join(rootdir, name + ext))
        total += size
        print(f"  {ext[1:]:14s} {size:10d} B  {8*size/n_points:.4f} bpp")
    print(f"  {'total':14s} {total:10d} B  {8*total/n_points:.4f} bpp  "
          f"({n_points} points, {len(pos)} cubes)")


def cmd_report(args):
    from pcgcv1_tpu import report
    out = args.out or os.path.join(args.eval_dir, "bdrate_bd.csv")
    scales = (tuple(float(s) for s in args.anchor_scales.split(","))
              if args.anchor_scales else (0.875, 0.75))
    if args.anchor_scales == "none":
        scales = None
    if args.gpcc_trisoup == "none":
        tsoup = ()
    elif args.gpcc_trisoup:
        tsoup = tuple(int(s) for s in args.gpcc_trisoup.split(","))
    else:
        tsoup = (2, 3, 4)
    df = report.run_report(args.eval_dir, out,
                           inputs_dir=args.inputs_dir or None,
                           resolution=args.res,
                           published_csv=args.published_csv or None,
                           anchor_scales=scales,
                           anchor_shifts=tuple(
                               int(s) for s in args.anchor_shifts.split(",")),
                           trisoup_log2s=tsoup)
    print(df.round(2))
    print(f"wrote {out}")


def cmd_gen_dataset(args):
    from pcgcv1_tpu.training import datagen
    n = datagen.generate_dataset(
        args.input, args.outdir, cube_size=args.cube_size,
        min_num=args.min_num, write_h5=args.h5)
    print(f"wrote {n} cubes to {args.outdir}")


def cmd_mesh2pc(args):
    from pcgcv1_tpu.ops import write_ply
    from pcgcv1_tpu.training import datagen
    from pcgcv1_tpu.metrics import estimate_normals
    rng = np.random.default_rng(args.seed)
    pts = datagen.mesh_to_cloud(args.input, n_points=args.n_points,
                                resolution=args.resolution,
                                rotate=not args.no_rotate, rng=rng)
    normals = estimate_normals(pts) if args.normals else None
    write_ply(args.output, pts if normals is None else
              pts.astype(np.float64), normals=normals)
    print(f"{args.input} -> {args.output}: {len(pts)} points")


def main(argv=None):
    enable_cache()
    p = argparse.ArgumentParser(
        prog="pcgc", description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    sub = p.add_subparsers(dest="command", required=True)

    pc = sub.add_parser("compress", help="point cloud -> bitstream files")
    pc.add_argument("input")
    pc.add_argument("output", nargs="?")
    _add_codec_flags(pc)
    pc.add_argument("--num_hosts", type=int, default=1,
                    help="multi-host cube sharding (hyper mode): split the "
                         "canonical cube order into N host slices")
    pc.add_argument("--host_id", type=int, default=-1,
                    help="with --num_hosts: compress only this host's "
                         "slice to <name>.host<id> (merge later with "
                         "merge-shards); -1 = simulate all hosts in one "
                         "process and write the merged container")
    pc.set_defaults(fn=cmd_compress)

    pms = sub.add_parser("merge-shards",
                         help="merge per-host shard files into one "
                              "multi-host container")
    pms.add_argument("--inputs", nargs="+", required=True,
                     help="shard path prefixes in host order")
    pms.add_argument("--output", required=True, help="merged path prefix")
    pms.set_defaults(fn=cmd_merge_shards)

    pd = sub.add_parser("decompress", help="bitstream files -> point cloud")
    pd.add_argument("input", help="path prefix of the compressed files")
    pd.add_argument("output", nargs="?")
    _add_codec_flags(pd)
    pd.set_defaults(fn=cmd_decompress)

    pt = sub.add_parser("train", help="rate-distortion training")
    pt.add_argument("--data", default="synthetic",
                    help="'synthetic', h5 glob, or npz shard glob")
    pt.add_argument("--modelname", default="voxception")
    pt.add_argument("--mode", default="hyper",
                    choices=["hyper", "factorized"])
    pt.add_argument("--alpha", type=float, default=2.0)
    pt.add_argument("--beta", type=float, default=3.0)
    pt.add_argument("--gamma", type=float, default=1.0)
    pt.add_argument("--delta", type=float, default=1.0)
    pt.add_argument("--lr", type=float, default=1e-5)
    pt.add_argument("--lr_schedule", default="constant",
                    choices=["constant", "cosine"])
    pt.add_argument("--warmup_steps", type=int, default=500)
    pt.add_argument("--lr_final", type=float, default=1e-6)
    pt.add_argument("--num_iteration", type=float, default=3e5)
    pt.add_argument("--batch_size", type=int, default=8)
    pt.add_argument("--cube_size", type=int, default=64)
    pt.add_argument("--prefix", default="")
    pt.add_argument("--ckpt_dir", default="")
    pt.add_argument("--init_ckpt_dir", default="")
    pt.add_argument("--reset_optimizer", type=int, default=0)
    pt.add_argument("--lower_bound", type=float, default=1e-9)
    pt.add_argument("--est_lr", type=float, default=0.0,
                    help="separate Adam lr for the factorized density "
                         "(0 = share the main optimizer)")
    pt.add_argument("--latent_gain", type=float, default=1.0,
                    help="cross-mode warm start only: scale analysis "
                         "output by g, synthesis input by 1/g (exact "
                         "reparameterization; makes hyper-trained latents "
                         "survive integer quantization from step 0)")
    pt.add_argument("--eb_init_scale", type=float, default=8.0,
                    help="factorized density init support half-width; "
                         "set ~4x latent std when warm-starting from a "
                         "trained hyper checkpoint")
    pt.add_argument("--quant", default="noise", choices=["noise", "ste"],
                    help="training quantization: 'noise' = the reference's "
                         "uniform-noise relaxation; 'ste' = straight-"
                         "through hard rounding on the decode path "
                         "(rounding-aware fine-tune for low-rate rungs)")
    pt.add_argument("--save_every", type=int, default=5000)
    pt.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    pt.add_argument("--data_parallel", type=int, default=1)
    pt.add_argument("--model_parallel", type=int, default=1)
    pt.add_argument("--distributed", default="",
                    help="multi-host training: 'coordinator_host:port,"
                         "num_processes,process_id' -> jax.distributed."
                         "initialize; the mesh and gradient collectives "
                         "span every host (batch_size is GLOBAL)")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("eval", help="rate-distortion sweep (INI config)")
    pe.add_argument("--input", required=True, help="PLY file or directory")
    pe.add_argument("--rootdir", default="./eval_out")
    pe.add_argument("--cfgdir", required=True, help="INI config path")
    pe.add_argument("--res", type=int, default=1024)
    pe.add_argument("--mode", default="hyper",
                    choices=["hyper", "factorized"])
    pe.add_argument("--modelname", default="voxception")
    pe.add_argument("--chunk", type=int, default=96)
    pe.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    pe.add_argument("--tag", default="",
                    help="suffix for the output CSV/plot basename (two "
                         "modes over the same input don't collide)")
    pe.add_argument("--deadline", type=float, default=0,
                    help="epoch seconds: stop BETWEEN rate points when "
                         "the next one would overrun, keeping the "
                         "partial CSV")
    pe.add_argument("--search_rho_min_scale", type=float, default=0.0,
                    help="with --search_rho: only re-search sections "
                         "whose scale >= this (others keep INI values)")
    pe.add_argument("--search_rho", action="store_true",
                    help="search optimal rho_d1/rho_d2 per rate point and "
                         "cache the winners into the INI in place "
                         "(reference eval_ablation_studies.py:152-205)")
    pe.set_defaults(fn=cmd_eval)

    pa = sub.add_parser("ablate", help="ablation suite: cube size, model, "
                                       "threshold, entropy mode "
                                       "(eval_ablation_studies.py role)")
    pa.add_argument("--input", required=True, help="PLY file")
    pa.add_argument("--out", default="artifacts/ablations")
    pa.add_argument("--ladder", required=True,
                    help="comma-separated hyper ckpt dirs (low->high rate)")
    pa.add_argument("--factorized_ladder", default="")
    pa.add_argument("--simple_ladder", default="")
    pa.add_argument("--res", type=int, default=1024)
    pa.add_argument("--cube_size", type=int, default=64)
    pa.add_argument("--min_num", type=int, default=64)
    pa.add_argument("--chunk", type=int, default=96)
    pa.add_argument("--extra_scales", default="0.625",
                    help="comma-separated extra low-rate points coded at "
                         "positional scale s with each ladder's lowest-"
                         "rate checkpoint (reference "
                         "eval_ablation_studies.py scale-5/8 trick)")
    pa.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    pa.add_argument("--search_rho", action="store_true")
    pa.add_argument("--deadline", type=float, default=0,
                    help="epoch seconds: skip variants whose estimated "
                         "sweep would overrun this instant (slowest, "
                         "least-informative variants are ordered last); "
                         "also stops a running variant between rate "
                         "points, keeping its partial CSV")
    pa.add_argument("--reuse", action="store_true",
                    help="reuse a variant's completed CSV from a previous "
                         "sweep (same --out) instead of re-running it; "
                         "the BD table is recomputed either way")
    # exit-status contract: run_ablations returns (rows, status)
    pa.set_defaults(fn=lambda a: __import__(
        "pcgcv1_tpu.ablation",
        fromlist=["run_ablations"]).run_ablations(a)[1])

    pg = sub.add_parser("gen-dataset", help="PLYs -> per-cube shards")
    pg.add_argument("--input", required=True, help="glob of PLY files")
    pg.add_argument("--outdir", required=True)
    pg.add_argument("--cube_size", type=int, default=64)
    pg.add_argument("--min_num", type=int, default=20)
    pg.add_argument("--h5", action="store_true",
                    help="write reference-style per-cube h5 files")
    pg.set_defaults(fn=cmd_gen_dataset)

    pi = sub.add_parser("info", help="inspect a compressed file set")
    pi.add_argument("input", help="path prefix of the compressed files")
    pi.set_defaults(fn=cmd_info)

    pr = sub.add_parser("report", help="BD-rate tables vs anchors from "
                                       "eval CSVs (results.ipynb role)")
    pr.add_argument("--eval_dir", required=True)
    pr.add_argument("--out", default="")
    pr.add_argument("--inputs_dir", default="",
                    help="directory of the original PLYs (enables anchor "
                         "curves)")
    pr.add_argument("--res", type=int, default=1024)
    pr.add_argument("--published_csv", default="",
                    help="reference's published BD-rate CSV to fold in as "
                         "labeled context (default: auto-discover "
                         "<eval_dir>/../reference_published/bdrates.csv)")
    pr.add_argument("--anchor_shifts", default="1,2,3,4",
                    help="octree depth-truncation ladder (qscale=2^-k), "
                         "the G-PCC-octree-style anchor")
    pr.add_argument("--anchor_scales", default="",
                    help="fractional-rescale anchor points merged into "
                         "the depth-truncation ladder so the anchor "
                         "covers the codec's 63dB+ operating range "
                         "(default 0.875,0.75; 'none' disables)")
    pr.add_argument("--gpcc_trisoup", default="",
                    help="G-PCC trisoup anchor node sizes (log2) driven "
                         "through the MPEG TMC13 binary when present "
                         "(default 2,3,4; 'none' disables; no-op without "
                         "a binary — see codec/gpcc.py)")
    pr.set_defaults(fn=cmd_report)

    pm = sub.add_parser("mesh2pc", help="mesh -> voxelized point cloud")
    pm.add_argument("--input", required=True)
    pm.add_argument("--output", required=True)
    pm.add_argument("--n_points", type=int, default=400_000)
    pm.add_argument("--resolution", type=int, default=255)
    pm.add_argument("--no_rotate", action="store_true")
    pm.add_argument("--normals", action="store_true")
    pm.add_argument("--seed", type=int, default=0)
    pm.set_defaults(fn=cmd_mesh2pc)

    args = p.parse_args(argv)
    rc = args.fn(args)
    # Exit-status contract: handlers return an int status (0 = success) or
    # None/payload (= success). Returning a truthy non-int payload (e.g.
    # run_ablations' row list) must NOT turn into a nonzero exit — that is
    # how a fully successful round-4 ablation sweep logged "rc=1"
    # (artifacts/round4_ablate.log) and masked the chain's real status.
    return rc if isinstance(rc, int) else 0


if __name__ == "__main__":
    sys.exit(main())
