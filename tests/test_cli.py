"""CLI end-to-end: compress/decompress round trip, train smoke, eval sweep,
dataset tools — the reference's test.py / eval.py usage patterns."""

import configparser
import os

import numpy as np
import pytest

from pcgcv1_tpu import cli
from pcgcv1_tpu.ops import load_ply, write_ply


@pytest.fixture(scope="module")
def cloud_file(tmp_path_factory):
    rng = np.random.default_rng(21)
    pts = np.unique(np.clip(np.round(rng.normal(32, 13, (50000, 3))),
                            0, 63).astype(np.int32), axis=0)
    d = tmp_path_factory.mktemp("clouds")
    f = str(d / "toy.ply")
    write_ply(f, pts)
    return f, pts


@pytest.mark.parametrize("mode", ["factorized", "hyper"])
@pytest.mark.slow
def test_compress_decompress_roundtrip(cloud_file, tmp_path, mode):
    f, pts = cloud_file
    rootdir = str(tmp_path / "comp")
    out = str(tmp_path / "rec.ply")
    common = ["--mode", mode, "--cube_size", "16", "--min_num", "10",
              "--chunk", "8", "--rootdir", rootdir]
    cli.main(["compress", f, "toy"] + common)
    expected = {"factorized": [".strings", ".pointnums", ".cubepos"],
                "hyper": [".strings", ".strings_head", ".strings_hyper",
                          ".pointnums", ".cubepos"]}[mode]
    for ext in expected:
        assert os.path.exists(os.path.join(rootdir, "toy" + ext)), ext
    cli.main(["decompress", os.path.join(rootdir, "toy"), out] + common)
    rec = load_ply(out)
    assert len(rec) > 0.5 * len(pts)
    assert rec.min() >= 0 and rec.max() < 64


@pytest.mark.slow
def test_train_smoke(tmp_path):
    ckpt = str(tmp_path / "ck")
    cli.main(["train", "--data", "synthetic", "--cube_size", "16",
              "--batch_size", "2", "--num_iteration", "3",
              "--ckpt_dir", ckpt, "--lr", "1e-4"])
    assert os.path.exists(os.path.join(ckpt, "train_log.jsonl")) or \
        any(d.startswith("ckpt") for d in os.listdir(ckpt))


@pytest.mark.slow
def test_eval_harness(cloud_file, tmp_path):
    f, _ = cloud_file
    # train 2 steps to create a checkpoint the harness can restore
    ckpt = str(tmp_path / "ck")
    cli.main(["train", "--data", "synthetic", "--cube_size", "16",
              "--batch_size", "2", "--num_iteration", "2",
              "--ckpt_dir", ckpt])
    cfgp = str(tmp_path / "rates.ini")
    cfg = configparser.ConfigParser()
    cfg["DEFAULT"] = {"cube_size": "16", "min_num": "10"}
    cfg["R1"] = {"scale": "1.0", "ckpt_dir": ckpt,
                 "rho_d1": "1.0", "rho_d2": "1.0"}
    with open(cfgp, "w") as fh:
        cfg.write(fh)
    rootdir = str(tmp_path / "eval")
    cli.main(["eval", "--input", f, "--rootdir", rootdir,
              "--cfgdir", cfgp, "--res", "64", "--chunk", "8"])
    import pandas as pd
    df = pd.read_csv(os.path.join(rootdir, "toy.csv"))
    assert {"bpp", "d1_psnr", "d2_psnr"} <= set(df.columns)
    assert np.isfinite(df["bpp"]).all()
    assert os.path.exists(os.path.join(rootdir, "toy.png"))


def test_mesh2pc_ply_mesh_input(tmp_path):
    # PLY triangle meshes (the reference's pyntcloud path,
    # dataprocess/mesh2pc.py:56-89), ASCII and binary containers
    from pcgcv1_tpu.training import datagen
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.2]],
                     np.float64)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    ascii_ply = tmp_path / "mesh_a.ply"
    ascii_ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        + "".join(f"{v[0]} {v[1]} {v[2]}\n" for v in verts)
        + "".join(f"3 {f[0]} {f[1]} {f[2]}\n" for f in faces))
    bin_ply = tmp_path / "mesh_b.ply"
    with open(bin_ply, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n"
                 b"element vertex 4\n"
                 b"property float x\nproperty float y\nproperty float z\n"
                 b"element face 2\n"
                 b"property list uchar int vertex_indices\nend_header\n")
        fh.write(np.ascontiguousarray(verts, "<f4").tobytes())
        for f in faces:
            fh.write(np.uint8(3).tobytes()
                     + np.ascontiguousarray(f, "<i4").tobytes())
    for p in (ascii_ply, bin_ply):
        v, fa = datagen.load_mesh(str(p))
        np.testing.assert_allclose(v, verts, atol=1e-6)
        np.testing.assert_array_equal(fa, faces)
        out = str(tmp_path / (p.stem + "_pc.ply"))
        cli.main(["mesh2pc", "--input", str(p), "--output", out,
                  "--n_points", "5000", "--resolution", "31",
                  "--no_rotate"])
        assert len(load_ply(out)) > 100


def test_gen_dataset_and_mesh2pc(tmp_path):
    # tiny cube mesh (2 triangles per face would be 12; use 2 for speed)
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3\nf 2 4 3\n")
    out_ply = str(tmp_path / "m.ply")
    cli.main(["mesh2pc", "--input", str(obj), "--output", out_ply,
              "--n_points", "20000", "--resolution", "63", "--no_rotate"])
    pts = load_ply(out_ply)
    assert len(pts) > 500
    shards = str(tmp_path / "shards")
    cli.main(["gen-dataset", "--input", out_ply, "--outdir", shards,
              "--cube_size", "16", "--min_num", "5"])
    import glob
    assert glob.glob(os.path.join(shards, "*.npz"))
