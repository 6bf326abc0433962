"""Ablation driver: config generation, variant sweep, BD pairing."""

import argparse
import os

import numpy as np

from pcgcv1_tpu import ablation


def test_variant_config_layout(tmp_path):
    p = ablation.variant_config(
        str(tmp_path / "v.ini"), ["ck_low", "ck_high"], cube_size=32,
        fixed_thres=0.0, extra_scales=(0.625,))
    import configparser
    cfg = configparser.ConfigParser()
    cfg.read(p)
    assert cfg.sections() == ["R1", "R2", "R3"]
    assert cfg["R1"]["scale"] == "0.625"
    assert cfg["R1"]["ckpt_dir"] == "ck_low"
    assert cfg["R3"]["ckpt_dir"] == "ck_high"
    assert cfg["R2"]["fixed_thres"] == "0.0"
    assert cfg["R2"]["cube_size"] == "32"


def test_run_ablations_driver(tmp_path, monkeypatch):
    """Driver glue with a mocked eval: variant configs generated with the
    right overrides, chunk scaled by cube volume, missing ladders skipped,
    BD rows computed and written."""
    calls = []

    def fake_eval(name, input_file, cfg_path, out_root, res, mode, model,
                  chunk, dtype, search_rho=False):
        calls.append({"name": name, "mode": mode, "model": model,
                      "chunk": chunk, "cfg": cfg_path})
        # three synthetic rate points (the BD gate requires >=3 surviving
        # Pareto points); 'hyper32' made strictly worse so the BD sign is
        # deterministic
        worse = 3.0 if name == "hyper32" else 0.0
        csv = os.path.join(out_root, name + ".csv")
        os.makedirs(out_root, exist_ok=True)
        with open(csv, "w") as f:
            f.write("rate,bpp,d1_psnr,d2_psnr\n")
            f.write(f"R1,0.10,{60.0 - worse},{62.0 - worse}\n")
            f.write(f"R2,0.30,{68.0 - worse},{70.0 - worse}\n")
            f.write(f"R3,0.60,{71.0 - worse},{73.0 - worse}\n")
        return csv

    monkeypatch.setattr(ablation, "_eval_variant", fake_eval)
    args = argparse.Namespace(
        input="unused.ply", out=str(tmp_path / "abl"),
        ladder="ck_low,ck_high", factorized_ladder="", simple_ladder="",
        res=1024, cube_size=64, min_num=64, chunk=64, dtype="bfloat16",
        search_rho=False)
    rows = ablation.run_ablations(args)

    by_name = {c["name"]: c for c in calls}
    # factorized/simple ladders absent -> those variants skipped
    assert set(by_name) == {"hyper64", "hyper32", "hyper128",
                            "hyper_fixed"}
    # chunk scales with cube volume: 64->64, 32->8x, 128->1/8
    assert by_name["hyper64"]["chunk"] == 64
    assert by_name["hyper32"]["chunk"] == 512
    assert by_name["hyper128"]["chunk"] == 8
    import configparser
    fixed = configparser.ConfigParser()
    fixed.read(by_name["hyper_fixed"]["cfg"])
    assert fixed["R1"]["fixed_thres"] == "0.0"

    labels = {r["comparison"] for r in rows}
    assert labels == {"cube64_vs_cube32", "cube128_vs_cube64",
                      "adaptive_vs_fixed_thres"}
    row = next(r for r in rows if r["comparison"] == "cube64_vs_cube32")
    # hyper64 strictly dominates the degraded hyper32 -> negative BD-rate
    assert row["bdrate_d1_pct"] < 0
    assert np.isfinite(row["bdsnr_d1_db"])
    assert os.path.exists(os.path.join(args.out, "ablation_bd.csv"))


def test_run_ablations_deadline_gate(tmp_path, monkeypatch):
    """--deadline skips variants whose estimated sweep would overrun,
    in declared order (hyper128 last so a cut drops it first), and an
    exhausted budget runs nothing."""
    import time

    calls = []

    def fake_eval(name, *a, **k):
        calls.append(name)
        return os.path.join(str(tmp_path), name + ".csv")  # never written

    monkeypatch.setattr(ablation, "_eval_variant", fake_eval)
    args = argparse.Namespace(
        input="unused.ply", out=str(tmp_path / "abl"),
        ladder="c1,c2", factorized_ladder="f1", simple_ladder="s1",
        res=1024, cube_size=64, min_num=64, chunk=64, dtype="bfloat16",
        search_rho=False, extra_scales="0.625", deadline=time.time() + 1)
    ablation.run_ablations(args)
    assert calls == []

    args.deadline = 0  # no deadline: everything runs, hyper128 last
    calls.clear()
    ablation.run_ablations(args)
    assert calls == ["hyper64", "factorized", "factorized_simple",
                     "hyper32", "hyper_fixed", "hyper128"]
