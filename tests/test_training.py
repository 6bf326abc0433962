"""Training: losses, data pipeline, train step (single-device and sharded)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgcv1_tpu.parallel import make_mesh
from pcgcv1_tpu.training import bce_losses, classify_metrics, data
from pcgcv1_tpu.training.train import TrainConfig, Trainer


class TestLosses:
    def test_bce_matches_reference_semantics(self, rng):
        """Masked-mean BCE must equal the reference's gather-based version."""
        pred = rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32) * 5
        label = (rng.random((2, 8, 8, 8, 1)) > 0.9).astype(np.float32)
        empty, full = bce_losses(jnp.asarray(pred), jnp.asarray(label))
        occ = np.clip(1 / (1 + np.exp(-pred)), 1e-7, 1 - 1e-7)
        ref_empty = -np.log(1 - occ[label == 0]).mean()
        ref_full = -np.log(occ[label == 1]).mean()
        np.testing.assert_allclose(float(empty), ref_empty, rtol=1e-5)
        np.testing.assert_allclose(float(full), ref_full, rtol=1e-5)

    def test_classify_metrics(self):
        pred = jnp.asarray([1.0, 1.0, -1.0, -1.0])
        label = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        p, r, iou = classify_metrics(pred, label)
        assert abs(float(p) - 0.5) < 1e-6
        assert abs(float(r) - 0.5) < 1e-6
        assert abs(float(iou) - 1 / 3) < 1e-6

    def test_gradients_reduce_loss(self, rng):
        """The reference's loss.py self-check: optimizing random logits
        against labels must reduce the loss (loss.py:127-152)."""
        import optax
        pred = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)) * 2,
                           jnp.float32)
        label = jnp.asarray(
            (rng.random((1, 8, 8, 8, 1)) > 0.95).astype(np.float32))
        opt = optax.adam(0.05)

        def loss_fn(p):
            e, f = bce_losses(p, label)
            return e + 3.0 * f

        state = opt.init(pred)
        l0 = float(loss_fn(pred))
        step = jax.jit(lambda p, s: opt.update(jax.grad(loss_fn)(p), s))
        for _ in range(300):
            upd, state = step(pred, state)
            pred = optax.apply_updates(pred, upd)
        assert float(loss_fn(pred)) < 0.3 * l0


class TestData:
    def test_synthetic_batches(self):
        ds = data.SyntheticCubeDataset(cube_size=16, seed=1)
        b = next(ds.batches(4))
        assert b.shape == (4, 16, 16, 16, 1)
        assert 0 < b.sum() < 4 * 16 ** 3

    def test_packed_roundtrip(self, tmp_path, rng):
        cubes = [rng.integers(0, 16, (rng.integers(20, 80), 3))
                 for _ in range(10)]
        offsets = np.zeros(11, np.int64)
        offsets[1:] = np.cumsum([len(c) for c in cubes])
        np.savez(tmp_path / "shard_00000.npz",
                 points=np.concatenate(cubes).astype(np.int16),
                 offsets=offsets)
        ds = data.PackedCubeDataset(str(tmp_path / "*.npz"), cube_size=16,
                                    eval_ratio=0)
        b = next(ds.batches(2))
        assert b.shape == (2, 16, 16, 16, 1)

    def test_h5_dataset(self, tmp_path, rng):
        import h5py
        for i in range(10):
            with h5py.File(tmp_path / f"{i}.h5", "w") as h:
                h.create_dataset(
                    "data", data=rng.integers(0, 16, (50, 3)).astype(
                        np.uint8))
        ds = data.H5CubeDataset(str(tmp_path / "*.h5"), cube_size=16,
                                eval_ratio=5)
        assert len(ds.eval_files) == 2 and len(ds.train_files) == 8
        b = next(ds.batches(3))
        assert b.shape == (3, 16, 16, 16, 1)


def _tiny_cfg(tmp_path, mode="hyper", **kw):
    return TrainConfig(mode=mode, cube_size=16, batch_size=4,
                       lr=1e-3, log_every=1000, save_every=10_000,
                       ckpt_dir=str(tmp_path / "ckpt"), **kw)


class TestTrainer:
    def test_loss_decreases(self, tmp_path):
        # hyper mode: the distortion term descends steeply from init, so
        # 12 steps discriminate while keeping the 1-core fast tier quick
        cfg = _tiny_cfg(tmp_path, "hyper")
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16, seed=2)
        it = ds.batches(cfg.batch_size)
        first = float(tr.train_step(next(it))["loss"])
        losses = [float(tr.train_step(next(it))["loss"])
                  for _ in range(12)]
        assert np.mean(losses[-4:]) < first
        assert np.isfinite(losses).all()

    @pytest.mark.slow
    def test_loss_decreases_factorized(self, tmp_path):
        # factorized mode's loss is rate-dominated at init and the density
        # parameters adapt over tens of steps — needs the longer horizon
        cfg = _tiny_cfg(tmp_path, "factorized")
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16, seed=2)
        it = ds.batches(cfg.batch_size)
        first = float(tr.train_step(next(it))["loss"])
        losses = [float(tr.train_step(next(it))["loss"])
                  for _ in range(30)]
        assert np.mean(losses[-5:]) < first
        assert np.isfinite(losses).all()

    def test_ste_quant_trains(self, tmp_path):
        """quant='ste' (rounding-aware fine-tune): steps run, loss is
        finite and decreases, and gradients reach the analysis transform
        through the straight-through round."""
        cfg = _tiny_cfg(tmp_path, "hyper", quant="ste")
        tr = Trainer(cfg)
        before = np.asarray(
            jax.tree.leaves(tr.state["params"]["analysis"])[0])
        ds = data.SyntheticCubeDataset(cube_size=16, seed=2)
        it = ds.batches(cfg.batch_size)
        first = float(tr.train_step(next(it))["loss"])
        losses = [float(tr.train_step(next(it))["loss"])
                  for _ in range(12)]
        assert np.isfinite(losses).all()
        assert np.mean(losses[-4:]) < first
        after = np.asarray(
            jax.tree.leaves(tr.state["params"]["analysis"])[0])
        assert not np.array_equal(before, after)

    def test_resume_across_lr_schedules(self, tmp_path):
        """Resuming under a different lr_schedule than the checkpoint was
        saved with changes the optax state structure (constant lr ->
        EmptyState vs cosine -> a schedule step count); the trainer must
        still resume, carrying over params, step, and the Adam moments
        (round-2 extend script regression)."""
        cfg = _tiny_cfg(tmp_path, lr_schedule="cosine", warmup_steps=2,
                        num_iterations=20)
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16)
        it = ds.batches(cfg.batch_size)
        for _ in range(3):
            tr.train_step(next(it))
        tr.save()
        cfg2 = _tiny_cfg(tmp_path, lr_schedule="constant",
                         num_iterations=20)
        tr2 = Trainer(cfg2)
        assert int(tr2.state["step"]) == 3
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(tr.state["params"])[0]),
            np.asarray(jax.tree.leaves(tr2.state["params"])[0]))
        adam = tr2.state["opt_state"][0]
        assert int(np.asarray(adam.count)) == 3
        # Adam moments transferred, not re-zeroed
        assert any(np.abs(np.asarray(m)).sum() > 0
                   for m in jax.tree.leaves(adam.mu))
        # training continues from the grafted state
        loss = float(tr2.train_step(next(it))["loss"])
        assert np.isfinite(loss)
        # and the reverse direction (constant ckpt -> cosine resume)
        # seeds the schedule count from the restored step
        tr2.save()
        cfg3 = _tiny_cfg(tmp_path, lr_schedule="cosine", warmup_steps=2,
                         num_iterations=20)
        tr3 = Trainer(cfg3)
        assert int(tr3.state["step"]) == 4
        sched = tr3.state["opt_state"][-1]
        assert int(np.asarray(sched.count)) == 4

    def test_resume_across_optimizer_partition(self, tmp_path):
        """Resuming a plain-adam checkpoint with est_lr on (optax
        multi_transform: the opt state root becomes a NAMEDTUPLE with an
        inner_states dict, not a chain tuple) must graft, not crash —
        round-4 regression: the flat graft demoted the namedtuple root to
        a plain tuple and update() died on `.inner_states`."""
        cfg = _tiny_cfg(tmp_path, lr_schedule="constant", num_iterations=20)
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16)
        it = ds.batches(cfg.batch_size)
        for _ in range(3):
            tr.train_step(next(it))
        tr.save()
        cfg2 = _tiny_cfg(tmp_path, lr_schedule="constant",
                         num_iterations=20, est_lr=5e-3)
        tr2 = Trainer(cfg2)
        assert int(tr2.state["step"]) == 3
        inner = tr2.state["opt_state"].inner_states
        # the 'main' branch grafted the saved Adam moments; both branches
        # must be real typed states (update() would crash otherwise)
        main_moments = [np.abs(np.asarray(m)).sum()
                        for m in jax.tree.leaves(inner["main"])]
        assert sum(main_moments) > 0
        loss = float(tr2.train_step(next(it))["loss"])
        assert np.isfinite(loss)
        assert int(tr2.state["step"]) == 4
        # reverse direction: est_lr checkpoint -> plain adam resume
        tr2.save()
        cfg3 = _tiny_cfg(tmp_path, lr_schedule="constant",
                         num_iterations=20)
        tr3 = Trainer(cfg3)
        assert int(tr3.state["step"]) == 4
        loss = float(tr3.train_step(next(it))["loss"])
        assert np.isfinite(loss)

    def test_resume_wrong_model_raises(self, tmp_path):
        """A checkpoint whose params tree doesn't match the current model
        (e.g. resuming a factorized ckpt as hyper, or a different model)
        must raise, not silently take the schedule-tolerant graft path
        (ADVICE round 2: bare except routed ALL mismatches into it)."""
        cfg = _tiny_cfg(tmp_path, "factorized", lr_schedule="cosine",
                        warmup_steps=2, num_iterations=20)
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16)
        tr.train_step(next(ds.batches(cfg.batch_size)))
        tr.save()
        # same ckpt_dir, different mode AND different lr schedule: the
        # strict restore fails structurally, and the graft fallback must
        # detect the params mismatch instead of adopting the wrong tree
        cfg2 = _tiny_cfg(tmp_path, "hyper", num_iterations=20)
        with pytest.raises(ValueError, match="does not match"):
            Trainer(cfg2)

    def test_metrics_contents(self, tmp_path):
        tr = Trainer(_tiny_cfg(tmp_path))
        ds = data.SyntheticCubeDataset(cube_size=16)
        m = tr.train_step(next(ds.batches(4)))
        assert {"loss", "bpp_ae", "bpp_hyper", "distortion", "iou"} <= set(m)
        assert 0.0 <= float(m["iou"]) <= 1.0

    def test_checkpoint_resume(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16)
        it = ds.batches(cfg.batch_size)
        for _ in range(3):
            tr.train_step(next(it))
        tr.save()
        tr2 = Trainer(cfg)
        assert int(tr2.state["step"]) == 3
        p0 = jax.tree.leaves(tr.state["params"])[0]
        p1 = jax.tree.leaves(tr2.state["params"])[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    def test_transient_failure_recovery(self, tmp_path):
        """A transient runtime failure mid-fit must restore the newest
        checkpoint and continue to the requested step count."""
        cfg = _tiny_cfg(tmp_path, max_failures=3)
        cfg.save_every = 2
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16, seed=3)
        real_step = tr.train_step
        calls = {"n": 0}

        def flaky(batch):
            calls["n"] += 1
            if calls["n"] == 4:
                raise RuntimeError(
                    "FAILED_PRECONDITION: relay stream reset (synthetic)")
            return real_step(batch)

        tr.train_step = flaky
        logs = []
        final = tr.fit(ds.batches(cfg.batch_size), num_iterations=6,
                       log_fn=logs.append)
        assert final == 6
        # the failure at call 4 (host step 3) rolled back to the step-2
        # checkpoint, so more than 6 successful steps ran overall
        assert calls["n"] > 6
        assert any("recovering_from" in l for l in logs)

    def test_persistent_failure_reraises(self, tmp_path):
        cfg = _tiny_cfg(tmp_path, max_failures=3)
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16, seed=3)
        tr.train_step = lambda b: (_ for _ in ()).throw(
            ValueError("shape mismatch — not transient"))
        with pytest.raises(ValueError):
            tr.fit(ds.batches(cfg.batch_size), num_iterations=4,
                   log_fn=lambda *_: None)

    def test_warm_start_reset_optimizer(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        tr = Trainer(cfg)
        ds = data.SyntheticCubeDataset(cube_size=16)
        it = ds.batches(cfg.batch_size)
        tr.train_step(next(it))
        tr.save()
        cfg2 = _tiny_cfg(tmp_path)
        cfg2.ckpt_dir = str(tmp_path / "ckpt2")
        cfg2.init_ckpt_dir = cfg.ckpt_dir
        cfg2.reset_optimizer = True
        tr2 = Trainer(cfg2)
        assert int(tr2.state["step"]) == 0  # fresh optimizer/step
        p0 = jax.tree.leaves(tr.state["params"])[0]
        p1 = jax.tree.leaves(tr2.state["params"])[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
class TestShardedTrainer:
    def test_dp_tp_mesh_step(self, tmp_path):
        """Full hyper train step over a 4x2 (data x model) mesh on the
        8-device CPU backend: GSPMD shards batch and conv channels."""
        mesh = make_mesh(n_data=4, n_model=2)
        cfg = _tiny_cfg(tmp_path)
        tr = Trainer(cfg, mesh=mesh)
        ds = data.SyntheticCubeDataset(cube_size=16)
        m = tr.train_step(next(ds.batches(8)))
        assert np.isfinite(float(m["loss"]))

    def test_dp_matches_single_device(self, tmp_path):
        """Data-parallel gradients must match single-device training
        numerically (same batch, same init)."""
        ds = data.SyntheticCubeDataset(cube_size=16, seed=5)
        batch = next(ds.batches(8))
        cfg = _tiny_cfg(tmp_path, seed=9)
        tr_single = Trainer(cfg)
        m_single = tr_single.train_step(batch)
        cfg2 = _tiny_cfg(tmp_path, seed=9)
        cfg2.ckpt_dir = str(tmp_path / "c2")
        tr_mesh = Trainer(cfg2, mesh=make_mesh(n_data=8, n_model=1))
        m_mesh = tr_mesh.train_step(batch)
        np.testing.assert_allclose(float(m_single["loss"]),
                                   float(m_mesh["loss"]), rtol=1e-4)


@pytest.mark.slow
def test_partial_warm_start_across_modes(tmp_path):
    """Warm-starting a factorized run from a hyper checkpoint copies the
    shape-matching modules (analysis/synthesis) and inits the rest."""
    cfg_h = _tiny_cfg(tmp_path, "hyper")
    tr_h = Trainer(cfg_h)
    ds = data.SyntheticCubeDataset(cube_size=16)
    tr_h.train_step(next(ds.batches(4)))
    tr_h.save()
    cfg_f = _tiny_cfg(tmp_path, "factorized")
    cfg_f.ckpt_dir = str(tmp_path / "fact")
    cfg_f.init_ckpt_dir = cfg_h.ckpt_dir
    cfg_f.reset_optimizer = True
    tr_f = Trainer(cfg_f)
    a_h = jax.tree.leaves(tr_h.state["params"]["analysis"])[0]
    a_f = jax.tree.leaves(tr_f.state["params"]["analysis"])[0]
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(a_f))
    # estimator differs in channels -> freshly initialized, still trainable
    m = tr_f.train_step(next(ds.batches(4)))
    assert np.isfinite(float(m["loss"]))


class TestPrefetch:
    def test_exceptions_propagate(self):
        from pcgcv1_tpu.training.data import prefetch

        def it():
            yield 1
            raise IOError("corrupt shard")

        import pytest as _pytest
        with _pytest.raises(IOError):
            list(prefetch(it()))

    def test_early_stop_releases_worker(self):
        import threading
        import time
        from pcgcv1_tpu.training.data import prefetch

        def infinite():
            i = 0
            while True:
                yield i
                i += 1

        n0 = threading.active_count()
        g = prefetch(infinite())
        got = [v for _, v in zip(range(4), g)]
        assert got == [0, 1, 2, 3]
        g.close()
        time.sleep(1.2)
        assert threading.active_count() <= n0

    def test_order_preserved(self):
        from pcgcv1_tpu.training.data import prefetch
        assert list(prefetch(iter(range(20)))) == list(range(20))


def test_numpy_init_matches_flax_distributions(tmp_path):
    """npinit must produce the same initializer distributions as flax:
    exact constants/zeros where flax is deterministic, matching moments
    where it samples (utils/npinit.py)."""
    from pcgcv1_tpu.utils import npinit
    cfg = _tiny_cfg(tmp_path, "hyper")
    tr = Trainer(cfg)  # random init -> numpy_init path
    p = tr.state["params"]
    # estimator constants: matrix_0 of filters (3,3,3), init_scale 8
    k = 4
    scale = 8.0 ** (1.0 / k)
    want = float(np.log(np.expm1(1.0 / scale / 3)))
    m0 = np.asarray(jax.tree.leaves(
        {"m": p["estimator"]["matrix_0"]})[0])
    assert np.allclose(m0, want)
    assert np.all(np.asarray(p["estimator"]["factor_0"]) == 0.0)
    b0 = np.asarray(p["estimator"]["bias_0"])
    assert b0.min() >= -0.5 and b0.max() <= 0.5
    # conv kernel: lecun_normal stats (std ~ sqrt(1/fan_in), truncated 2sd)
    kern = np.asarray(p["analysis"]["conv_in"]["kernel"])
    fan_in = int(np.prod(kern.shape[:-1]))
    std = kern.std()
    assert 0.7 / np.sqrt(fan_in) < std < 1.2 / np.sqrt(fan_in)
    assert np.abs(kern).max() < 2.3 / np.sqrt(fan_in)
    # conv bias zeros
    assert np.all(np.asarray(p["analysis"]["conv_in"]["bias"]) == 0.0)
