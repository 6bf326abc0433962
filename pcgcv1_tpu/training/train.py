"""R-D training loop (pjit, data-parallel over the cube batch).

Capability parity with the reference trainers (`train_factorized.py`,
`train_hyper.py`): Adam (default lr 1e-5, batch 8), loss

    factorized: alpha*(beta*bce_empty + bce_full) + bpp            (:158-163)
    hyper:      alpha*(beta*bce_empty + bce_full)
                + delta*bpp_y + gamma*bpp_z                        (:193-199)

with bpp normalized by occupied input voxels, scale lower bound on the
hyper-decoder output ("start with large lower bound to avoid crashes",
train_hyper.py:189), IoU/precision/recall via the rho=1 adaptive threshold,
periodic eval and checkpointing, auto-resume, and warm start from an
initial checkpoint with optional optimizer reset (train_hyper.py:271-284).

TPU redesign: one jitted train step over the whole batch (the reference
voxelizes and iterates eagerly), sharded over a ('data','model') mesh —
gradients are averaged by XLA-inserted ICI collectives via GSPMD; metrics
(including the per-cube top-k IoU, a device sort) stay on device, so there
is no per-step host sync (the reference round-trips x_tilde through numpy
every step, train_hyper.py:217-225).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pcgcv1_tpu.entropy import FactorizedEntropy, conditional
from pcgcv1_tpu.models import get_model
from pcgcv1_tpu.parallel import mesh as mesh_lib
from pcgcv1_tpu.training import losses
from pcgcv1_tpu.utils import checkpoint as ckpt_lib
from pcgcv1_tpu.utils import npinit


def _trees_shape_equal(a, b):
    """True iff two pytrees have the same structure AND every pair of
    leaves has the same shape (not just the same rank — a (1,) vs (N,)
    moment would broadcast silently through Adam otherwise)."""
    try:
        if jax.tree.structure(a) != jax.tree.structure(b):
            return False
        return all(np.shape(x) == np.shape(y)
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))
    except Exception:
        return False


@dataclasses.dataclass
class TrainConfig:
    model: str = "voxception"
    mode: str = "hyper"                # "hyper" | "factorized"
    alpha: float = 2.0                 # distortion weight
    beta: float = 3.0                  # empty-position weight
    gamma: float = 1.0                 # hyper-bpp weight
    delta: float = 1.0                 # latent-bpp weight
    lr: float = 1e-5
    lr_schedule: str = "constant"      # "constant" | "cosine"
    warmup_steps: int = 500            # cosine schedule only
    lr_final: float = 1e-6             # cosine schedule only
    batch_size: int = 8
    cube_size: int = 64
    num_iterations: int = 300_000
    scale_lower_bound: float = 1e-9
    ckpt_dir: str = "checkpoints/run"
    init_ckpt_dir: str = ""
    reset_optimizer: bool = False
    log_every: int = 100
    save_every: int = 5000
    max_failures: int = 5              # transient-failure recovery budget
    eval_samples: int = 256
    quant: str = "noise"               # "noise" | "ste" (see _forward)
    # initial half-width of the factorized density's support. 8 suits
    # from-scratch runs (latents grow with the density); warm-started
    # factorized runs inherit transforms whose latents already span
    # O(100), and a too-narrow init spends thousands of steps stretching
    # (round 2: bpp 102 -> 67 over 2.3k steps). Size it ~4x the measured
    # latent std of the init checkpoint.
    eb_init_scale: float = 8.0
    # separate (faster) Adam lr for the factorized density parameters;
    # 0 = share the main optimizer (reference behavior)
    est_lr: float = 0.0
    # warm-start latent reparameterization (partial cross-mode warm starts
    # only): scale analysis output by g and synthesis input by 1/g.
    latent_gain: float = 1.0
    dtype: Any = jnp.float32
    seed: int = 0


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.hyper = cfg.mode == "hyper"
        self.family = get_model(cfg.model)
        self.mods = self.family.make(dtype=cfg.dtype, hyper=self.hyper,
                                     remat=True)
        bottleneck_channels = (self.family.hyper_channels if self.hyper
                               else self.family.latent_channels)
        self.estimator = FactorizedEntropy(
            channels=bottleneck_channels, init_scale=cfg.eb_init_scale)
        self.mesh = mesh
        # The reference ships lr=1e-5 x 3e5 steps (train_hyper.py:50) but
        # its earlier recipe was exponential_decay(1e-4, 20k, 0.75)
        # (train_hyper.py:101, commented out); warmup-cosine from 1e-4
        # reaches the same loss in far fewer steps at batch 32.
        if cfg.lr_schedule == "cosine":
            lr = optax.warmup_cosine_decay_schedule(
                init_value=cfg.lr / 10, peak_value=cfg.lr,
                warmup_steps=cfg.warmup_steps,
                decay_steps=max(cfg.num_iterations, cfg.warmup_steps + 1),
                end_value=cfg.lr_final)
        else:
            lr = cfg.lr
        if cfg.est_lr:
            # the factorized density is a tiny monotone 1D model whose
            # only job is to track the (fixed-ish) latent histogram; at
            # the transform lr it takes tens of thousands of steps to
            # concentrate p(0) from its ~uniform init to its ~0.99
            # equilibrium (3 bits/element of dead rate, ~40+ bpp). A
            # separate fast Adam on just the estimator closes that in
            # hundreds of steps without touching transform dynamics.
            self.optimizer = optax.multi_transform(
                {"main": optax.adam(lr), "est": optax.adam(cfg.est_lr)},
                param_labels=lambda params: {
                    k: ("est" if k == "estimator" else "main")
                    for k in params})
        else:
            self.optimizer = optax.adam(lr)
        self.state = self._init_state()
        self._restore()
        # host-side mirror of state["step"]: reading the device scalar
        # every step would force a blocking sync (device round trip)
        self._host_step = int(self.state["step"])
        # host snapshot of the initial state: the recovery template (and
        # the restart point if a transient failure hits before the first
        # checkpoint lands). Donated device buffers can't serve as a
        # restore target after a failed step.
        self._init_snapshot = jax.tree.map(np.asarray,
                                           jax.device_get(self.state))
        self._step_fn = self._build_step()

    # ------------------------------------------------------------- state --
    def _init_params_impl(self):
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        keys = jax.random.split(key, 8)
        cs, f = 16, self.family.down_factor
        x = jnp.zeros((1, cs, cs, cs, 1), jnp.float32)
        y = jnp.zeros((1, cs // f, cs // f, cs // f,
                       self.family.latent_channels), jnp.float32)
        params = {
            "analysis": self.mods["analysis"].init(keys[0], x)["params"],
            "synthesis": self.mods["synthesis"].init(keys[1], y)["params"],
        }
        if self.hyper:
            z = jnp.zeros((1, cs // f // 2,) * 3 + (
                self.family.hyper_channels,), jnp.float32)
            params["hyper_encoder"] = self.mods["hyper_encoder"].init(
                keys[2], y)["params"]
            params["hyper_decoder"] = self.mods["hyper_decoder"].init(
                keys[3], z)["params"]
            est_in = z
        else:
            est_in = y
        params["estimator"] = self.estimator.init(
            {"params": keys[4]}, est_in, training=False)["params"]
        return params

    def _make_state(self):
        # pure (traceable) full-state constructor: params + optimizer state
        params = self._init_params_impl()
        return {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def _materialize_state(self):
        """Random-init state with zero XLA compiles.

        Both eager flax init (hundreds of tiny programs) and a single
        jitted init program cost minutes of compile on a cold-cache
        single-core host (274 s / ~360 s measured); remote-TPU eager init
        cost 383 s of relay round trips in round 1. numpy_init fills the
        eval_shape skeleton with the same initializer distributions in
        milliseconds; zeros are exactly optax.adam's fresh state."""
        abstract = jax.eval_shape(self._make_state)
        state = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                             abstract)
        state["params"] = npinit.numpy_init(
            abstract["params"], seed=self.cfg.seed,
            est_init_scale=self.cfg.eb_init_scale)
        return state

    def _init_state(self):
        # When a checkpoint will overwrite the state anyway (resume or
        # warm start), skip init compute entirely: eval_shape gives the
        # structure and numpy zeros materialize it for free. Zeros are
        # also exactly optax.adam's fresh optimizer state, which is what
        # the reset_optimizer warm-start path leaves in place.
        will_restore = (ckpt_lib.latest_path(self.cfg.ckpt_dir) is not None
                        or bool(self.cfg.init_ckpt_dir))
        if will_restore:
            abstract = jax.eval_shape(self._make_state)
            return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                abstract)
        state = self._materialize_state()
        self.state = state
        self._apply_latent_gain()  # fresh init: reparameterize once
        return state

    def _apply_latent_gain(self):
        """Exact latent reparameterization: y' = g*y, synthesis/g.

        Reconstruction is unchanged but round(y') resolves the latent
        structure immediately. Hyper-trained latents are tiny (std
        ~0.06-0.2 — the conditional prior handles sub-integer scales) and
        fresh-init latents are similar; either would quantize to
        all-zeros at the start of a factorized run, blowing up the rate
        term while the transforms slowly grow them (round 2: 100+ bpp
        starts, ~15 bpp/1k-step recovery). Applied ONCE per run: at
        partial cross-mode warm start or at fresh init — never on resume
        (the scaled weights are already in the checkpoint).
        """
        g = float(self.cfg.latent_gain)
        if not g or g == 1.0:
            return
        a_name, s_name = self.family.latent_io
        pa = self.state["params"]["analysis"][a_name]
        pa["kernel"] = pa["kernel"] * g
        if "bias" in pa:
            pa["bias"] = pa["bias"] * g
        ps = self.state["params"]["synthesis"][s_name]
        ps["kernel"] = ps["kernel"] * (1.0 / g)
        print(f"latent gain {g}x applied (analysis/{a_name} * g, "
              f"synthesis/{s_name} / g)")

    def _restore(self):
        cfg = self.cfg
        try:
            restored = ckpt_lib.restore(cfg.ckpt_dir, like=self.state)
        except ValueError as strict_err:
            # Resuming under a different lr_schedule than the checkpoint
            # was saved with changes the optax state *structure* (constant
            # lr -> EmptyState, schedule -> ScaleByScheduleState), which
            # the strict structural restore rejects. Fall back to a raw
            # restore and graft what transfers: params, step, and the Adam
            # moments (identical in both forms); the schedule state (a
            # step count) is rebuilt from the restored step. The graft path
            # is ONLY for optimizer-chain changes: a params tree that does
            # not match the current model re-raises the strict error.
            restored = self._restore_across_schedules(strict_err)
        if restored is not None:
            self.state = restored
            return
        if cfg.init_ckpt_dir:
            # warm start: take params (and optimizer unless reset). A
            # structure mismatch (e.g. warm-starting a factorized run from
            # a hyper checkpoint) falls back to copying the top-level
            # modules that match by name and shape — the reference's
            # object-graph restore behaves the same way for subsets.
            try:
                init = ckpt_lib.restore(cfg.init_ckpt_dir, like=self.state)
                partial = False
            except Exception:
                init = ckpt_lib.restore(cfg.init_ckpt_dir)
                partial = True
            if init is None:
                raise FileNotFoundError(
                    f"init_ckpt_dir {cfg.init_ckpt_dir!r} has no checkpoint")
            if not partial:
                self.state["params"] = init["params"]
                if not cfg.reset_optimizer:
                    self.state["opt_state"] = init["opt_state"]
                    self.state["step"] = init["step"]
            else:
                # the skeleton from _init_state is zeros; modules the
                # partial copy below does not cover need real random init
                self.state = self._materialize_state()
                src = init.get("params", init)
                copied = []
                for name, tree in self.state["params"].items():
                    if name not in src:
                        continue
                    flat_dst = jax.tree.leaves(tree)
                    flat_src = jax.tree.leaves(src[name])
                    if len(flat_dst) == len(flat_src) and all(
                            np.shape(a) == np.shape(b)
                            for a, b in zip(flat_dst, flat_src)):
                        self.state["params"][name] = jax.tree.map(
                            jnp.asarray, src[name])
                        copied.append(name)
                print(f"partial warm start from {cfg.init_ckpt_dir}: "
                      f"copied {copied}")
                if "analysis" in copied and "synthesis" in copied:
                    self._apply_latent_gain()
                # fresh optimizer state for the mixed tree
                self.state["opt_state"] = self.optimizer.init(
                    self.state["params"])

    def _restore_across_schedules(self, strict_err=None):
        """Raw-restore the latest checkpoint and graft it into this
        trainer's state structure, tolerating an optimizer-chain change.

        Orbax's untargeted restore returns the pytree with namedtuples
        flattened to dicts and tuples to lists; params/step map over
        directly, and the Adam moments (opt_state[0]: count/mu/nu) have
        the same fields under every lr form. Any schedule step-count
        state in the new chain is seeded from the restored step so a
        resumed cosine doesn't restart its warmup.

        The checkpoint's params must match the current model exactly
        (tree structure and every leaf shape); a mismatch means the
        strict-restore failure was NOT a schedule change (wrong model /
        mode / channel width) and the original error is re-raised.
        """
        raw = ckpt_lib.restore(self.cfg.ckpt_dir)
        if raw is None:
            return None
        state = self.state
        step = np.asarray(raw["step"], state["step"].dtype)
        params = jax.tree.map(np.asarray, raw["params"])
        cur_params = jax.eval_shape(self._make_state)["params"]
        cur_shapes = jax.tree.map(lambda s: tuple(s.shape), cur_params)
        try:
            raw_shapes = jax.tree.map(lambda a: tuple(np.shape(a)), params)
            shapes_ok = (jax.tree.structure(cur_shapes)
                         == jax.tree.structure(raw_shapes)
                         and jax.tree.leaves(cur_shapes)
                         == jax.tree.leaves(raw_shapes))
        except Exception:
            shapes_ok = False
        if not shapes_ok:
            msg = (f"checkpoint in {self.cfg.ckpt_dir!r} has a params tree "
                   "that does not match the current model (different model/"
                   "mode/width?) — refusing the schedule-tolerant graft")
            if strict_err is not None:
                raise ValueError(msg) from strict_err
            raise ValueError(msg)
        # host-only skeleton (zeros ARE adam's fresh state); materializing
        # via optimizer.init would upload every param to the remote chip
        abstract = jax.eval_shape(self.optimizer.init, params)
        opt_state = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                 abstract)
        raw_opt = raw.get("opt_state", [])

        # Moment-harvest candidates: every dict in the raw tree that looks
        # like an Adam slot (count+mu+nu). When the optimizer CHAIN SHAPE
        # changed (plain adam <-> multi_transform, schedule slot added or
        # dropped), the positional walk below can't line the slots up, but
        # the moments still transfer wherever a candidate's mu/nu trees
        # shape-match the fresh slot — e.g. a whole-params Adam checkpoint
        # feeds both masked branches of a multi_transform resume (each
        # takes its own leaf subset; masked-out leaves are MaskedNode).
        adam_cands = []   # (path, node) pairs

        def collect_adam(node, path=()):
            if isinstance(node, dict):
                if {"count", "mu", "nu"} <= set(node):
                    adam_cands.append((path, node))
                for k, v in node.items():
                    collect_adam(v, path + (str(k),))
            elif isinstance(node, (list, tuple)):
                for i, v in enumerate(node):
                    collect_adam(v, path + (str(i),))

        collect_adam(raw_opt)

        def _path_affinity(cand_path, slot_path):
            """Length of the common suffix of two key paths — the branch
            labels ('main'/'est', masked-state indices) live near the
            leaf, so a matching suffix means the candidate came from the
            corresponding branch, not just any same-shaped one
            (round-4 ADVICE: a pure shape match can silently transfer
            the wrong branch's moments)."""
            n = 0
            for a, b in zip(reversed(cand_path), reversed(slot_path)):
                if a != b:
                    break
                n += 1
            return n

        def graft(skel, raw_node, fallback=True, path=()):
            """Recursively fill the fresh opt-state skeleton from the raw
            (untyped: namedtuple->dict, tuple->list-or-indexed-dict)
            checkpoint tree. Returns (value, ok).

            Moment-holding namedtuples (count + other fields, e.g.
            ScaleByAdamState) are ATOMIC: either every field restores or
            the whole slot stays fresh — restored mu with zero nu would
            corrupt bias correction; a failed slot then tries the
            harvested Adam candidates (shape-matched, fallback guards
            against recursive re-harvesting). Container namedtuples
            (MultiTransformState.inner_states, MaskedState.inner_state)
            are not atomic: each child grafts independently, so e.g. the
            'main' Adam moments survive an est-branch structure change.
            A count-only state (pure schedule counter) missing from the
            checkpoint is seeded from the restored step so a resumed
            cosine doesn't restart its warmup.
            """
            fields = getattr(type(skel), "_fields", None)
            if fields is not None:
                if fields == ():          # e.g. EmptyState / MaskedNode
                    return skel, True
                raw_dict = raw_node if isinstance(raw_node, dict) else {}
                if not raw_dict and fields == ("count",):
                    return skel._replace(count=np.asarray(
                        step, np.asarray(skel.count).dtype)), True
                vals, ok = {}, True
                for f in fields:
                    cur = getattr(skel, f)
                    if f == "count":
                        vals[f] = np.asarray(raw_dict.get(f, step),
                                             np.asarray(cur).dtype)
                        continue
                    vals[f], o = graft(cur, raw_dict.get(f), fallback,
                                       path + (f,))
                    ok = ok and o
                if ok:
                    return type(skel)(**vals), True
                if "count" not in fields:
                    # container namedtuple: keep the children that DID
                    # graft (they handled their own fallbacks)
                    return type(skel)(**vals), False
                if fallback and {"count", "mu", "nu"} <= set(fields):
                    # try path-corresponding candidates first (common key
                    # suffix with this slot), shape-only matches last
                    ordered = sorted(
                        adam_cands,
                        key=lambda pc: -_path_affinity(pc[0], path))
                    for cpath, cand in ordered:
                        v, ok = graft(skel, cand, fallback=False)
                        if ok:
                            print("resume graft: Adam slot "
                                  f"{'/'.join(path) or '<root>'} <- "
                                  f"checkpoint {'/'.join(cpath)} "
                                  f"(affinity {_path_affinity(cpath, path)})")
                            return v, True
                return skel, False
            if isinstance(skel, dict):
                raw_dict = raw_node if isinstance(raw_node, dict) else {}
                out, ok = {}, True
                for k, v in skel.items():
                    out[k], o = graft(v, raw_dict.get(k), fallback,
                                      path + (str(k),))
                    ok = ok and o
                return out, ok
            if isinstance(skel, (list, tuple)):
                if isinstance(raw_node, dict) and set(raw_node) == {
                        str(i) for i in range(len(skel))}:
                    raw_seq = [raw_node[str(i)] for i in range(len(skel))]
                elif isinstance(raw_node, (list, tuple)) \
                        and len(raw_node) == len(skel):
                    raw_seq = list(raw_node)
                else:
                    raw_seq = [None] * len(skel)
                out, ok = [], True
                for i, (s, r) in enumerate(zip(skel, raw_seq)):
                    g, o = graft(s, r, fallback, path + (str(i),))
                    out.append(g)
                    ok = ok and o
                return type(skel)(out), ok
            # array leaf
            if raw_node is None \
                    or tuple(np.shape(raw_node)) != tuple(np.shape(skel)):
                return skel, False
            return np.asarray(raw_node, np.asarray(skel).dtype), True

        grafted, _ = graft(opt_state, raw_opt)
        print(f"schedule-tolerant resume from {self.cfg.ckpt_dir} "
              f"at step {int(step)}")
        return {"params": params, "opt_state": grafted, "step": step}

    def save(self):
        # multi-host: the state is fully replicated across processes (DP
        # only spans hosts; TP shards stay intra-host), so process 0 writes
        # the checkpoint alone — no cross-host coordination needed
        if jax.process_count() > 1 and jax.process_index() != 0:
            return
        ckpt_lib.save(self.cfg.ckpt_dir, self.state,
                      step=int(self.state["step"]))

    # -------------------------------------------------------------- step --
    def _forward(self, params, x, training, rng):
        """Returns (x_tilde, metrics dict of scalars).

        quant="noise": the reference recipe — additive U(-1/2,1/2) noise
        stands in for rounding everywhere (conditional_entropy_model.py /
        entropy_model.py `call(training=True)`).
        quant="ste": mixed quantization — the *rate* terms still use the
        noisy relaxation, but every tensor a real decode would see (the
        hyper-decoder's input z-hat, the synthesis input y-hat) is hard-
        rounded with a straight-through gradient. At low alpha the noise
        relaxation collapses under true rounding (y shrinks inside the
        dead zone and round(y)=0 wipes the latent); STE fine-tuning
        matches train-time to decode-time exactly.
        """
        cfg = self.cfg
        mods = self.mods
        rng_z, rng_y = jax.random.split(rng)
        ste = training and cfg.quant == "ste"

        def _ste_round(v):
            return v + jax.lax.stop_gradient(jnp.round(v) - v)

        num_points = jnp.maximum(
            jnp.sum((jnp.sum(x, axis=-1) > 0).astype(jnp.float32)), 1.0)
        y = mods["analysis"].apply({"params": params["analysis"]}, x)
        if self.hyper:
            z = mods["hyper_encoder"].apply(
                {"params": params["hyper_encoder"]}, y)
            z_tilde, lik_z = self.estimator.apply(
                {"params": params["estimator"]}, z, training=training,
                rng=rng_z)
            loc, scale = mods["hyper_decoder"].apply(
                {"params": params["hyper_decoder"]},
                _ste_round(z) if ste else z_tilde)
            scale = jnp.maximum(scale, cfg.scale_lower_bound)
            y_tilde, lik_y = conditional.apply(y, loc, scale,
                                               training=training, rng=rng_y)
            bpp_y = losses.bpp_from_likelihoods(lik_y, num_points)
            bpp_z = losses.bpp_from_likelihoods(lik_z, num_points)
        else:
            y_tilde, lik_y = self.estimator.apply(
                {"params": params["estimator"]}, y, training=training,
                rng=rng_y)
            bpp_y = losses.bpp_from_likelihoods(lik_y, num_points)
            bpp_z = jnp.zeros(())
        x_tilde = mods["synthesis"].apply(
            {"params": params["synthesis"]},
            _ste_round(y) if ste else y_tilde)
        empty_l, full_l = losses.bce_losses(x_tilde, x)
        distortion = cfg.beta * empty_l + full_l
        if self.hyper:
            loss = (cfg.alpha * distortion + cfg.delta * bpp_y
                    + cfg.gamma * bpp_z)
        else:
            loss = cfg.alpha * distortion + bpp_y
        return x_tilde, {"loss": loss, "bpp_ae": bpp_y, "bpp_hyper": bpp_z,
                         "distortion": distortion}

    def _iou(self, x_tilde, x):
        """rho=1 adaptive-threshold IoU on device (reference computes this
        via a numpy round trip per step)."""
        from pcgcv1_tpu.ops.topk import topk_threshold_bitwise
        b = x.shape[0]
        flat = x_tilde.reshape(b, -1).astype(jnp.float32)
        nums = jnp.sum(x.reshape(b, -1), axis=-1).astype(jnp.int32)
        nums = jnp.clip(nums, 1, flat.shape[-1])
        thres = topk_threshold_bitwise(flat, nums)
        mask = (flat >= thres[:, None]).astype(jnp.float32)
        _, _, iou = losses.classify_metrics(
            mask, x.reshape(b, -1), 0.0)
        return iou

    def _build_step(self):
        def step_fn(state, batch, rng):
            # batches upload as uint8 occupancy (4x less host->device
            # traffic than f32, and the link compresses sparse bytes);
            # the cast to compute dtype happens on device
            batch = batch.astype(jnp.float32)

            def loss_fn(params):
                x_tilde, m = self._forward(params, batch, True, rng)
                return m["loss"], (x_tilde, m)

            grads, (x_tilde, metrics) = jax.grad(
                loss_fn, has_aux=True)(state["params"])
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            metrics["iou"] = self._iou(x_tilde, batch)
            new_state = {"params": params, "opt_state": opt_state,
                         "step": state["step"] + 1}
            return new_state, metrics

        if self.mesh is None:
            return jax.jit(step_fn, donate_argnums=0)

        from jax.sharding import NamedSharding, PartitionSpec as P
        state_sh = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P()), self.state)
        param_sh = mesh_lib.shard_params(self.state["params"], self.mesh)
        state_sh["params"] = param_sh
        batch_sh = mesh_lib.batch_sharding(self.mesh)
        self.state = jax.device_put(self.state, state_sh)
        return jax.jit(step_fn, donate_argnums=0,
                       in_shardings=(state_sh, batch_sh, None),
                       out_shardings=(state_sh, None))

    def _recover(self):
        """Failure recovery: rebuild device state after a transient runtime
        failure (relay/RPC hiccup mid-run — observed as spurious
        FAILED_PRECONDITION/UNAVAILABLE XlaRuntimeErrors on this tunnel).

        The step function donates its input state, so after a failed
        dispatch the live buffers are unusable; recovery restores the
        newest checkpoint (falling back to the initial-state snapshot if
        none has landed yet), re-applies the training shardings, and
        resets the host step mirror. At most ``save_every`` steps of
        progress are lost. The eval/bench harnesses already self-retry;
        this closes the same gap for multi-hour training runs.
        """
        restored = ckpt_lib.restore(self.cfg.ckpt_dir,
                                    like=self._init_snapshot)
        if restored is None:
            restored = self._init_snapshot
        self.state = jax.tree.map(jnp.asarray, restored)
        self._step_fn = self._build_step()
        self._host_step = int(self.state["step"])

    def train_step(self, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 1),
                                 self._host_step)
        if self.mesh is not None and jax.process_count() > 1:
            # multi-host (jax.distributed): each process feeds its LOCAL
            # batch shard; the global [B,...] array is assembled across
            # hosts, and XLA's collectives (over DCN/ICI) average the
            # gradients — no reference equivalent (single-GPU eager).
            batch = jax.make_array_from_process_local_data(
                mesh_lib.batch_sharding(self.mesh), np.asarray(batch))
        elif self.mesh is not None:
            batch = jax.device_put(jnp.asarray(batch),
                                   mesh_lib.batch_sharding(self.mesh))
        else:
            batch = jnp.asarray(batch)  # uint8; cast happens in-jit
        self.state, metrics = self._step_fn(self.state, batch, rng)
        self._host_step += 1
        return metrics

    # -------------------------------------------------------------- eval --
    def eval_step(self, batch):
        if not hasattr(self, "_eval_fn"):
            def eval_fn(params, x, rng):
                x = x.astype(jnp.float32)
                x_tilde, m = self._forward(params, x, False, rng)
                m["iou"] = self._iou(x_tilde, x)
                return m
            self._eval_fn = jax.jit(eval_fn)
        rng = jax.random.PRNGKey(0)
        return self._eval_fn(self.state["params"],
                             jnp.asarray(batch), rng)

    # --------------------------------------------------------------- fit --
    def fit(self, batches, num_iterations=None, log_fn=print,
            eval_batches_fn=None):
        """Run the training loop over an iterator of [B,cs,cs,cs,1] batches.

        Transient runtime failures are survived by restoring the newest
        checkpoint and continuing (see ``_recover``); anything else — or
        more than ``cfg.max_failures`` recoveries — re-raises. Returns the
        final step count.
        """
        cfg = self.cfg
        n = num_iterations or cfg.num_iterations
        accum = []
        t0 = time.time()
        failures = 0
        from pcgcv1_tpu.training.data import prefetch
        for batch in prefetch(batches):
            if self._host_step >= n:
                break
            try:
                metrics = self.train_step(batch)
                accum.append(metrics)
                step = self._host_step
                if step % cfg.log_every == 0:
                    avg = {k: float(np.mean([float(m[k]) for m in accum]))
                           for k in accum[0]}
                    avg.update(step=step,
                               sps=len(accum) / (time.time() - t0))
                    log_fn(avg)
                    accum, t0 = [], time.time()
                if step % cfg.save_every == 0:
                    if eval_batches_fn is not None:
                        stats = [self.eval_step(b)
                                 for b in eval_batches_fn()]
                        log_fn({("eval_" + k): float(np.mean(
                            [float(s[k]) for s in stats]))
                            for k in stats[0]} | {"step": step})
                    self.save()
            except Exception as e:  # noqa: BLE001 — filtered below
                if not _is_transient(e) or failures >= cfg.max_failures:
                    raise
                failures += 1
                log_fn({"step": self._host_step, "failures": failures,
                        "recovering_from": repr(e)[:300]})
                time.sleep(min(30.0, 2.0 ** failures))
                self._recover()
                accum, t0 = [], time.time()
        return int(self.state["step"])


# Runtime-failure signatures that warrant checkpoint-restore-and-continue
# live in utils/transient.py (shared with the eval sweep and bench).
from pcgcv1_tpu.utils.transient import is_transient as _is_transient  # noqa: E402
