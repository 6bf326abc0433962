"""Model registry: name -> transform family.

Replaces the reference's dotted-import model selection
(`importlib.import_module(args.modelname)`, `test.py:72`) with an explicit
registry; reference names are accepted as aliases.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from pcgcv1_tpu.models import simple, voxception


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    analysis: Callable[..., Any]
    synthesis: Callable[..., Any]
    hyper_encoder: Optional[Callable[..., Any]]
    hyper_decoder: Optional[Callable[..., Any]]
    latent_channels: int
    hyper_channels: Optional[int]
    down_factor: int  # spatial downsampling of the analysis transform
    # (analysis's latent-producing layer, synthesis's latent-consuming
    # layer): both linear in the latent, so scaling one by g and the other
    # by 1/g is an exact reparameterization (training latent_gain knob)
    latent_io: tuple = ("conv_out", "deconv_in")

    def make(self, dtype=jnp.float32, hyper=False, remat=False,
             deconv="xla"):
        """Instantiate flax modules; returns dict of modules.

        remat=True rematerializes block activations in the backward pass
        (training-memory knob; families without remat support ignore it).
        deconv selects the upsampling lowering ("xla" | "poly", see
        models/subpixel.py) for families that support it; the parameter
        tree is identical either way.
        """
        kw = {}
        if remat and "remat" in self.analysis.__dataclass_fields__:
            kw["remat"] = True
        skw = dict(kw)
        if deconv != "xla" and \
                "deconv" in self.synthesis.__dataclass_fields__:
            skw["deconv"] = deconv
        mods = {
            "analysis": self.analysis(dtype=dtype, **kw),
            "synthesis": self.synthesis(dtype=dtype, **skw),
        }
        if hyper:
            if self.hyper_encoder is None:
                raise ValueError(
                    f"model family '{self.name}' has no hyperprior")
            mods["hyper_encoder"] = self.hyper_encoder(dtype=dtype)
            mods["hyper_decoder"] = self.hyper_decoder()
        return mods


_REGISTRY = {
    "voxception": ModelFamily(
        name="voxception",
        analysis=voxception.AnalysisTransform,
        synthesis=voxception.SynthesisTransform,
        hyper_encoder=voxception.HyperEncoder,
        hyper_decoder=voxception.HyperDecoder,
        latent_channels=16,
        hyper_channels=8,
        down_factor=4,
    ),
    "simple": ModelFamily(
        name="simple",
        analysis=simple.AnalysisTransform,
        synthesis=simple.SynthesisTransform,
        hyper_encoder=None,
        hyper_decoder=None,
        latent_channels=32,
        hyper_channels=None,
        down_factor=8,
        latent_io=("conv_3", "deconv_1"),
    ),
}

# reference CLI aliases (test.py --modelname)
_ALIASES = {
    "models.model_voxception": "voxception",
    "models.model_simple": "simple",
}


def get_model(name: str) -> ModelFamily:
    name = _ALIASES.get(name, name)
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]
