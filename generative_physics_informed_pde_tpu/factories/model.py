"""Named experiment presets wiring physics + networks into models.

TPU-native re-implementation of ``ModelFactory`` and its presets
(reference: factories/model.py:38-257).  Identifier->class reflection,
``set`` overrides and the two shipped presets ('highres', 'highres32')
keep the reference semantics; the FEniCS mesh/physics construction is the
closed-form fem layer, and dtype/device resolution becomes a jnp dtype
(device placement is XLA's job).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.physics import make_fom_rom_pair
from ..models.components import EffectivePropertyMap, ReducedOrderModelOperator
from ..models.decoder import CNNDecoder
from ..models.encoder import CNNEncoder
from ..models.generative import DiscriminativeModel, GenerativeModel


def fetch_dtype(dtype: str):
    """Resolve a dtype string (reference: factories/model.py:12-35; the
    'device' half is obsolete on TPU -- jax places arrays on the default
    device).  'bfloat16' is TPU-native and new here."""
    d = dtype.lower()
    if d == "float32":
        return jnp.float32
    if d in ("float64", "double"):
        return jnp.float64
    if d in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"dtype option not recognized: {dtype}")


class ModelFactory:
    """Base factory (reference: factories/model.py:38-170)."""

    def __init__(self, **kwargs):
        self.params = {
            "independent_X": True,
            "ptype": None,
            "dim_latent": None,
            "binary_field": False,
            "dtype": None,
            "nx_rom": None,
            "ny_rom": None,
            "eff_property_map_hidden_layers": None,
            "num_refines": None,
            "droprate": 0.0,
            "homoscedastic": False,
            "use_encoder": True,
            # conv compute dtype for the DenseNet codec (None = full
            # precision, 'bfloat16' = mixed precision); params and
            # BatchNorm stats stay f32 either way.
            "compute_dtype": None,
            # fuse the per-modality decoder applies into one batched
            # decode per ELBO evaluation (see GenerativeModel.fuse_decodes)
            "fuse_decodes": False,
            # rematerialize codec activations in the backward pass
            # (see GenerativeModel.remat_codec)
            "remat_codec": False,
            # reduced-precision conv compute for the UNSUPERVISED ELBO
            # term only (see GenerativeModel.unsup_compute_dtype).
            # 'auto' (default) resolves to bf16 when the decode grid is
            # >= 128^2 -- measured 1.09x full step at 128^2, -3% at 64^2
            # (PARITY round 5); quality: 1500-step monitor series +
            # endpoint metrics match f32 to ~1e-7, and the 2he
            # converged-endpoint run confirms no regression.
            "unsup_compute_dtype": "auto",
            # pad codec conv input channels to this multiple
            # (math-preserving; see models.codec.pad_channels) -- the
            # decode-architecture A/B lever, 0 disables
            "codec_pad_cin": 0,
            # decoder-architecture overrides for equal-parameter
            # wider-growth experiments (None = preset default)
            "dec_growth_rate": None,
            "dec_init_features": None,
            "dec_blocks": None,
        }
        self._identifier = None
        self._custom_params_set_flag = False

    def _dec(self, key, default):
        """Decode-architecture override, None = preset default.  An
        explicit None-check (NOT ``or``): falsy-but-set overrides like 0
        or () must reach the constructor and fail loudly there, not be
        silently replaced by the preset value mid-sweep."""
        v = self.params[key]
        return default if v is None else v

    def _compute_dtype(self):
        cd = self.params.get("compute_dtype")
        return None if cd is None else fetch_dtype(cd)

    @classmethod
    def FromIdentifier(cls, identifier: str, *args, **kwargs) -> "ModelFactory":
        """Identifier -> preset class reflection (reference:
        factories/model.py:73-78)."""
        try:
            factory_class = _REGISTRY[identifier]
        except KeyError:
            raise KeyError(f"unknown model factory identifier {identifier!r}")
        return factory_class(*args, **kwargs)

    from_identifier = FromIdentifier

    @property
    def identifier(self) -> str:
        return self._identifier or type(self).__name__

    @property
    def dtype(self):
        return fetch_dtype(self.params["dtype"])

    def set(self, *args):
        """Single-key or dict override (reference: factories/model.py:86-104)."""
        if len(args) == 1 and isinstance(args[0], dict):
            for key, val in args[0].items():
                if key not in self.params:
                    raise KeyError(key)
                self.params[key] = val
            self._custom_params_set_flag = True
        elif len(args) == 2 and isinstance(args[0], str):
            if args[0] not in self.params:
                raise KeyError(args[0])
            self.params[args[0]] = args[1]
        else:
            raise ValueError

    # ------------------------------------------------------------- setup
    def _gp(self, key):
        value = self.params[key]
        if value is None:
            raise ValueError(f"parameter {key} is unset")
        return value

    def _setup_physics(self):
        """Build fom/rom physics + W (reference: factories/model.py:106-142)."""
        if not self._custom_params_set_flag:
            raise RuntimeError("preset must configure params first")
        return make_fom_rom_pair(self._gp("ptype"), self._gp("nx_rom"),
                                 self._gp("ny_rom"), self._gp("num_refines"))

    def _closure(self, physics, encoder, decoder):
        """Wire decoder/encoder/g/gp into the generative model + extract the
        discriminative twin (reference: factories/model.py:145-163)."""
        g = ReducedOrderModelOperator.from_physics(physics)
        gp = EffectivePropertyMap(
            latent_dim=decoder.dim_latent,
            dim_effective_property=g.dim_effective_property,
            num_hidden_layers=self._gp("eff_property_map_hidden_layers"),
            independent_X=self.params["independent_X"])
        ucd = self.params["unsup_compute_dtype"]
        if ucd == "auto":
            # same measured boundary as PE_compute_dtype='auto'
            # (trainer.resolve_pe_compute_dtype): >= 128^2 decodes are
            # HBM-bound and bf16 wins; below, the step is op-count-bound
            # and the casts only cost
            ucd = "bfloat16" if decoder.target_img_size >= 128 else None
        model = GenerativeModel(
            f=decoder, g=g, gp=gp, encoder=encoder,
            independent_X=self.params["independent_X"],
            binary_field=self.params["binary_field"],
            fuse_decodes=self.params["fuse_decodes"],
            remat_codec=self.params["remat_codec"],
            unsup_compute_dtype=None if ucd is None else fetch_dtype(ucd),
            dtype=self.dtype)
        discriminative = DiscriminativeModel(model)
        return physics, model, discriminative, encoder, self.dtype

    def setup(self):
        raise NotImplementedError

    @property
    def physics(self):
        return self.setup()[0]


class highres(ModelFactory):
    """64x64 FOM / 8x8 ROM on 'ND' (reference: factories/model.py:172-213)."""

    def __init__(self, **kwargs):
        super().__init__()
        self.params.update(
            ptype="ND", dim_latent=64, binary_field=False, dtype="float32",
            nx_rom=8, ny_rom=8, eff_property_map_hidden_layers=0,
            num_refines=3, droprate=0.2)
        self._identifier = "highres"
        self._custom_params_set_flag = True
        self.set(kwargs)

    def setup(self):
        physics = self._setup_physics()
        target = self._gp("nx_rom") * 2 ** self._gp("num_refines")
        decoder = CNNDecoder(
            target_img_size=target, dim_latent=self._gp("dim_latent"),
            latent_img_size=8, latent_img_features=1,
            init_features=self._dec("dec_init_features", 6),
            blocks=tuple(self._dec("dec_blocks", (1, 2, 1))),
            growth_rate=self._dec("dec_growth_rate", 4),
            drop_rate=self.params["droprate"],
            upsample="nearest", binary=self.params["binary_field"],
            homoscedastic=self.params["homoscedastic"],
            pad_cin=self.params["codec_pad_cin"],
            compute_dtype=self._compute_dtype())
        encoder = CNNEncoder(
            imsize=target, latent_dim=self._gp("dim_latent"), blocks=(1, 2, 1),
            growth_rate=4, init_features=6, drop_rate=self.params["droprate"],
            pad_cin=self.params["codec_pad_cin"],
            compute_dtype=self._compute_dtype())
        if not self.params["use_encoder"]:
            encoder = None
        return self._closure(physics, encoder, decoder)


class highres32(ModelFactory):
    """32x32 FOM / 4x4 ROM on 'NDP' -- the example-notebook recipe
    (reference: factories/model.py:215-257)."""

    def __init__(self, **kwargs):
        super().__init__()
        self.params.update(
            ptype="NDP", dim_latent=16, binary_field=False, dtype="float32",
            nx_rom=4, ny_rom=4, eff_property_map_hidden_layers=0,
            num_refines=3, droprate=0.0, homoscedastic=False)
        self._identifier = "highres32"
        self._custom_params_set_flag = True
        self.set(kwargs)

    def setup(self):
        physics = self._setup_physics()
        target = self._gp("nx_rom") * 2 ** self._gp("num_refines")
        decoder = CNNDecoder(
            target_img_size=target, dim_latent=self._gp("dim_latent"),
            latent_img_size=8, latent_img_features=1,
            init_features=self._dec("dec_init_features", 4),
            blocks=tuple(self._dec("dec_blocks", (1, 1))),
            growth_rate=self._dec("dec_growth_rate", 4),
            drop_rate=self.params["droprate"],
            upsample="nearest", binary=self.params["binary_field"],
            homoscedastic=self.params["homoscedastic"],
            pad_cin=self.params["codec_pad_cin"],
            compute_dtype=self._compute_dtype())
        encoder = CNNEncoder(
            imsize=target, latent_dim=self._gp("dim_latent"), blocks=(1, 1),
            growth_rate=4, init_features=4, drop_rate=self.params["droprate"],
            pad_cin=self.params["codec_pad_cin"],
            compute_dtype=self._compute_dtype())
        if not self.params["use_encoder"]:
            encoder = None
        return self._closure(physics, encoder, decoder)


class highres128(ModelFactory):
    """128x128 FOM / 8x8 ROM on 'NDP' -- a TPU-scale preset beyond the
    reference (BASELINE.json config 3)."""

    def __init__(self, **kwargs):
        super().__init__()
        self.params.update(
            ptype="NDP", dim_latent=64, binary_field=False, dtype="float32",
            nx_rom=8, ny_rom=8, eff_property_map_hidden_layers=0,
            num_refines=4, droprate=0.0, homoscedastic=False)
        self._identifier = "highres128"
        self._custom_params_set_flag = True
        self.set(kwargs)

    def setup(self):
        import math

        physics = self._setup_physics()
        target = self._gp("nx_rom") * 2 ** self._gp("num_refines")
        # decoder up-sampling count adapts to the target resolution
        # (128 -> 4 blocks, 256 -> 5, ...)
        n_up = int(math.log2(target // 8))
        dec_blocks = self._dec("dec_blocks",
                               tuple(([1, 2, 1, 1, 1, 1])[:n_up]))
        if len(dec_blocks) != n_up:
            raise ValueError(f"dec_blocks {dec_blocks} must have {n_up} "
                             f"entries for target {target}")
        decoder = CNNDecoder(
            target_img_size=target, dim_latent=self._gp("dim_latent"),
            latent_img_size=8, latent_img_features=2,
            init_features=self._dec("dec_init_features", 16),
            blocks=tuple(dec_blocks),
            growth_rate=self._dec("dec_growth_rate", 8),
            drop_rate=self.params["droprate"], upsample="nearest",
            binary=self.params["binary_field"],
            homoscedastic=self.params["homoscedastic"],
            pad_cin=self.params["codec_pad_cin"],
            compute_dtype=self._compute_dtype())
        enc_blocks = tuple([1, 2, 1, 1, 1][: max(2, n_up - 1)])
        encoder = CNNEncoder(
            imsize=target, latent_dim=self._gp("dim_latent"),
            blocks=enc_blocks, growth_rate=8, init_features=16,
            drop_rate=self.params["droprate"],
            pad_cin=self.params["codec_pad_cin"],
            compute_dtype=self._compute_dtype())
        if not self.params["use_encoder"]:
            encoder = None
        return self._closure(physics, encoder, decoder)


_REGISTRY = {"highres": highres, "highres32": highres32,
             "highres128": highres128}
