"""Flax model components: DenseNet codec, encoders/decoders, effective-
property map, the differentiable ROM operator and the generative model."""

from .codec import (DenseLayer, DenseBlock, TransitionDown, TransitionUp,
                    LastDecoding, DenseED, upsample_nearest_2x)
from .encoder import CNNEncoder, LinearEncoder, NeuralNetworkEncoder, SplitHeads
from .decoder import CNNDecoder, LinearDecoder, NeuralNetworkDecoder
from .components import (EffectivePropertyMap, ROM, ReducedOrderModelOperator,
                         propagate_gp_samples)
from .generative import GenerativeModel, DiscriminativeModel
from .mlp import FeedforwardNeuralNetwork, architecture_from_linear_decay
from .calibration import optimize_effective_properties, reduced_order_model_solve

__all__ = [
    "DenseLayer", "DenseBlock", "TransitionDown", "TransitionUp",
    "LastDecoding", "DenseED", "upsample_nearest_2x",
    "CNNEncoder", "LinearEncoder", "NeuralNetworkEncoder", "SplitHeads",
    "CNNDecoder", "LinearDecoder", "NeuralNetworkDecoder",
    "EffectivePropertyMap", "ROM", "ReducedOrderModelOperator",
    "propagate_gp_samples", "GenerativeModel", "DiscriminativeModel",
    "FeedforwardNeuralNetwork", "architecture_from_linear_decay",
    "optimize_effective_properties", "reduced_order_model_solve",
]
