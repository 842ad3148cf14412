"""Variational-inference utilities: per-datapoint Gaussian posteriors,
likelihood/KL primitives, prediction ensembles and analysis metrics."""

from . import variational
from .analysis import Analysis, DataPair
from .prediction import PredictionEnsemble
from .likelihoods import (LOG_2PI, reparametrize,
                          diagonal_gaussian_log_likelihood,
                          unit_gaussian_kld, bernoulli_log_likelihood,
                          relative_error, relative_error_batched,
                          coefficient_of_determination, predictive_logscore)

__all__ = [
    "variational", "LOG_2PI", "reparametrize",
    "diagonal_gaussian_log_likelihood", "unit_gaussian_kld",
    "bernoulli_log_likelihood", "relative_error", "relative_error_batched",
    "coefficient_of_determination", "predictive_logscore",
    "Analysis", "DataPair", "PredictionEnsemble",
]
