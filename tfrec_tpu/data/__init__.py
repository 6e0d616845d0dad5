"""Data pipeline: dataset containers, loaders, splitters, and samplers."""

from tfrec_tpu.data.dataset import Dataset, Interactions, build_dataset
from tfrec_tpu.data.samplers import PairwiseSampler, PointwiseSampler, CTRBatcher

__all__ = [
    "Dataset",
    "Interactions",
    "build_dataset",
    "PairwiseSampler",
    "PointwiseSampler",
    "CTRBatcher",
]
