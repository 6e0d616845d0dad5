"""tfrec_tpu — a TPU-native recommender-systems framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
wenzhaooooo/TFRec (reference mount was empty at survey time; the binding
contract is /root/repo/BASELINE.json — see SURVEY.md §0):

- Model zoo: MF/BPR retrieval, FM, GMF/MLP/NeuMF, DCN feature-interaction
  ranking (BASELINE.json configs 1-5).
- Row/column-sharded embedding tables over a multi-host TPU mesh with
  all-to-all ID exchange and gradient combine (BASELINE.json north_star R3).
- Rowwise Adagrad/Adam sparse-optimizer path (R6).
- Negative-sampling (BPR) and pointwise-logloss (CTR) training loops (R5).
- Fused Pallas gather/scatter and feature-cross kernels (R4).
- Distributed top-k candidate-retrieval scorer; recall@k/NDCG/AUC eval (R7),
  with a native C++ threaded evaluator mirroring the reference's only
  native component (SURVEY.md §2a "eval-native").
"""

__version__ = "0.1.0"

from tfrec_tpu import configs  # noqa: F401

__all__ = ["configs", "__version__"]


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax at package import).
    if name == "Recommender":
        from tfrec_tpu.serve import Recommender

        return Recommender
    if name == "run":
        from tfrec_tpu.train.trainer import run

        return run
    if name == "ZOO":
        from tfrec_tpu.zoo_configs import ZOO

        return ZOO
    raise AttributeError(name)
