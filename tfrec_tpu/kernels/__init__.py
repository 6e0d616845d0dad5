"""TPU kernels: fused Pallas implementations with jnp/XLA reference paths.

Every kernel ships two selectable backends (`backend="pallas" | "xla"`,
TrainConfig.kernels): the Pallas path is the fused TPU-native one; the XLA
path is the always-available reference the tests pin equivalence against
(SURVEY.md §7 step 7).
"""

from tfrec_tpu.kernels.cross import cross_stack  # noqa: F401
