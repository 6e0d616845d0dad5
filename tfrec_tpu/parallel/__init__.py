"""Multi-device execution: mesh construction, sharded embedding subsystem
(all-to-all ID exchange + gradient combine), sharded top-k retrieval, and
the pjit train step (SURVEY.md §2b/§2c, BASELINE.json R3/R7/R8)."""

from tfrec_tpu.parallel.mesh import make_mesh  # noqa: F401
