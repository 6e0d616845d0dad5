"""Core numeric ops: embedding tables, dedup/segment combine, sparse optimizers."""

from tfrec_tpu.ops.embedding import TableSpec, init_tables, gather  # noqa: F401
from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer  # noqa: F401
