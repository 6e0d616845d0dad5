"""Typed configuration system.

The reference family uses stringly-typed ``.properties`` files parsed with
configparser (SURVEY.md §1a, unverifiable — empty reference mount). Here
every run is described by frozen dataclasses; the five milestone configs of
BASELINE.json:7-11 ship as constructor functions in ``tfrec_tpu.zoo_configs``
and CLI flags override individual fields.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Where the examples come from and how they are split."""

    # One of: "movielens" (UIRT rating file), "criteo" (TSV), "synthetic_implicit",
    # "synthetic_ctr".
    source: str = "synthetic_implicit"
    path: str | None = None
    # Splitter: "ratio" (random holdout by fraction), "leave_one_out"
    # (most-recent interaction per user held out), or "given" (pre-split
    # train at `path` + test at `test_path` — TFRec-family conventions).
    splitter: str = "ratio"
    test_path: str | None = None
    test_fraction: float = 0.2
    min_interactions: int = 1
    # Implicit-feedback threshold: ratings >= this count as positives.
    binarize_threshold: float = 0.0
    seed: int = 0
    # Synthetic-generator knobs (ignored for on-disk sources).
    num_users: int = 512
    num_items: int = 1024
    interactions_per_user: int = 32
    latent_rank: int = 8
    # CTR-generator knobs.
    num_examples: int = 100_000
    num_dense_features: int = 13
    categorical_vocab_sizes: Sequence[int] = (1000, 1000, 500, 500, 100, 100)
    # Multi-hot bag width per field (empty = all single-hot). A width-W
    # field occupies W columns of the cat matrix, sentinel-padded.
    categorical_field_widths: Sequence[int] = ()
    # Criteo: stream the TSV instead of materializing (1TB-scale files).
    # The first eval_examples lines become the held-out eval slice.
    streaming: bool = False
    eval_examples: int = 100_000
    # Side features for interaction data used by CTR models (config 2's
    # multi-field FM): ml-1m users.dat / movies.dat paths, or synthetic
    # stand-ins (gender/age/occupation + genre) when True.
    user_features_path: str | None = None
    item_features_path: str | None = None
    synthetic_side_features: bool = False
    # Social graph (the SBPR family). "social_path": whitespace "u v"
    # edge file over DENSE user ids (symmetrized on load). "social_degree"
    # > 0 synthesizes that many friends per user by train-set taste
    # overlap — built from the TRAIN split only, so no test leakage.
    social_path: str | None = None
    social_degree: int = 0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Which model and its hyperparameters."""

    name: str = "mf"  # pop | mf | wrmf | ease | sbpr | apr | irgan | fm | gmf | mlp | neumf | convncf | lightgcn | ngcf | dcn | dcnv2 | deepfm | nfm | widedeep | dlrm | fism | nais | multvae | multdae | cdae | sasrec | gru4rec | caser | fpmc
    embed_dim: int = 64
    # Per-field embedding dims for CTR models (empty = embed_dim for all).
    # Mixed dims (small vocab -> small dim, the production memory/ICI
    # saver — docs/PERF.md scaling model) work with concat-based towers
    # (dcn/dcnv2/widedeep); stacked/paired interactions (fm/deepfm/dlrm)
    # require equal dims.
    field_dims: Sequence[int] = ()
    # Dense-tower widths (MLP/NeuMF deep tower, DCN deep tower).
    mlp_dims: Sequence[int] = (256, 128, 64)
    # DCN: number of cross layers.
    num_cross_layers: int = 3
    # DCNv2: low-rank dimension for cross layers (0 = full rank).
    cross_rank: int = 0
    # NeuMF: separate GMF/MLP embedding dims.
    gmf_dim: int = 32
    mlp_embed_dim: int = 32
    dropout: float = 0.0
    l2_reg: float = 0.0
    # CTR models: fuse all per-field tables into ONE [sum(V_f), D] table —
    # 1 gather + 1 sparse update (+ 1 all-to-all set on a mesh) instead of
    # F of each (production DLRM "table batching"). Requires equal field
    # dims; math-equivalent to per-field tables (rowwise optimizers are
    # row-local; id spaces disjoint after offsetting).
    stack_tables: bool = False
    # CTR models with embed_dim < 128: pack 128/d fields side by side in
    # each physical table's dead lanes (TPU pads the minor dim to 128
    # lanes, so a d=32 table's optimizer sweep pays for 128 — measured
    # dim-independent, docs/PERF.md). Divides swept-table count and table
    # HBM by 128/d; per-group optimizer state keeps the math exactly the
    # per-table rule (rowwise_adagrad/sgd only). Mutually exclusive with
    # stack_tables. Default None = AUTO: packing turns on whenever it
    # applies (CTR model, >=2 equal-dim fields, d < 128 dividing 128,
    # sparse optimizer not rowwise_adam) — measured 1.33x on the
    # flagship d=32 step (docs/PERF.md "Lane-packed tables"). Set False
    # to force per-field tables (e.g. to load a pre-packing checkpoint).
    lane_pack: bool | None = None
    # History-conditioned models (fism / multvae): max train-history ids
    # carried per batch row (sentinel-padded; seeded subsample beyond it).
    max_history: int = 50
    # FISM: history-count normalization exponent n^alpha.
    fism_alpha: float = 0.5
    # MultVAE: encoder hidden width (the enc1 embedding-bag table dim),
    # latent dim, fixed KL weight (Mult-VAE^PR without annealing).
    # vae_hidden doubles as CDAE's hidden width; CDAE's input corruption
    # level is `dropout`.
    vae_hidden: int = 256
    vae_latent: int = 64
    vae_beta: float = 0.2
    # NAIS: attention MLP width and the softmax-smoothing exponent beta.
    nais_attention_dim: int = 16
    nais_beta: float = 0.5
    # SASRec: transformer depth/heads over the ordered history
    # (sequence length = max_history; embed_dim is the model width).
    sasrec_blocks: int = 2
    sasrec_heads: int = 1
    # LightGCN: propagation depth over the user-item bipartite graph.
    lightgcn_layers: int = 3
    # ConvNCF: feature maps per conv layer (depth = log2(embed_dim)).
    convncf_channels: int = 32
    # APR: adversarial perturbation radius and loss weight.
    apr_eps: float = 0.5
    apr_lambda: float = 1.0
    # IRGAN: generator sampling temperature over the negative pool
    # (pool size = train.num_negatives).
    irgan_temperature: float = 1.0
    # WRMF: implicit-feedback confidence weight (c = 1 + alpha on
    # observed pairs) and the ALS ridge regularizer.
    wrmf_alpha: float = 10.0
    wrmf_reg: float = 0.05
    # EASE: ridge regularizer of the closed-form item-item solve.
    ease_reg: float = 100.0
    # GRU4Rec: recurrent width (0 = embed_dim) and stack depth.
    gru_hidden: int = 0
    gru_layers: int = 1
    # Caser: horizontal filters (count per height, window heights) and
    # vertical (per-dim trailing-window) filter count.
    caser_h_filters: int = 16
    caser_heights: tuple[int, ...] = (2, 3, 4)
    caser_v_filters: int = 4


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer for dense params and the sparse rowwise path for tables."""

    dense_optimizer: str = "adam"  # adam | adagrad | sgd
    sparse_optimizer: str = "rowwise_adagrad"  # rowwise_adagrad | rowwise_adam | sgd
    learning_rate: float = 1e-2
    sparse_learning_rate: float | None = None  # default: learning_rate
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    eps: float = 1e-8
    adagrad_init: float = 0.0
    weight_decay: float = 0.0
    # LR schedule (applies to BOTH dense and sparse paths):
    # "constant" | "cosine" (decay to end_lr_factor*lr over decay_steps)
    # | "linear" (same, linearly); warmup_steps of linear warmup first.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 0
    end_lr_factor: float = 0.1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data × table axes (SURVEY.md §2b)."""

    data_axis_size: int = -1  # -1: infer (all devices / table_axis_size); 0: force single-device path (no mesh)
    table_axis_size: int = 1
    # Embedding-table sharding: "row" (explicit all-to-all path) | "col"
    # (feature-dim over the table axis) | "gspmd" (row layout, XLA-
    # partitioner-generated collectives — the A/B reference) | "replicated".
    table_sharding: str = "row"
    # Static per-destination capacity multiplier for the all-to-all ID
    # exchange (cap = (mean + 4*sqrt(mean) + 8) * factor/2 unique ids per
    # destination — parallel/embedding.capacity_for). Overflowing ids are
    # dropped FOR THAT STEP and counted in the lookup_overflow metric —
    # loud, never silent.
    a2a_capacity_factor: float = 2.0
    # Wire dtype for the activation/gradient all-to-alls: "bfloat16" halves
    # ICI volume (the multi-chip bottleneck — docs/PERF.md scaling model);
    # tables and optimizer math stay f32. Default flipped to bfloat16 on
    # measurement (round 4): the full config-5 quality band under bf16 wire
    # is statistically identical to the f32 control — AUC 0.84563±0.00114
    # vs 0.84562±0.00115, per-seed deltas <= 5e-5 (QUALITY_BANDS.json
    # dcn_multihost_cpu8mesh[_bf16wire]; decision in docs/PERF.md). Set
    # "float32" for bitwise layout-equivalence debugging.
    a2a_dtype: str = "bfloat16"
    # Run ALL row-sharded tables' a2a exchanges inside ONE shard_map
    # region per step side (lookup / grad-combine) instead of one region
    # per table. The round-4 on-chip breakdown attributed the mesh step's
    # ~2x overhead vs single-device to the 26+26 per-table regions
    # themselves, not the work inside (docs/PERF.md "Round-4 on-chip
    # results"); the per-table math is identical (same local_* bodies).
    # Default decided by measurement — see the A/B record there.
    fused_tables: bool = False
    # Reuse the lookup's dedup/bucket route (inv, send plan, received id
    # requests) in the SAME step's gradient-combine half instead of
    # re-deriving it — XLA does not CSE the argsort/bucket chains across
    # the two shard_map regions (docs/PERF.md "Untaken levers", VERDICT r4
    # item 1). Bit-identical math (the skipped computation is a pure
    # function of the same ids; equivalence pinned in
    # tests/test_parallel.py). Default decided by the round-5 on-chip A/B.
    route_reuse: bool = True
    # Receive-side duplicate combine in the row-sharded gradient update:
    # "sort" (default — the optimizer's general stable argsort of the
    # [N*C] received rows) or "merge" (bitonic N-way merge exploiting
    # that the N per-source blocks arrive already sorted —
    # ops/embedding.merge_argsort_runs; bit-identical results, VERDICT r4
    # item 3). Unpacked row tables only (the lane-sliced grouped path
    # keeps its combine inside sparse_opt.apply). Default decided by the
    # round-5 on-chip A/B.
    recv_combine: str = "sort"
    # Row-sharded tables: assign logical row i to physical row
    # (i % N) * rows_per_shard + i // N — round-robin over shards — so a
    # FREQUENCY-SORTED vocab's hot head spreads evenly instead of landing
    # on shard 0 (contiguous-block routing's adversarial case: measured
    # 1-11% of unique sends dropped at zipf a=1.05-1.2 under the default
    # capacity — tests/test_parallel.py skew tests, docs/PERF.md). The
    # permutation is a stored bijection applied inside the sharded
    # lookup/update; eval sees the LOGICAL table (unpadded_tables
    # de-permutes). Opt-in: it changes the physical checkpoint layout
    # (recorded with the run config), and retrieval models that score the
    # live sharded item table are refused (their top-k would return
    # physical rows). CTR workloads with frequency-sorted vocabs should
    # turn this on.
    row_permute: bool = False
    # Dense-tower parameter placement: "replicated" (default — rec dense
    # towers are tiny, SURVEY.md §2b row 6) or "fsdp" (each dense param /
    # optimizer leaf sharded over 'data' on its first divisible dim; XLA
    # inserts the all-gather-for-use / reduce-scatter-for-grad pair).
    # Math-identical to replicated; a memory knob for big dense towers.
    dense_sharding: str = "replicated"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop shape."""

    batch_size: int = 1024  # global batch
    epochs: int = 10
    steps_per_epoch: int = -1  # -1: full pass
    # K optimizer steps per host dispatch (lax.scan on device) — amortizes
    # host->device dispatch latency; metrics/logging granularity becomes K.
    steps_per_dispatch: int = 1
    # Compute the sparse path's duplicate-id sorts on the HOST (stable
    # numpy argsort per table in the prefetch pipeline, overlapping
    # device compute) so the device step skips its per-table argsort —
    # the most expensive sparse-path op (docs/PERF.md). Bit-identical to
    # the device sorts. CTR models on the single-device path only (the
    # mesh path re-buckets ids inside its all-to-all; host orders would
    # be stale); ignored elsewhere.
    host_dedup: bool = False
    eval_every_epochs: int = 1
    # BPR-style pairwise sampling: negatives drawn per positive, resampled
    # each epoch (TFRec-family convention, SURVEY.md §3a).
    num_negatives: int = 1
    # Negative-proposal distribution for the host samplers:
    # "uniform" (default) or "popularity" (item drawn ∝ train-count^beta,
    # the word2vec exponent — harder negatives for head-heavy catalogs).
    # Train-positive rejection applies to both.
    neg_sampling: str = "uniform"
    neg_sampling_beta: float = 0.75
    # Draw negatives ON DEVICE inside the jitted step (uniform over the
    # catalog, no train-positive exclusion — the standard large-catalog
    # approximation; false-negative rate ~ interactions/user / num_items).
    # Removes host-side sampling from the input pipeline entirely.
    # Incompatible with neg_sampling="popularity" (device draws are
    # uniform by construction) — the trainer refuses the combination.
    device_negatives: bool = False
    loss: str = "bpr"  # bpr | hinge | logloss | mse | sampled_softmax | in_batch_softmax
    seed: int = 42
    eval_topk: Sequence[int] = (10, 20, 50)
    eval_user_batch: int = 256
    # Ranking-eval protocol: "full" (full-catalog, stable bands — default)
    # or "sampled" (positive vs eval_num_candidates sampled negatives,
    # HR@k/NDCG@k — the NCF leave-one-out paper protocol).
    eval_protocol: str = "full"
    eval_num_candidates: int = 100
    # CTR eval row cap: AUC/logloss are computed on at most this many
    # holdout rows per eval. 0 = no cap (full holdout). When the cap
    # truncates, the trainer logs an ``eval_truncated`` event and the
    # eval record carries ``eval_rows`` — never a silent subsample (the
    # repo's named silent-truncation bug class; VERDICT r4 weak #4).
    eval_ctr_max_rows: int = 200_000
    log_every_steps: int = 100
    checkpoint_dir: str | None = None
    checkpoint_every_epochs: int = 0  # 0 = off
    resume: bool = False
    # Early stopping (reference-family convention: stop when the eval
    # metric stops improving). Counts EVALS without improvement (eval
    # cadence = eval_every_epochs); 0 disables. The monitored metric
    # defaults to "auto": auc > recall@max(k) > hr@max(k) > loss,
    # whichever the eval emits; loss/logloss minimize, others maximize.
    early_stop_patience: int = 0
    early_stop_metric: str = "auto"
    early_stop_min_delta: float = 0.0
    # Warm start (the reference family's pretraining protocol — NeuMF
    # from GMF, APR/IRGAN from BPR-MF): copy matching embedding tables
    # from a previous run's checkpoint dir before training. Name mapping
    # comes from the model's warm_start_aliases(); shape mismatches are
    # skipped LOUDLY (warm_start log event). Ignored when resume=True
    # restores a checkpoint of THIS run (resume wins).
    init_from: str | None = None
    # Kernel backend: "pallas" (fused TPU kernels) or "xla" (jnp reference).
    kernels: str = "xla"
    # jax_default_matmul_precision: "default" leaves XLA's choice (f32
    # inputs decompose into multi-pass bf16 on the MXU); "bfloat16" forces
    # single-pass bf16 (fastest, the production CTR setting); "highest"
    # forces full f32 (exactness tests).
    matmul_precision: str = "default"
    profile_steps: tuple[int, int] | None = None


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    run_name: str = "run"

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def _apply_overrides(cfg: Config, overrides: Mapping[str, Any]) -> Config:
    """Apply dotted-path overrides, e.g. {"train.batch_size": 512}."""
    for key, value in overrides.items():
        parts = key.split(".")
        if len(parts) == 1:
            cfg = dataclasses.replace(cfg, **{parts[0]: value})
            continue
        section_name, field_name = parts[0], ".".join(parts[1:])
        section = getattr(cfg, section_name)
        new_section = _apply_overrides_dc(section, field_name, value)
        cfg = dataclasses.replace(cfg, **{section_name: new_section})
    return cfg


def _apply_overrides_dc(dc: Any, dotted: str, value: Any) -> Any:
    parts = dotted.split(".", 1)
    if len(parts) == 1:
        field_types = {f.name: f.type for f in dataclasses.fields(dc)}
        if parts[0] not in field_types:
            raise KeyError(f"unknown config field {parts[0]!r} on {type(dc).__name__}")
        ftype = field_types[parts[0]]
        ftype_str = ftype if isinstance(ftype, str) else str(ftype)
        if isinstance(value, str) and "bool" in ftype_str:
            # A string landing on a bool(-or-None) field is ALWAYS a
            # caller bug ("false" is truthy — it silently enabled the
            # flag before this guard; the DECLARED type is checked, not
            # the current value, so tri-state fields like
            # model.lane_pack: bool | None = None are covered — review
            # finding, round 5). CLI lowercase true/false are coerced
            # upstream (cli.parse_overrides).
            raise ValueError(
                f"config field {parts[0]!r} on {type(dc).__name__} is "
                f"{ftype_str}; got string {value!r} (use true/false)"
            )
        return dataclasses.replace(dc, **{parts[0]: value})
    child = getattr(dc, parts[0])
    return dataclasses.replace(dc, **{parts[0]: _apply_overrides_dc(child, parts[1], value)})


def with_overrides(cfg: Config, overrides: Mapping[str, Any]) -> Config:
    """Public entry: apply {'section.field': value} overrides to a Config."""
    return _apply_overrides(cfg, overrides)
