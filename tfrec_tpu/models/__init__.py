"""Model zoo registry — covers the contract zoo (MF/BPR, FM, GMF, MLP,
NeuMF, DCN; BASELINE.json configs 1-5), the standard CTR extensions
(DCNv2, DeepFM, Wide&Deep, DLRM), and the history-conditioned long tail
(FISM item-based, MultVAE autoencoder — SURVEY.md §2a "other zoo")."""

from __future__ import annotations

import dataclasses

from tfrec_tpu.configs import ModelConfig
from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.models.apr import APR
from tfrec_tpu.models.caser import Caser
from tfrec_tpu.models.convncf import ConvNCF
from tfrec_tpu.models.dcn import DCN
from tfrec_tpu.models.deepfm import DeepFM
from tfrec_tpu.models.dlrm import DLRM
from tfrec_tpu.models.ease import EASE
from tfrec_tpu.models.cdae import CDAE
from tfrec_tpu.models.fism import FISM
from tfrec_tpu.models.gru4rec import GRU4Rec
from tfrec_tpu.models.irgan import IRGAN
from tfrec_tpu.models.lightgcn import LightGCN
from tfrec_tpu.models.fm import FM
from tfrec_tpu.models.fpmc import FPMC
from tfrec_tpu.models.mf import MF
from tfrec_tpu.models.multvae import MultVAE
from tfrec_tpu.models.nais import NAIS
from tfrec_tpu.models.ncf import GMF, MLP, NeuMF
from tfrec_tpu.models.nfm import NFM
from tfrec_tpu.models.ngcf import NGCF
from tfrec_tpu.models.pop import Pop
from tfrec_tpu.models.sasrec import SASRec
from tfrec_tpu.models.sbpr import SBPR
from tfrec_tpu.models.widedeep import WideDeep
from tfrec_tpu.models.wrmf import WRMF

__all__ = [
    "DataSpec",
    "RecModel",
    "MF",
    "Pop",
    "FM",
    "NFM",
    "GMF",
    "MLP",
    "NeuMF",
    "ConvNCF",
    "DCN",
    "DeepFM",
    "WideDeep",
    "DLRM",
    "FISM",
    "NAIS",
    "MultVAE",
    "CDAE",
    "SASRec",
    "FPMC",
    "GRU4Rec",
    "Caser",
    "SBPR",
    "APR",
    "IRGAN",
    "WRMF",
    "EASE",
    "LightGCN",
    "NGCF",
    "build_model",
]


def lane_pack_applies(
    model: "RecModel",
    sharded_tables: bool = False,
    batch_size: int | None = None,
) -> bool:
    """True iff AUTO lane packing (ModelConfig.lane_pack=None) should turn
    on for this model: a CTR model with >= 2 equal-dim fields and d < 128
    dividing 128.

    Round-4 policy (VERDICT r3 items 1/8, then measured): rowwise_adam
    now packs — grouped [V, G] second moments + slot-derived touch masks
    keep its math exactly the per-table rule (ops/sparse_optim._adam_init).
    The row-sharded mesh path COMPOSES with packing (RowShardedTable's
    lane-sliced wire moves only the owning d-lane group per (id, slot)
    key — no 128/d a2a byte regression, HLO-pinned) but AUTO still keeps
    mesh runs UNPACKED on measured evidence: the sharded update path is
    already capacity-bounded (it scatters received buckets, never sweeps
    V lane-lines), so packing's dominant single-device win does not
    apply there, and the (id, slot) key handling + one-hot reassembly
    cost a measured 0.87-0.92x on-chip (interleaved (1,1)-mesh K-pair
    slopes, two healthy sessions 2026-08-20, including a re-run after the
    searchsorted fix: unpacked 22.23/21.87 ms vs packed 24.20/25.04 ms
    at d=32/b=8192 — benchmarks/exp_mesh_ab.py; docs/PERF.md "Round-4
    on-chip results").
    Explicit ``model.lane_pack=True`` still selects the lane-sliced mesh
    path (equivalence-pinned in tests/test_lane_pack.py).

    Still excluded:
    - any sharded-tables mesh run (measured 0.87-0.90x, above);
    - ``batch_size`` (PER-CHIP, when known) >= 32k: the P-fold-bigger
      dedup sorts eat the sweep saving — measured tie/slight loss at
      b=32768 (47.71 vs 48.26 ms) vs the 1.33x win at b=8192;
    - 2-field retrieval FMs (dot_decomposition): the sharded-topk /
      serving path addresses per-field tables by name."""
    from tfrec_tpu.models.ctr_base import CTRBase

    if not isinstance(model, CTRBase):
        return False
    if sharded_tables:
        return False
    if batch_size is not None and batch_size >= 32768:
        return False
    if len(set(model.field_dims)) > 1 or model.num_fields < 2:
        return False
    if model.dot_decomposition() is not None:
        # Retrieval-capable CTR form (2-field FM): the sharded-topk /
        # serving path addresses per-field tables by name — packing
        # would silently disable it. Explicit lane_pack=True still packs
        # (dot_decomposition then reports None).
        return False
    d = model.field_dims[0]
    return d < 128 and 128 % d == 0


def build_model(
    cfg: ModelConfig,
    data_spec: DataSpec,
    *,
    backend: str = "xla",
    sharded_tables: bool = False,
    batch_size: int | None = None,
) -> RecModel:
    name = cfg.name.lower()
    if cfg.stack_tables or cfg.lane_pack or cfg.lane_pack is None:
        from tfrec_tpu.models.ctr_base import CTRBase

        which = "stack_tables" if cfg.stack_tables else "lane_pack"
        model = build_model(
            dataclasses.replace(cfg, stack_tables=False, lane_pack=False),
            data_spec, backend=backend,
        )
        if cfg.lane_pack is None and not cfg.stack_tables:
            # AUTO (the default): pack whenever it applies; silently keep
            # per-field tables otherwise. Explicit True below stays loud.
            if lane_pack_applies(model, sharded_tables, batch_size):
                return model.enable_lane_packing()
            return model
        if not isinstance(model, CTRBase):
            raise ValueError(
                f"model.{which} applies to CTR models, not {cfg.name!r}"
            )
        if cfg.stack_tables and cfg.lane_pack:
            raise ValueError("stack_tables and lane_pack are mutually exclusive")
        return (
            model.enable_stacked_tables() if cfg.stack_tables
            else model.enable_lane_packing()
        )
    if name == "pop":
        return Pop(data_spec)
    if name == "mf":
        return MF(data_spec, cfg.embed_dim)
    if name == "sbpr":
        return SBPR(data_spec, cfg.embed_dim)
    if name == "apr":
        return APR(data_spec, cfg.embed_dim, eps=cfg.apr_eps,
                   adv_lambda=cfg.apr_lambda)
    if name == "irgan":
        return IRGAN(data_spec, cfg.embed_dim,
                     temperature=cfg.irgan_temperature)
    if name == "wrmf":
        return WRMF(data_spec, cfg.embed_dim, alpha=cfg.wrmf_alpha,
                    reg=cfg.wrmf_reg)
    if name == "ease":
        return EASE(data_spec, reg=cfg.ease_reg)
    if name == "gmf":
        return GMF(data_spec, cfg.gmf_dim or cfg.embed_dim)
    if name == "mlp":
        return MLP(
            data_spec, cfg.mlp_embed_dim or cfg.embed_dim, cfg.mlp_dims,
            dropout=cfg.dropout,
        )
    if name == "lightgcn":
        return LightGCN(data_spec, cfg.embed_dim,
                        num_layers=cfg.lightgcn_layers)
    if name == "ngcf":
        return NGCF(data_spec, cfg.embed_dim,
                    num_layers=cfg.lightgcn_layers, dropout=cfg.dropout)
    if name == "convncf":
        return ConvNCF(
            data_spec, cfg.embed_dim, channels=cfg.convncf_channels,
            dropout=cfg.dropout,
        )
    if name == "neumf":
        return NeuMF(
            data_spec, cfg.gmf_dim, cfg.mlp_embed_dim, cfg.mlp_dims,
            dropout=cfg.dropout,
        )
    if name == "fm":
        return FM(data_spec, cfg.embed_dim, field_dims=cfg.field_dims or None)
    if name in ("dcn", "dcnv2"):
        if name == "dcn" and cfg.cross_rank > 0:
            raise ValueError(
                "model.cross_rank applies to DCN-v2's low-rank crosses; "
                "name='dcn' (v1, rank-one) would silently ignore it — use "
                "model.name='dcnv2' (a real round-4 test bug class: a "
                "dcn+cross_rank config compared v1 against itself)"
            )
        return DCN(
            data_spec,
            cfg.embed_dim,
            cfg.num_cross_layers,
            cfg.mlp_dims,
            v2=(name == "dcnv2"),
            cross_rank=cfg.cross_rank,
            backend=backend,
            dropout=cfg.dropout,
            field_dims=cfg.field_dims or None,
        )
    if name == "deepfm":
        return DeepFM(data_spec, cfg.embed_dim, cfg.mlp_dims, dropout=cfg.dropout)
    if name == "nfm":
        return NFM(data_spec, cfg.embed_dim, cfg.mlp_dims, dropout=cfg.dropout)
    if name == "widedeep":
        return WideDeep(data_spec, cfg.embed_dim, cfg.mlp_dims,
                        dropout=cfg.dropout, field_dims=cfg.field_dims or None)
    if name == "dlrm":
        return DLRM(
            data_spec, cfg.embed_dim, top_dims=cfg.mlp_dims, dropout=cfg.dropout
        )
    if name == "fism":
        return FISM(
            data_spec, cfg.embed_dim, alpha=cfg.fism_alpha,
            max_history=cfg.max_history,
        )
    if name in ("multvae", "multdae"):
        return MultVAE(
            data_spec, hidden_dim=cfg.vae_hidden, latent_dim=cfg.vae_latent,
            beta=cfg.vae_beta, dropout=cfg.dropout,
            max_history=cfg.max_history,
            variational=(name == "multvae"),
        )
    if name == "nais":
        return NAIS(
            data_spec, cfg.embed_dim, attention_dim=cfg.nais_attention_dim,
            beta=cfg.nais_beta, max_history=cfg.max_history,
        )
    if name == "cdae":
        return CDAE(
            data_spec, hidden_dim=cfg.vae_hidden, dropout=cfg.dropout,
            max_history=cfg.max_history,
        )
    if name == "fpmc":
        return FPMC(data_spec, cfg.embed_dim, max_history=cfg.max_history)
    if name == "sasrec":
        return SASRec(
            data_spec, cfg.embed_dim, num_blocks=cfg.sasrec_blocks,
            num_heads=cfg.sasrec_heads, dropout=cfg.dropout,
            max_history=cfg.max_history,
        )
    if name == "gru4rec":
        return GRU4Rec(
            data_spec, cfg.embed_dim, hidden_dim=cfg.gru_hidden,
            num_layers=cfg.gru_layers, dropout=cfg.dropout,
            max_history=cfg.max_history,
        )
    if name == "caser":
        return Caser(
            data_spec, cfg.embed_dim, h_filters=cfg.caser_h_filters,
            heights=cfg.caser_heights, v_filters=cfg.caser_v_filters,
            dropout=cfg.dropout, max_history=cfg.max_history,
        )
    raise ValueError(f"unknown model {cfg.name!r}")
