"""History-conditioned long-tail models (FISM, MultVAE) and the
history-carrying batch machinery (SURVEY.md §2a "other zoo")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfrec_tpu.configs import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
from tfrec_tpu.data.dataset import build_dataset
from tfrec_tpu.data.samplers import PairwiseSampler, UserHistorySampler, build_history
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.trainer import run

DATA = DataConfig(
    source="synthetic_implicit", num_users=256, num_items=512,
    interactions_per_user=24, seed=1,
)


def test_build_history_matches_train_sets():
    ds = build_dataset(DATA)
    hist, lens = build_history(ds, max_len=16, seed=0)
    assert hist.shape == (ds.num_users, 16)
    by_user = {}
    for u, i in zip(ds.train.users, ds.train.items):
        by_user.setdefault(int(u), set()).add(int(i))
    for u in range(0, ds.num_users, 37):
        want = by_user.get(u, set())
        row = hist[u]
        got = set(int(x) for x in row[row < ds.num_items])
        assert lens[u] == min(len(want), 16)
        assert got <= want  # subsample of the true history
        assert len(got) == lens[u]  # no duplicates from the subsample
        # padding is the sentinel
        assert (row[lens[u]:] == ds.num_items).all()


def test_pairwise_sampler_attaches_history():
    ds = build_dataset(DATA)
    s = PairwiseSampler(ds, batch_size=64, seed=0, with_history=8)
    batch = next(iter(s.epoch(0)))
    assert batch["hist"].shape == (64, 8)
    assert batch["hist_len"].shape == (64,)
    # each row's history must belong to that row's user
    for r in (0, 17, 63):
        u = int(batch["user"][r])
        np.testing.assert_array_equal(batch["hist"][r], s.hist[u])


def test_user_history_sampler_covers_active_users():
    ds = build_dataset(DATA)
    s = UserHistorySampler(ds, batch_size=32, max_len=8, seed=0)
    seen = set()
    for batch in s.epoch(0):
        assert batch["hist"].shape == (32, 8)
        assert (batch["hist_len"] > 0).all()
        seen.update(int(u) for u in batch["user"])
    # all-but-remainder coverage, no repeats within the epoch
    assert len(seen) >= (len(s.active) // 32) * 32


def test_fism_self_exclusion():
    """score(u, i) must exclude i from u's history: scoring an item that
    IS the entire history must yield only the bias term."""
    spec = DataSpec.interaction(4, 10)
    m = build_model(ModelConfig(name="fism", embed_dim=4, fism_alpha=0.5), spec)
    params = m.init(jax.random.PRNGKey(0))
    hist = jnp.asarray([[3, 10, 10]], jnp.int32)  # single-item history
    batch = {
        "user": jnp.asarray([0], jnp.int32),
        "item": jnp.asarray([3], jnp.int32),  # the very item in history
        "hist": hist,
        "hist_len": jnp.asarray([1], jnp.int32),
    }
    ids = m.lookup_ids(batch)
    gathered = {
        k: jnp.take(params["tables"][k], v, axis=0, mode="clip")
        for k, v in ids.items()
    }
    score = m.forward(params["dense"], gathered, batch)
    want_bias = params["tables"]["item_bias"][3, 0]
    np.testing.assert_allclose(np.asarray(score[0]), np.asarray(want_bias),
                               atol=1e-6)


def test_fism_learns_above_random():
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="fism", embed_dim=16, max_history=32),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=256, epochs=8, eval_every_epochs=8,
                          eval_topk=(20,), loss="bpr"),
    )
    _, hist = run(cfg, quiet=True)
    # random recall@20 on 512 items ~ 0.039
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_multvae_learns_above_random():
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="multvae", vae_hidden=64, vae_latent=16,
                          dropout=0.5, max_history=32),
        optim=OptimConfig(learning_rate=0.003),
        train=TrainConfig(batch_size=64, epochs=12, eval_every_epochs=12,
                          eval_topk=(20,), loss="multvae"),
    )
    _, hist = run(cfg, quiet=True)
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_multdae_learns_above_random_and_has_no_kl():
    """Mult-DAE (variational=False): deterministic bottleneck — the KL
    head must be exactly zero and the denoiser must still learn."""
    import jax
    import jax.numpy as jnp

    from tfrec_tpu.models import DataSpec, build_model

    mcfg = ModelConfig(name="multdae", vae_hidden=64, vae_latent=16,
                       dropout=0.5, max_history=32)
    m = build_model(mcfg, DataSpec.interaction(64, 128))
    params = m.init(jax.random.PRNGKey(0))
    # deterministic head: w_enc2 maps to latent_dim, not 2*latent_dim
    assert params["dense"]["w_enc2"].shape == (64, 16)
    batch = {"hist": jnp.asarray([[1, 5, 128, 128], [2, 128, 128, 128]],
                                 jnp.int32)}
    g = {"enc1": jnp.take(params["tables"]["enc1"],
                          batch["hist"].reshape(-1), axis=0, mode="clip")}
    out = m.forward(params["dense"], g, batch, rng=jax.random.PRNGKey(1))
    assert float(jnp.abs(out["kl"]).max()) == 0.0

    cfg = Config(
        data=DATA,
        model=mcfg,
        optim=OptimConfig(learning_rate=0.003),
        train=TrainConfig(batch_size=64, epochs=12, eval_every_epochs=12,
                          eval_topk=(20,), loss="bpr"),  # coerced
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "multvae"
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_multvae_coerces_wrong_loss():
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="multvae", vae_hidden=32, vae_latent=8,
                          max_history=16),
        optim=OptimConfig(learning_rate=0.003),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                          loss="bpr"),  # wrong on purpose
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "multvae"


def test_nais_self_exclusion():
    """Attention over an all-excluded history must yield only the bias."""
    spec = DataSpec.interaction(4, 10)
    m = build_model(
        ModelConfig(name="nais", embed_dim=4, nais_attention_dim=4), spec
    )
    params = m.init(jax.random.PRNGKey(0))
    hist = jnp.asarray([[3, 10, 10]], jnp.int32)
    batch = {
        "user": jnp.asarray([0], jnp.int32),
        "item": jnp.asarray([3], jnp.int32),
        "hist": hist,
        "hist_len": jnp.asarray([1], jnp.int32),
    }
    ids = m.lookup_ids(batch)
    gathered = {
        k: jnp.take(params["tables"][k], v, axis=0, mode="clip")
        for k, v in ids.items()
    }
    score = m.forward(params["dense"], gathered, batch)
    want_bias = params["tables"]["item_bias"][3, 0]
    np.testing.assert_allclose(np.asarray(score[0]), np.asarray(want_bias),
                               atol=1e-6)


def test_nais_score_all_matches_forward():
    """Chunked score_all must agree with the pointwise forward path."""
    spec = DataSpec.interaction(6, 37)  # prime-ish V exercises chunk padding
    m = build_model(
        ModelConfig(name="nais", embed_dim=8, nais_attention_dim=4,
                    max_history=5), spec
    )
    params = m.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    hist = np.full((6, 5), 37, np.int32)
    for u in range(6):
        n = rng.integers(1, 6)
        hist[u, :n] = rng.choice(37, size=n, replace=False)
    m.attach_history(hist, (hist < 37).sum(1))
    users = jnp.asarray([0, 3, 5], jnp.int32)
    scores = m.score_all(params, users)
    assert scores.shape == (3, 37)
    for r, u in enumerate([0, 3, 5]):
        for item in (0, 17, 36):
            batch = {
                "user": jnp.asarray([u], jnp.int32),
                "item": jnp.asarray([item], jnp.int32),
                "hist": jnp.asarray(hist[u][None]),
                "hist_len": jnp.asarray([(hist[u] < 37).sum()]),
            }
            ids = m.lookup_ids(batch)
            gathered = {
                k: jnp.take(params["tables"][k], v, axis=0, mode="clip")
                for k, v in ids.items()
            }
            want = float(m.forward(params["dense"], gathered, batch)[0])
            np.testing.assert_allclose(float(scores[r, item]), want, atol=1e-5)


def test_nais_learns_above_random():
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="nais", embed_dim=16, max_history=32,
                          nais_attention_dim=8),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=256, epochs=8, eval_every_epochs=8,
                          eval_topk=(20,), loss="bpr"),
    )
    _, hist = run(cfg, quiet=True)
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_cdae_learns_above_random():
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="cdae", vae_hidden=64, dropout=0.2,
                          max_history=32),
        optim=OptimConfig(learning_rate=0.003),
        train=TrainConfig(batch_size=64, epochs=12, eval_every_epochs=12,
                          eval_topk=(20,), loss="cdae"),
    )
    _, hist = run(cfg, quiet=True)
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_cdae_coerces_wrong_loss():
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="cdae", vae_hidden=32, max_history=16),
        optim=OptimConfig(learning_rate=0.003),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                          loss="logloss"),  # wrong on purpose
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "cdae"


def test_build_sequences_time_ordered_most_recent():
    from tfrec_tpu.data.samplers import build_sequences

    ds = build_dataset(DATA)
    seq, lens = build_sequences(ds, 8, seed=0)
    assert seq.shape == (ds.num_users, 8)
    by_user = {}
    order = np.lexsort((ds.train.times, ds.train.users))
    for idx in order:
        by_user.setdefault(int(ds.train.users[idx]), []).append(
            (float(ds.train.times[idx]), int(ds.train.items[idx]))
        )
    for u in range(0, ds.num_users, 41):
        run_ = by_user.get(u, [])
        want_n = min(len(run_), 8)
        assert lens[u] == want_n
        got = [int(x) for x in seq[u][:want_n]]
        # most recent L, oldest -> newest: timestamps must be non-decreasing
        # and every got item must be in the user's train set
        items_set = {i for _, i in run_}
        assert all(i in items_set for i in got)
        # the LAST element must be (one of) the newest interactions
        if run_:
            newest_t = run_[-1][0]
            got_last_ts = [t for t, i in run_ if i == got[-1]]
            assert max(got_last_ts) >= newest_t - 1e-9 or len(run_) > 8


SEQ_MODEL_CFGS = {
    "sasrec": dict(name="sasrec", embed_dim=8, max_history=6,
                   sasrec_blocks=2),
    "gru4rec": dict(name="gru4rec", embed_dim=8, max_history=6,
                    gru_hidden=12, gru_layers=2),
    "caser": dict(name="caser", embed_dim=8, max_history=6,
                  caser_h_filters=4, caser_heights=(2, 3), caser_v_filters=2),
    "fpmc": dict(name="fpmc", embed_dim=8, max_history=6),
}


@pytest.mark.parametrize("name", sorted(SEQ_MODEL_CFGS))
def test_sequential_causality(name):
    """Changing a FUTURE item must not change earlier positions' logits
    — for every member of the sequential family (seq_base protocol)."""
    spec = DataSpec.interaction(4, 50)
    m = build_model(ModelConfig(**SEQ_MODEL_CFGS[name]), spec)
    params = m.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 50, (2, 6)).astype(np.int32)
    seq2 = seq.copy()
    seq2[:, -1] = (seq2[:, -1] + 7) % 50  # change only the LAST item
    negs = rng.integers(0, 50, (2, 5)).astype(np.int32)

    def fwd(s):
        batch = {"user": jnp.asarray([0, 1], jnp.int32),
                 "seq": jnp.asarray(s), "seq_negs": jnp.asarray(negs),
                 "seq_len": jnp.asarray([6, 6], jnp.int32)}
        ids = m.lookup_ids(batch)
        gathered = {
            k: jnp.take(params["tables"][k], v, axis=0, mode="clip")
            for k, v in ids.items()
        }
        return m.forward(params["dense"], gathered, batch)

    a, b = fwd(seq), fwd(seq2)
    # positions 0..L-3 predict targets seq[1..L-2] — unchanged by the edit
    np.testing.assert_allclose(
        np.asarray(a["pos"][:, :-1]), np.asarray(b["pos"][:, :-1]), atol=1e-6
    )
    # the final position's target DID change
    assert not np.allclose(np.asarray(a["pos"][:, -1]), np.asarray(b["pos"][:, -1]))


@pytest.mark.parametrize(
    "model_kwargs",
    [
        dict(name="gru4rec", embed_dim=32, max_history=24, gru_hidden=48,
             dropout=0.0),
        dict(name="caser", embed_dim=32, max_history=24, caser_h_filters=8,
             caser_heights=(2, 3), caser_v_filters=2, dropout=0.1),
        dict(name="fpmc", embed_dim=32, max_history=24, _lr=0.05),
    ],
    ids=["gru4rec", "caser", "fpmc"],
)
def test_sequential_siblings_learn_above_random(model_kwargs):
    model_kwargs = dict(model_kwargs)
    lr = model_kwargs.pop("_lr", 0.01)  # FPMC's MF-like user term wants MF's lr
    cfg = Config(
        data=DATA,
        model=ModelConfig(**model_kwargs),
        optim=OptimConfig(learning_rate=lr),
        train=TrainConfig(batch_size=64, epochs=12, eval_every_epochs=12,
                          eval_topk=(20,), loss="sasrec"),
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "sasrec"
    # random recall@20 on 512 items ~ 0.039
    assert hist[-1]["recall@20"] > 0.10, hist[-1]


def test_sasrec_learns_above_random():
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="sasrec", embed_dim=32, max_history=24,
                          sasrec_blocks=2, sasrec_heads=2, dropout=0.1),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=64, epochs=12, eval_every_epochs=12,
                          eval_topk=(20,), loss="sasrec"),
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "sasrec"
    # random recall@20 on 512 items ~ 0.039; measured 0.20
    assert hist[-1]["recall@20"] > 0.10, hist[-1]


def test_sequential_score_user_items_matches_score_all():
    """The sampled-eval fast path (encode once per user, dot the
    candidate rows) must agree with score_all cells."""
    spec = DataSpec.interaction(8, 60)
    for name, kw in (("sasrec", dict(sasrec_blocks=1)),
                     ("fpmc", {})):
        m = build_model(
            ModelConfig(name=name, embed_dim=8, max_history=6, **kw), spec
        )
        params = m.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        hist = np.full((8, 6), 60, np.int32)
        lens = np.zeros(8, np.int32)
        for u in range(8):
            lens[u] = rng.integers(1, 7)
            hist[u, : lens[u]] = rng.choice(60, size=lens[u], replace=False)
        m.attach_history(hist, lens)
        users = jnp.asarray([0, 3, 7], jnp.int32)
        cands = jnp.asarray(rng.integers(0, 60, (3, 9)).astype(np.int32))
        got = np.asarray(m.score_user_items(params, users, cands))
        sa = np.asarray(m.score_all(params, users))
        want = sa[np.arange(3)[:, None], np.asarray(cands)]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
