"""The config-5 program end-to-end in ONE rehearsal (VERDICT r4 item 5,
BASELINE.json:11 scaled to CI): 4-process sharded DCN training with
mid-run checkpoints -> RESIZED restart at 2 processes resuming from that
checkpoint -> further training -> CTR eval + sharded top-k retrieval on
the live restored shards (exact parity vs a full-sort oracle, asserted
inside the resume workers) -> final-metric parity vs a 1-process
unsharded-topology oracle run of the same config.

The pieces each pass separately in test_multiprocess.py; this composes
them so a single test name witnesses "the config-5 program runs end to
end, resized restart included".
"""

import json
import os

from test_multiprocess import _spawn_workers


def test_config5_program_end_to_end(tmp_path):
    workdir = str(tmp_path)

    # Leg 1: 4 processes x 2 devices — train 2 epochs (~116 optimizer
    # steps), checkpoint every epoch.
    out4 = str(tmp_path / "train4.json")
    _spawn_workers(4, out4, mode=f"config5:{workdir}:train4", timeout=600)
    with open(out4) as f:
        r4 = json.load(f)
    assert 0.5 <= r4["auc"] <= 1.0, r4
    assert os.path.isdir(os.path.join(workdir, "ckpt"))

    # Leg 2: RESIZED restart — 2 processes x 4 devices resume the epoch-2
    # checkpoint, train 2 more epochs, then CTR eval + sharded top-k
    # retrieval parity (asserted inside the workers).
    out2 = str(tmp_path / "resume2.json")
    _spawn_workers(2, out2, mode=f"config5:{workdir}:resume2", timeout=600)
    with open(out2) as f:
        r2 = json.load(f)
    assert r2["resumed_from_epoch"] == 2, r2
    assert r2["topk_parity"] == 1.0, r2
    assert r2["auc"] > 0.65, r2  # learned well above random

    # Leg 3: topology oracle — the SAME config straight through at ONE
    # process (this pytest process owns all 8 devices). Per-process
    # sampler seeds differ by topology, so parity is statistical, not
    # bitwise: the resized-restart run must land in the same quality
    # regime as the never-restarted oracle.
    import multiprocess_worker as mw

    from tfrec_tpu.train.trainer import Trainer

    oracle_dir = str(tmp_path / "oracle")
    os.makedirs(oracle_dir)
    trainer = Trainer(mw.config5_config(oracle_dir, epochs=4, resume=False),
                      quiet=True)
    history = trainer.train()
    auc_oracle = history[-1]["auc"]
    assert auc_oracle > 0.65, history[-1]
    assert abs(r2["auc"] - auc_oracle) < 0.03, (r2["auc"], auc_oracle)
