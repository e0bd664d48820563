"""Worker process for the 2-process multihost test.

Builds a mesh spanning both processes, evaluates the deterministically
initialized model (metrics must be IDENTICAL to a single-process run — same
seed, same data, sharding must not change values), then trains a few steps
across the process boundary and checks the loss is finite. Topology comes
from env vars set by the parent test.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> int:
    nproc = int(os.environ["SEQREC_TEST_NPROC"])
    pid = int(os.environ["SEQREC_TEST_PID"])
    out_path = os.environ["SEQREC_TEST_OUT"]

    import jax

    # The axon boot hook pins jax_platforms; force CPU for the fake mesh.
    jax.config.update("jax_platforms", "cpu")

    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ["SEQREC_TEST_COORD"],
            num_processes=nproc,
            process_id=pid,
        )

    import numpy as np

    from seqrec_tpu.config import RunConfig
    from seqrec_tpu.data.dataset import synthetic_dataset
    from seqrec_tpu.eval.harness import evaluate
    from seqrec_tpu.train.trainer import Trainer

    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.model.dropout_rate = 0.0
    cfg.data.batch_size = 4
    cfg.data.max_len = 10
    cfg.train.num_steps = 5
    cfg.train.log_every = 100
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.out_dir = ""

    ds = synthetic_dataset(60, 40, seed=3, min_len=5, max_len=12)
    tr = Trainer(cfg, ds=ds)

    # Deterministic-init eval: must match the single-process run exactly.
    state = tr.init_state()
    metrics = evaluate(tr.model, state.params, ds, cfg.eval, split="test",
                       max_len=cfg.data.max_len)

    # Train across the process boundary; loss must stay finite.
    state, _ = tr.fit(state)
    losses = []
    it = tr.train_iterator()
    _, batch = next(it)
    _, m = tr._train_step(state, tr.put_batch(batch))
    final_loss = float(jax.device_get(m["loss"]))
    assert np.isfinite(final_loss), final_loss

    # Sparse-embedding step across the process boundary: the global-batch
    # unique/remap/scatter must run over DCN-connected fake devices too.
    cfg_sp = RunConfig.from_dict(json.loads(cfg.to_json()))
    cfg_sp.model.loss = "sampled_softmax"
    cfg_sp.model.num_negatives = 16
    cfg_sp.train.optimizer = "adagrad"
    cfg_sp.train.sparse_embedding_update = True
    tr_sp = Trainer(cfg_sp, ds=ds)
    state_sp = tr_sp.init_state()
    _, batch_sp = next(tr_sp.train_iterator())
    _, m_sp = tr_sp._train_step(state_sp, tr_sp.put_batch(batch_sp))
    sparse_loss = float(jax.device_get(m_sp["loss"]))
    assert np.isfinite(sparse_loss), sparse_loss

    if pid == 0 or nproc == 1:
        with open(out_path, "w") as f:
            json.dump(
                {**metrics, "devices": jax.device_count(),
                 "final_loss": final_loss}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
