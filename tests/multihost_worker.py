"""Worker process for tests/test_multihost.py (not a pytest module).

Runs one process of an N-process data-parallel training job on CPU devices:
initializes jax.distributed, builds the identical tiny model/batch every
process builds (same seeds), feeds its local slice of each global batch, and
prints the per-step global losses as one JSON line on the last stdout line.

Usage: python multihost_worker.py <pid> <nproc> <port> <steps>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port, steps = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    n_global = jax.device_count()

    import jax.numpy as jnp
    import numpy as np

    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models.blocks import build_fact
    from fact_clip_tpu.parallel import distributed as dist
    from fact_clip_tpu.parallel import mesh as mesh_lib

    from test_model import make_batch, small_cfg
    from test_multihost import GLOBAL_B, make_global_batch

    cfg = small_cfg("iuU")
    cfg.Bi.dropout = 0.2
    cfg.TPU.matcher = "auction"
    C, D = 5, 12

    batch_np = make_global_batch()
    model = build_fact(cfg, D, C, s_pred_cap=24)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
        batch_np["feats"], batch_np["mask"], batch_np["lengths"], train=False,
    )["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    train_step, _ = make_step_fns(model, cfg, C, np.ones((C + 1,), np.float32))

    mesh = mesh_lib.make_mesh(n_data=n_global)
    state = dist.replicate_global(mesh, state)

    per = GLOBAL_B // nproc
    local = {k: np.asarray(v)[pid * per : (pid + 1) * per] for k, v in batch_np.items()}
    gbatch = dist.form_global_batch(mesh, local, mesh_lib.batch_specs_2d())

    base = jax.random.PRNGKey(123)
    losses = []
    for i in range(steps):
        state, out = train_step(state, gbatch, jax.random.fold_in(base, i))
        losses.append(float(out["loss"]))
        # per-video outputs: this process's rows only
        pv = dist.local_values(out["per_video_loss"])
        assert pv.shape[0] == per, pv.shape

    print(json.dumps({"pid": pid, "losses": losses, "local_pv": pv.tolist()}))


if __name__ == "__main__":
    main()
