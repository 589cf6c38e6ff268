"""Model checkpointing and the auto-resume contract.

Keeps the reference's on-disk contract
(/root/reference/fact_clip/utils/train_tools.py:8-52, scripts/train.py:316-317):
weights live at ``<logdir>/ckpts/network.iter-<N>.net``; ``resume: "max"``
loads the latest iteration and exits early when a FINISH_PROOF marker exists;
``resume: <path>`` loads an explicit file (with the reference's split-name
sanity check).  Files are flax-msgpack serialized param trees instead of
torch pickles.
"""

from __future__ import annotations

import os
import sys

from flax import serialization


def already_finished(logdir: str) -> bool:
    return os.path.exists(logdir) and os.path.exists(os.path.join(logdir, "FINISH_PROOF"))


def save_params(params, fname: str) -> None:
    with open(fname, "wb") as f:
        f.write(serialization.to_bytes(params))


def _migrate_param_layouts(tree):
    """Migrate pre-2026-08-17 checkpoint layouts:

    * X2YMap out map: nested ``TorchDense_0`` child -> flat
      ``out_kernel/out_bias`` (models/layers.py::X2YMap — the split dense
      that skips the concat).  X2YMap nodes are recognized by their
      xk_kernel sibling, so abranch TorchDense_0 children are untouched.
    * BiGRU: ``l{i}_{dir}/cell/{w_ih,b_ih,w_hh,b_hh}`` -> input projection
      hoisted to ``l{i}_{dir}_w_ih/b_ih`` beside a ``l{i}_{dir}/{w_hh,b_hh}``
      recurrent step (the input gates now precompute outside the scan).
    """
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        v = _migrate_param_layouts(v)
        if (k == "TorchDense_0" and isinstance(v, dict) and "Dense_0" in v
                and "xk_kernel" in tree):
            out["out_kernel"] = v["Dense_0"]["kernel"]
            out["out_bias"] = v["Dense_0"]["bias"]
        elif (isinstance(v, dict) and set(v) == {"cell"}
              and isinstance(v["cell"], dict)
              and set(v["cell"]) == {"w_ih", "b_ih", "w_hh", "b_hh"}):
            cell = v["cell"]
            out[k] = {"w_hh": cell["w_hh"], "b_hh": cell["b_hh"]}
            out[f"{k}_w_ih"] = cell["w_ih"]
            out[f"{k}_b_ih"] = cell["b_ih"]
        else:
            out[k] = v
    return out


def load_params(template, fname: str):
    with open(fname, "rb") as f:
        data = f.read()
    try:
        return serialization.from_bytes(template, data)
    except (ValueError, KeyError):
        raw = serialization.msgpack_restore(data)
        return serialization.from_state_dict(template, _migrate_param_layouts(raw))


def save_params_orbax(params, dirname: str) -> None:
    """Orbax backend: directory-based checkpoint with async-capable layout."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(dirname), params, force=True)


def load_params_orbax(template, dirname: str):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            return ckptr.restore(os.path.abspath(dirname), item=template)
        except (ValueError, KeyError):
            # Pre-migration layout (see _migrate_param_layouts): restore the
            # raw tree, migrate, then shape it onto the template.
            raw = ckptr.restore(os.path.abspath(dirname))
            return serialization.from_state_dict(template, _migrate_param_layouts(raw))


def save_model(params, ckptdir: str, iteration: int, backend: str = "msgpack") -> str:
    """Write ``network.iter-<N>.net`` (msgpack file) or ``.orbax`` (directory)."""
    if backend == "orbax":
        dirname = os.path.join(ckptdir, f"network.iter-{iteration}.orbax")
        save_params_orbax(params, dirname)
        return dirname
    fname = os.path.join(ckptdir, f"network.iter-{iteration}.net")
    save_params(params, fname)
    return fname


# --------------------------------------------------------------------------
# full TrainState (params + optimizer moments + step) — beyond the
# reference's weights-only contract (train_tools.py:15-52), so long DP runs
# resume bit-continuously instead of restarting Adam/momentum from zero.


def _state_path(ckpt_file: str) -> str:
    """Sidecar TrainState file for a weights checkpoint path."""
    stem = ckpt_file[: -len(".orbax")] if ckpt_file.endswith(".orbax") else ckpt_file.rsplit(".", 1)[0]
    return stem.replace("network.iter-", "state.iter-") + ".state"


def _is_flat_state(state) -> bool:
    from .state import FlatTrainState

    return isinstance(state, FlatTrainState)


def _flat_state_to_tree_repr(state):
    """Tree-layout {step, params, opt_state} pytree for a FlatTrainState.

    Flat optimizer-moment vectors (any 1-D leaf of param-vector length:
    Adam mu/nu, SGD trace) are unraveled to the param tree so the sidecar
    bytes are identical to what the tree-layout TrainState writes — the two
    layouts' sidecars stay interchangeable across resumes.
    """
    import jax

    from .state import _jit_unravel

    n = state.flat.size
    unravel = _jit_unravel(state.unravel)  # one dispatch per vector, not per leaf

    def conv(leaf):
        if getattr(leaf, "ndim", None) == 1 and leaf.size == n:
            return unravel(leaf)
        return leaf

    return {
        "step": state.step,
        "params": unravel(state.flat),
        "opt_state": jax.tree_util.tree_map(conv, state.opt_state),
    }


def _flat_state_from_tree_dict(template, raw):
    """Restore a FlatTrainState from a tree-layout sidecar state dict."""
    import jax
    from jax.flatten_util import ravel_pytree

    target = _flat_state_to_tree_repr(template)
    restored = serialization.from_state_dict(target, raw)
    n = template.flat.size

    def back(tmpl_leaf, sub):
        if getattr(tmpl_leaf, "ndim", None) == 1 and tmpl_leaf.size == n:
            return ravel_pytree(sub)[0]
        return sub

    # template leaves align with restored subtrees (tree_map flattens the
    # second tree up to the first's structure)
    opt_state = jax.tree_util.tree_map(back, template.opt_state, restored["opt_state"])
    return template.replace(
        step=restored["step"],
        flat=ravel_pytree(restored["params"])[0],
        opt_state=opt_state,
    )


def save_train_state(state, ckptdir: str, iteration: int, backend: str = "msgpack") -> str:
    """Serialize the full TrainState next to the weights checkpoint.

    The sidecar is msgpack either way (flax to_state_dict covers
    step/params/opt_state; apply_fn/tx are static); ``backend`` only names
    the weights file the sidecar corresponds to.  FlatTrainState sidecars
    are written in the tree layout (see _flat_state_to_tree_repr).
    """
    fname = _state_path(save_model_path(ckptdir, iteration, backend))
    payload = _flat_state_to_tree_repr(state) if _is_flat_state(state) else state
    with open(fname, "wb") as f:
        f.write(serialization.to_bytes(payload))
    return fname


def save_model_path(ckptdir: str, iteration: int, backend: str = "msgpack") -> str:
    ext = "orbax" if backend == "orbax" else "net"
    return os.path.join(ckptdir, f"network.iter-{iteration}.{ext}")


def load_train_state(template_state, ckpt_file: str):
    """Restore a full TrainState from the sidecar of ``ckpt_file``; returns
    None when no sidecar exists (fall back to weights-only resume)."""
    fname = _state_path(ckpt_file)
    if not os.path.exists(fname):
        return None
    with open(fname, "rb") as f:
        data = f.read()
    if _is_flat_state(template_state):
        raw = serialization.msgpack_restore(data)
        try:
            return _flat_state_from_tree_dict(template_state, raw)
        except (ValueError, KeyError):
            # pre-migration param layouts inside the tree-layout sidecar
            return _flat_state_from_tree_dict(template_state, _migrate_param_layouts(raw))
    try:
        return serialization.from_bytes(template_state, data)
    except (ValueError, KeyError):
        # Pre-migration sidecar: migrate params AND the param-shaped Adam
        # moments (mu/nu mirror the param tree, so the same structural
        # rewrite applies) before fitting the template.  Keeps the
        # auto-resume contract across param-layout changes.
        raw = serialization.msgpack_restore(data)
        return serialization.from_state_dict(template_state, _migrate_param_layouts(raw))


def load_model(template, path: str):
    """Load either checkpoint format by extension."""
    if path.endswith(".orbax"):
        return load_params_orbax(template, path)
    return load_params(template, path)


def resume_ckpt(cfg, logdir: str):
    """Return (global_step, ckpt_file or None) following the reference rules."""
    if cfg.aux.resume == "" or not os.path.exists(logdir):
        print("No resume, Train from Scratch")
        return 0, None

    if cfg.aux.resume == "max":
        if already_finished(logdir):
            print("----------------------------------------")
            print("Exp %s %s already finished, Skip it!" % (cfg.aux.exp, cfg.aux.runid))
            print("----------------------------------------")
            sys.exit()

        ckptdir = os.path.join(logdir, "ckpts")
        if not os.path.isdir(ckptdir):
            print("No resume, Train from Scratch")
            return 0, None
        files = [f for f in os.listdir(ckptdir) if f.startswith("network.iter-")]
        if not files:
            print("No resume, Train from Scratch")
            return 0, None

        def it_of(f):
            stem = f.rsplit(".", 1)[0]
            return int(stem.split("-")[-1])

        latest = max(files, key=it_of)
        ckpt_file = os.path.join(ckptdir, latest)
        print("Resume from", ckpt_file)
        return it_of(latest), ckpt_file

    # explicit path
    assert os.path.exists(cfg.aux.resume), cfg.aux.resume
    assert cfg.split.lower() in cfg.aux.resume.lower(), (
        f"Checkpoint path {cfg.aux.resume} does not mention split {cfg.split}"
    )
    base = os.path.basename(cfg.aux.resume)
    it = int(base.split(".")[1].split("-")[1])
    print("Resume from", cfg.aux.resume)
    return it, cfg.aux.resume


def write_finish_proof(logdir: str) -> None:
    open(os.path.join(logdir, "FINISH_PROOF"), "w").close()
