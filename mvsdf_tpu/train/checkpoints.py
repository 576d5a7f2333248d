"""Checkpoint/resume via orbax: params + optimizer state + epoch + PRNG key.

Improves on the reference (``idr_train.py:164-199``), which saves three
separate .pth files and loses the sampling RNG (resume is not bit-exact,
SURVEY.md section 5.4): one atomic orbax step directory holds everything,
multi-host aware.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(ckpt_dir: str, step: int, state, rng_state=None,
                    jax_key=None):
    """state: TrainState; rng_state: numpy Generator state dict (host
    sampling RNG) and jax_key: the per-batch jax PRNG key, both stored
    alongside for bit-exact resume."""
    ocp = _ckptr()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    tree = {"params": state.params,
            "opt_state": state.opt_state,
            "epoch": state.epoch}
    # camera-pose optimization state (ref saves CamParameters/*.pth
    # separately, idr_train.py:188-199; here part of the same atomic step)
    if getattr(state, "pose_vecs", None) is not None:
        tree["pose_vecs"] = state.pose_vecs
        tree["cam_opt"] = state.cam_opt
    with ocp.PyTreeCheckpointer() as ck:
        ck.save(path, tree, force=True)
    if rng_state is not None or jax_key is not None:
        import json
        blob = {"np_rng": rng_state}
        if jax_key is not None:
            blob["jax_key"] = np.asarray(jax_key)
        with open(os.path.join(path, "rng.json"), "w") as f:
            json.dump(_jsonable(blob), f)
    # update "latest" pointer
    with open(os.path.join(os.path.abspath(ckpt_dir), "latest.txt"),
              "w") as f:
        f.write(str(step))


def latest_step(ckpt_dir: str) -> Optional[int]:
    p = os.path.join(ckpt_dir, "latest.txt")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def restore_checkpoint(ckpt_dir: str, step: Optional[int], like_state):
    """Restore into the structure of like_state. Returns (state, rng_state).
    """
    ocp = _ckptr()
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    item = {"params": like_state.params,
            "opt_state": like_state.opt_state,
            "epoch": like_state.epoch}
    if getattr(like_state, "pose_vecs", None) is not None:
        # only ask for camera state the checkpoint actually has — e.g.
        # --eval_cameras against a camera-less checkpoint should reach the
        # caller's clear error, not an orbax structure mismatch
        with ocp.PyTreeCheckpointer() as ck:
            stored = ck.metadata(path)
        stored_keys = set(getattr(stored, "item_metadata", None) or ())
        if "pose_vecs" in stored_keys:
            item["pose_vecs"] = like_state.pose_vecs
            item["cam_opt"] = like_state.cam_opt
    # Restore onto the *current* devices regardless of where the checkpoint
    # was written (e.g. TPU-trained, CPU-evaluated): explicit per-leaf
    # sharding restore args override the stored device metadata.
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(
            sharding=sharding, dtype=getattr(x, "dtype", None)), item)
    with ocp.PyTreeCheckpointer() as ck:
        tree = ck.restore(path, item=item, restore_args=restore_args)
    rng_state = None
    rng_path = os.path.join(path, "rng.json")
    if os.path.exists(rng_path):
        import json
        with open(rng_path) as f:
            rng_state = _unjsonable(json.load(f))
        if not (isinstance(rng_state, dict) and "np_rng" in rng_state):
            # pre-round-2 layout: bare numpy Generator state
            rng_state = {"np_rng": rng_state, "jax_key": None}
    state = type(like_state)(params=tree["params"],
                             opt_state=tree["opt_state"],
                             epoch=tree["epoch"],
                             pose_vecs=tree.get("pose_vecs"),
                             cam_opt=tree.get("cam_opt"))
    return state, rng_state


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, np.ndarray):
        return {"__nd__": obj.tolist(), "dtype": str(obj.dtype)}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def _unjsonable(obj):
    if isinstance(obj, dict):
        if "__nd__" in obj:
            return np.asarray(obj["__nd__"], dtype=obj["dtype"])
        return {k: _unjsonable(v) for k, v in obj.items()}
    return obj
