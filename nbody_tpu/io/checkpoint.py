"""Checkpoint save/load: positions + velocities + parameters to .npz.

The reference has no state export (SURVEY.md §5 "Checkpoint / resume: None");
this is the mandated addition: snapshot the full simulation state so runs can
resume bit-exactly (same dtype, same params, same step counter).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from nbody_tpu.config import NBodyConfig
from nbody_tpu.params import NBodyParams

FORMAT_VERSION = 1


def save_checkpoint(path, pos, vel, params: NBodyParams, *, step: int = 0,
                    config: NBodyConfig | None = None, extra: dict | None = None,
                    atomic: bool = False, ds_planes=None) -> None:
    """``atomic=True`` writes to a sibling temp file and ``os.replace``s it
    into place, so a crash mid-write (the case periodic autosave exists
    for) can never leave a truncated checkpoint under the real name.

    ``ds_planes`` = (pos_hi, pos_lo, vel_hi, vel_lo) float32 arrays of a
    double-single state: saved alongside the f64 views so a ds resume is
    BIT-exact. (The f64 view alone is not enough: a ds pair whose hi/lo
    exponent gap exceeds f64's 29 spare mantissa bits carries information
    below f64 resolution, so hi+lo would round.) Non-ds loaders read the
    plain pos/vel and work unchanged."""
    import os

    meta = {
        "version": FORMAT_VERSION,
        "params": dataclasses.asdict(params),
        "step": int(step),
        "config": config.value if config is not None else None,
        "extra": extra or {},
    }
    arrays = {
        "pos": np.asarray(pos),
        "vel": np.asarray(vel),
    }
    if ds_planes is not None:
        meta["ds"] = True
        for name, a in zip(("pos_hi", "pos_lo", "vel_hi", "vel_lo"),
                           ds_planes):
            arrays[name] = np.asarray(a, np.float32)
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    target = f"{path}.tmp{os.getpid()}" if atomic else path
    # write through an open handle: np.savez silently appends ".npz" to bare
    # paths, which would break save/load round trips under the same name
    with open(target, "wb") as f:
        np.savez(f, **arrays)
    if atomic:
        os.replace(target, path)


def load_checkpoint(path):
    """Returns (pos, vel, params, meta_dict). Accepts both formats: an npz
    file or an orbax checkpoint directory."""
    import os

    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
    with np.load(path) as data:
        pos = data["pos"]
        vel = data["vel"]
        meta = json.loads(bytes(data["meta"].tobytes()).decode())
    return pos, vel, _params_from_meta(meta), meta


def load_checkpoint_ds_planes(path):
    """(pos_hi, pos_lo, vel_hi, vel_lo) if `path` carries a double-single
    state (save_checkpoint ds_planes=...), else None — the bit-exact ds
    resume path."""
    import os

    if os.path.isdir(path):
        return None  # orbax checkpoints carry the f64 view only
    with np.load(path) as data:
        if "pos_hi" not in data.files:
            return None
        return tuple(data[k] for k in ("pos_hi", "pos_lo",
                                       "vel_hi", "vel_lo"))


def _params_from_meta(meta: dict) -> NBodyParams:
    if meta.get("version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
    pdict = dict(meta["params"])
    pdict["camera_origin"] = tuple(pdict["camera_origin"])
    return NBodyParams(**pdict)


# ---- orbax backend: sharded/async-capable checkpoints for mesh runs ----
# (npz gathers to the host; orbax writes each shard from its own device, the
# right tool once N is sharded over a pod)

def save_checkpoint_orbax(path, pos, vel, params: NBodyParams, *, step: int = 0,
                          config: NBodyConfig | None = None,
                          extra: dict | None = None) -> None:
    import os

    import orbax.checkpoint as ocp

    meta = {
        "version": FORMAT_VERSION,
        "params": dataclasses.asdict(params),
        "step": int(step),
        "config": config.value if config is not None else None,
        "extra": extra or {},
    }
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"pos": pos, "vel": vel,
                          "meta_json": np.frombuffer(json.dumps(meta).encode(),
                                                     dtype=np.uint8)},
                   force=True)


def load_checkpoint_orbax(path):
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    meta = json.loads(bytes(np.asarray(tree["meta_json"]).tobytes()).decode())
    return np.asarray(tree["pos"]), np.asarray(tree["vel"]), _params_from_meta(meta), meta
