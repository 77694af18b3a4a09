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
                    config: NBodyConfig | None = None, extra: dict | None = None) -> None:
    meta = {
        "version": FORMAT_VERSION,
        "params": dataclasses.asdict(params),
        "step": int(step),
        "config": config.value if config is not None else None,
        "extra": extra or {},
    }
    # write through an open handle: np.savez silently appends ".npz" to bare
    # paths, which would break save/load round trips under the same name
    with open(path, "wb") as f:
        np.savez(
            f,
            pos=np.asarray(pos),
            vel=np.asarray(vel),
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        )


def load_checkpoint(path):
    """Returns (pos, vel, params, meta_dict)."""
    with np.load(path) as data:
        pos = data["pos"]
        vel = data["vel"]
        meta = json.loads(bytes(data["meta"].tobytes()).decode())
    if meta.get("version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
    pdict = dict(meta["params"])
    pdict["camera_origin"] = tuple(pdict["camera_origin"])
    params = NBodyParams(**pdict)
    return pos, vel, params, meta
