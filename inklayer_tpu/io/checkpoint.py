"""Native checkpoint save/load (orbax) for this framework's param trees.

The reference only ever loads torch checkpoints (SURVEY.md §5 — no saving,
no resume).  Here: converted or fine-tuned parameters persist in orbax
format with the pipeline config alongside, so a deployment never re-pays
torch conversion, and fine-tuning (parallel/train.py) can resume.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax


def save_params(params, path: str, config=None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params)
    ckptr.wait_until_finished()
    if config is not None:
        from inklayer_tpu.config import _to_jsonable

        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(_to_jsonable(config), f, indent=2)


def load_params(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.join(path, "params"), template)
    return ckptr.restore(os.path.join(path, "params"))


def convert_and_cache(torch_path: str, cache_dir: str, loader, *loader_args):
    """Convert a torch checkpoint once and cache the orbax result keyed by
    the source file's mtime+size."""
    stat = os.stat(torch_path)
    key = f"{os.path.basename(torch_path)}-{stat.st_size}-{int(stat.st_mtime)}"
    cached = os.path.join(cache_dir, key)
    if os.path.exists(os.path.join(cached, "params")):
        return load_params(cached)
    params = loader(torch_path, *loader_args)
    os.makedirs(cache_dir, exist_ok=True)
    save_params(params, cached)
    return params
