"""Checkpoint / resume for the differentiable-optimization loop.

The reference has no training-style persistence (SURVEY.md §5 — its only
cross-frame state is the GL-texture history double buffer). Our
gaze/camera/material optimization loop (BASELINE config 5) checkpoints
optimizer + parameter state so a run restarts deterministically from the
saved step: atomic single-file checkpoints via flax.serialization
(msgpack), with a retained-files window and a latest-step resolver.
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


def _path(directory: str, step: int) -> str:
    return os.path.join(directory, f"ckpt_{step:08d}.msgpack")


def save(directory: str, step: int, state: Any, keep: int = 3) -> str:
    """Atomically write `state` (any pytree: params, opt_state, rng, ...)
    for `step`; prune to the newest `keep` checkpoints. Returns the path."""
    os.makedirs(directory, exist_ok=True)
    state = jax.device_get(state)
    payload = serialization.to_bytes(state)
    path = _path(directory, step)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic publish
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    steps = all_steps(directory)
    for s in steps[:-keep]:
        try:
            os.unlink(_path(directory, s))
        except OSError:
            pass
    return path


def all_steps(directory: str):
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        m = _CKPT_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_step(directory: str) -> Optional[int]:
    steps = all_steps(directory)
    return steps[-1] if steps else None


def restore(directory: str, target: Any,
            step: Optional[int] = None) -> Tuple[int, Any]:
    """Restore into the structure of `target` (a template pytree with the
    right treedef/shapes). Returns (step, state). Raises FileNotFoundError
    if no checkpoint exists."""
    if step is None:
        step = latest_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    with open(_path(directory, step), "rb") as f:
        payload = f.read()
    state = serialization.from_bytes(target, payload)
    return step, state


def restore_or_init(directory: str, init_state: Any) -> Tuple[int, Any]:
    """Resume from the latest checkpoint, or (0, init_state) when none."""
    try:
        return restore(directory, init_state)
    except FileNotFoundError:
        return 0, init_state
