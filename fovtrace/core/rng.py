"""Counter-based per-pixel RNG.

TPU-native replacement for the reference's TEA hash + LCG stream
(`REF/cuda/device_include/random.h:31-67`): `tea<16>(pixel_id, frame)` seeds
a per-pixel LCG whose successive draws drive jitter/light/BSDF sampling.

We reproduce the same construction with uint32 vector ops so every pixel
gets an independent, frame-seeded, deterministic stream — fully vectorized
over pixel arrays (no sequential state object; callers thread the integer
state explicitly, which keeps everything functional and jit-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def tea(val0, val1, rounds: int = 16):
    """TEA hash of two uint32s (random.h:31-46). Vectorized over arrays."""
    v0 = jnp.asarray(val0).astype(_U32)
    v1 = jnp.asarray(val1).astype(_U32)
    s = jnp.zeros_like(v0)
    delta = _U32(0x9E3779B9)
    k0, k1, k2, k3 = _U32(0xA341316C), _U32(0xC8013EA4), _U32(0xAD90777D), _U32(0x7E95761E)
    for _ in range(rounds):
        s = s + delta
        v0 = v0 + (((v1 << 4) + k0) ^ (v1 + s) ^ ((v1 >> 5) + k1))
        v1 = v1 + (((v0 << 4) + k2) ^ (v0 + s) ^ ((v0 >> 5) + k3))
    return v0


def lcg_next(state):
    """One LCG step (random.h:49-56): state' = 1664525*state + 1013904223."""
    state = jnp.asarray(state).astype(_U32)
    return state * _U32(1664525) + _U32(1013904223)


def rnd(state):
    """Draw uniform [0,1) and advance the stream (random.h:59-67).

    Returns (value, new_state)."""
    new_state = lcg_next(state)
    val = (new_state & _U32(0x00FFFFFF)).astype(jnp.float32) / jnp.float32(
        0x01000000
    )
    return val, new_state


def pixel_seed(pixel_index, frame, rounds: int = 16):
    """Per-pixel seed: tea<16>(W*y + x, frame) (samplingStep.cu:77,
    fov_path_trace_camera.cu:123)."""
    return tea(pixel_index, frame, rounds)
