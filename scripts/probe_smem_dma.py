"""Feasibility probe for the v2 intersection kernel plumbing:
  - grid (NB/8,) with a fori_loop over the 8 sub-blocks (not unrolled)
  - per-sub-block schedule row DMA'd HBM -> SMEM scratch
  - schedule entries read as scalars for control flow + dynamic VMEM index
  - dynamic-sublane store into the (8, R) output block
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, NSC, R = 16, 64, 256
NSC_PAD = 128  # HBM row slices must be 128-aligned for DMA
GROUP = 8


def kernel(counts_ref, sched_hbm, rays_ref, table_ref, out_ref, sched_s, sem):
    i = pl.program_id(0)

    def sub(g, _):
        b = i * GROUP + g
        pltpu.make_async_copy(sched_hbm.at[b], sched_s, sem).start()
        pltpu.make_async_copy(sched_hbm.at[b], sched_s, sem).wait()
        count = counts_ref[b]

        def body(l, acc):
            entry = sched_s[l]
            jc = jax.lax.rem(entry, 65536)
            key = (entry // 65536).astype(jnp.float32)
            return acc + table_ref[jc] * key          # [R]

        acc = jax.lax.fori_loop(0, count, body, jnp.zeros((R,), jnp.float32))
        row = acc + rays_ref[g, 0, :]
        out_ref[pl.dslice(g, 1), :] = row[None, :]
        return 0

    jax.lax.fori_loop(0, GROUP, sub, 0)


def main():
    rng = np.random.default_rng(0)
    sched = rng.integers(0, NSC, size=(NB, NSC)).astype(np.int32)
    sched = sched + (rng.integers(0, 100, size=(NB, NSC)).astype(np.int32)
                     << 16)
    sched = np.pad(sched, ((0, 0), (0, NSC_PAD - NSC)))
    counts = rng.integers(1, NSC, size=(NB,)).astype(np.int32)
    rays = rng.normal(size=(NB, 16, R)).astype(np.float32)
    table = rng.normal(size=(NSC, R)).astype(np.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                 # sched HBM
            pl.BlockSpec((GROUP, 16, R), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSC, R), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, R), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((NSC_PAD,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, R), jnp.float32),
    )(jnp.asarray(counts), jnp.asarray(sched), jnp.asarray(rays),
      jnp.asarray(table))
    out = np.asarray(jax.block_until_ready(out))

    ref = np.zeros((NB, R), np.float32)
    for b in range(NB):
        acc = np.zeros((R,), np.float32)
        for l in range(counts[b]):
            e = sched[b, l]
            acc += table[e % 65536] * np.float32(e >> 16)
        ref[b] = acc + rays[b, 0, :]
    err = np.abs(out - ref).max()
    print("max err:", err)
    assert err < 1e-3, "MISMATCH"
    print("fori sub-blocks + SMEM DMA + dynamic sublane store: OK")


if __name__ == "__main__":
    main()
