"""Fused dropout as a Pallas TPU kernel — the mask never touches HBM.

The XLA path (flax ``nn.Dropout``) materializes a full uint32 random
tensor in HBM (``rng-bit-generator``: measured ~8 ms/step at the
production batch-96 config, bandwidth-bound writing ~2G elements), reads
it back in the select fusion, and stores a ``pred`` mask for the
backward pass. This kernel instead generates the random bits **in VMEM**
with the TPU's native PRNG (`pltpu.prng_random_bits`) while streaming
``x`` through once:

    forward:  out = where(bits < keep * 2^32, x / keep, 0)
    backward: dx  = where(bits < keep * 2^32, g / keep, 0)

The backward *re-generates* the same bits from the same seed (TPU PRNG is
deterministic per seed), so nothing is saved for the VJP beyond the seed
scalar — no mask materialization at all. Memory traffic becomes the
irreducible read-x + write-out.

The random stream differs from flax's threefry/rbg (different PRNG), but
the distribution is identical: keep probability is exact to 2^-32.

Seeding: the per-tile seed is ``seed + program_id`` so tiles draw
independent streams; callers derive ``seed`` from their flax dropout rng
(see ``models/layers.py::Dropout``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dropout_kernel(seed_ref, x_ref, out_ref, *, thr: int, inv_keep: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = pltpu.bitcast(bits, jnp.uint32) < jnp.uint32(thr)
    scaled = x_ref[:] * jnp.asarray(inv_keep, x_ref.dtype)
    out_ref[:] = jnp.where(keep, scaled, jnp.zeros_like(scaled))


def _apply(x, seed, rate: float, interpret: bool):
    keep = 1.0 - rate
    # threshold on the raw uint32 stream: exact to 2^-32
    thr = min(int(round(keep * 4294967296.0)), 4294967295)
    orig_shape = x.shape
    # Mosaic lane-pads the minor dim to 128: flattening channel-last
    # (C=16) would allocate 8x the tensor (observed: RESOURCE_EXHAUSTED
    # at the production b96 config, tmp/stage_r2b.log). Dropout is
    # elementwise, so flatten to ANY lane-aligned 2D shape instead.
    n = x.size
    pad = 0
    for minor in (2048, 1024, 512, 256, 128):
        if n % minor == 0:
            x2 = x.reshape(n // minor, minor)
            break
    else:
        # odd sizes: pad flat to a lane multiple (a channel-last fallback
        # would reintroduce the padded-minor-dim blowup); the pad region
        # draws extra bits, which is harmless, and is sliced off below
        pad = (-n) % 1024
        x2 = jnp.pad(x.reshape(-1), (0, pad)).reshape((n + pad) // 1024, 1024)
    rows, c = x2.shape
    # ~1M elements per block: in + out + uint32 bits fit VMEM comfortably
    tile = max(1, min(rows, (1 << 20) // c))
    while rows % tile:
        tile -= 1
    grid = (rows // tile,)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    out = pl.pallas_call(
        partial(_dropout_kernel, thr=thr, inv_keep=1.0 / keep),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((tile, c), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, c), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        # bool interpret -> the TPU-flavoured interpreter (the generic CPU
        # interpreter has no lowering for prng_seed). NB: that interpreter
        # stubs prng_random_bits to ZEROS — CPU tests therefore validate
        # plumbing/scaling only (all-zero bits == keep everything); the
        # distribution itself is asserted on real TPU (BENCHMARKS.md).
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, x2)
    if pad:
        out = out.reshape(-1)[:n]
    return out.reshape(orig_shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_dropout(x, seed, rate: float, interpret: bool = False):
    """Dropout with in-kernel PRNG; ``seed`` is an int32 scalar (array or
    python int). ``rate`` must be in (0, 1) — callers bypass at 0."""
    return _apply(x, seed, rate, interpret)


def _fwd(x, seed, rate, interpret):
    return _apply(x, seed, rate, interpret), seed


def _bwd(rate, interpret, seed, g):
    # same seed -> same mask; dropout is linear in x so dx = dropout(g)
    return _apply(g, seed, rate, interpret), None


pallas_dropout.defvjp(_fwd, _bwd)
