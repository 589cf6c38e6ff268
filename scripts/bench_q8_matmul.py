#!/usr/bin/python3
"""Microbenchmark: does the v5e MXU actually run s8 x s8 -> s32 at 2x bf16?

The int8 inference path (ops/pallas/quant_conv.py) assumes the v5e's
394 TOPS int8 rate (2x the 197 TFLOP/s bf16 peak).  Measured end-to-end
int8 speedup has been ~0.8-1.1x, which is consistent with Mosaic NOT
lowering the int8 dots to the native MXU int8 path (e.g. emulating via
upconversion).  This isolates the question: one Pallas kernel per dtype
combination doing nothing but a chain of MXU dots from VMEM, timed by
chain-length differencing through the relay.

Prints one JSON line: achieved TOPS per dtype and the int8:bf16 ratio.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 512  # operand tile (N, N); fits VMEM with room to spare
INNER = 64  # dots per kernel invocation


def _chain_kernel(a_ref, b_ref, o_ref, acc_scr, *, in_dtype, acc_dtype,
                  grid: int):
    """INNER dependent MXU dots per grid step; the scratch accumulator
    carries state across grid steps so no iteration can be elided, and the
    in-step operand feedback keeps the dots serial."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    a = a_ref[...]
    b = b_ref[...]
    acc = acc_scr[...]
    for _ in range(INNER):
        d = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
        )
        acc = acc + d.astype(jnp.float32)
        if in_dtype == jnp.int8:
            a = a ^ d[0, 0].astype(jnp.int8)
        else:
            a = a + (d[0, 0] * 1e-30).astype(in_dtype)
    acc_scr[...] = acc

    @pl.when(i == grid - 1)
    def _finish():
        o_ref[...] = acc_scr[...]


def make_bench(in_dtype, acc_dtype, grid: int):
    kernel = functools.partial(_chain_kernel, in_dtype=in_dtype,
                               acc_dtype=acc_dtype, grid=grid)
    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((N, N), lambda i: (0, 0)),
            pl.BlockSpec((N, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((N, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
    )
    return jax.jit(f)


def time_one(in_dtype, acc_dtype, g1=8, g2=64, reps=5):
    rng = np.random.default_rng(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, size=(N, N)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, size=(N, N)), jnp.int8)
    else:
        a = jnp.asarray(rng.normal(size=(N, N)), in_dtype)
        b = jnp.asarray(rng.normal(size=(N, N)), in_dtype)
    f1, f2 = make_bench(in_dtype, acc_dtype, g1), make_bench(in_dtype, acc_dtype, g2)
    # np.asarray (device->host read), NOT block_until_ready: on the axon
    # relay only a result fetch provably waits for execution (bench.py does
    # the same)
    np.asarray(f1(a, b))
    np.asarray(f2(a, b))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f1(a, b))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f2(a, b))
        t2 = time.perf_counter() - t0
        samples.append((t2 - t1) / (g2 - g1))
    per_grid = float(np.median(samples))
    ops = 2 * N * N * N * INNER  # MAC = 2 ops
    tops = ops / per_grid / 1e12
    return tops


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    out = {}
    for name, in_dtype, acc in [
        ("bf16_f32", jnp.bfloat16, jnp.float32),
        ("int8_int32", jnp.int8, jnp.int32),
        ("f32_f32", jnp.float32, jnp.float32),
    ]:
        tops = time_one(in_dtype, acc)
        out[f"tops_{name}"] = round(tops, 1)
        log(f"{name}: {tops:.1f} TOPS")
    out["int8_vs_bf16"] = round(out["tops_int8_int32"] / out["tops_bf16_f32"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
