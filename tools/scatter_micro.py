#!/usr/bin/env python
"""Microbenchmark: isolate the scatter-chunk cost components on-chip.

One pallas kernel per variant, each running N_CHUNK iterations of a
64-group chunk-equivalent workload:

  reads    dynamic sarr row reads + broadcast only (7 arrays/group)
  reads8   same data read as (8,128) super-group blocks, static row split
  hats     reads8 + hat builds (1 y + 1 x per group)
  hatsmm   reads8 + hats + per-group (128,128)@(128,128) NT matmul
  hatsmm8  reads8 + hats + G=8 lane-batched matmul
  mmonly   per-group matmul on loop-invariant operands
  loop     empty 64-trip loop body (loop overhead floor)

Prints seconds per variant for N_CHUNK chunk-equivalents.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

N_CHUNK = 65536
KS = 64
NA = 8
RS = 32
f32 = jnp.float32


def make_kernel(variant):
    def kern(sarr_in, out_ref, sarr, gwin):
        sarr[...] = sarr_in[...]
        riota = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 0).astype(f32)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0).astype(f32)

        def chunk(c, tot):
            if variant == "loop":
                def body(i, t):
                    return t + jnp.float32(1.0)
                return tot + jax.lax.fori_loop(0, KS, body, jnp.float32(0))

            if variant == "reads":
                def body(i, t):
                    s = jnp.float32(0)
                    for a in range(NA):
                        r = jnp.broadcast_to(
                            sarr[a, i, :].reshape(1, 128), (RS, 128))
                        s = s + r[0, 0]
                    return t + s
                return tot + jax.lax.fori_loop(0, KS, body, jnp.float32(0))

            if variant == "reads8":
                def body(sup, t):
                    base = pl.multiple_of(sup * 8, 8)
                    s = jnp.float32(0)
                    for a in range(NA):
                        blk = sarr[a, pl.ds(base, 8), :]
                        for sub in range(8):
                            r = jnp.broadcast_to(
                                blk[sub:sub + 1, :], (RS, 128))
                            s = s + r[0, 0]
                    return t + s
                return tot + jax.lax.fori_loop(0, KS // 8, body,
                                               jnp.float32(0))

            if variant in ("hats", "hatsmm", "hatsmm8"):
                G = 8 if variant == "hatsmm8" else 1

                def body(sup, t):
                    base = pl.multiple_of(sup * 8, 8)
                    blks = [sarr[a, pl.ds(base, 8), :] for a in range(NA)]
                    tt = t
                    a_cat = []
                    x_cat = []
                    for sub in range(8):
                        def row(a, nrows):
                            return jnp.broadcast_to(
                                blks[a][sub:sub + 1, :], (nrows, 128))
                        y_hat = jnp.maximum(
                            0.0, 1.0 - jnp.abs((row(0, RS) - riota)
                                               + row(1, RS)))
                        x_hat = jnp.maximum(
                            0.0, 1.0 - jnp.abs((row(2, 128) - ciota)
                                               + row(3, 128)))
                        ab = [y_hat * row(4 + b, RS) for b in range(3)]
                        af = jnp.concatenate(ab + [y_hat], axis=0)
                        if variant == "hats":
                            tt = tt + af[0, 0] + x_hat[0, 0]
                        elif variant == "hatsmm":
                            o = jax.lax.dot_general(
                                af, x_hat, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
                            tt = tt + o[0, 0]
                        else:
                            a_cat.append(af)
                            x_cat.append(x_hat)
                    if variant == "hatsmm8":
                        o = jax.lax.dot_general(
                            jnp.concatenate(a_cat, axis=1),
                            jnp.concatenate(x_cat, axis=1),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)
                        tt = tt + o[0, 0]
                    return tt
                return tot + jax.lax.fori_loop(0, KS // 8, body,
                                               jnp.float32(0))

            if variant == "rw":
                # per-chunk sarr WRITE then read-back (the real kernel's
                # pattern): isolates the RAW-hazard cost
                cf = c.astype(f32)
                big = jnp.broadcast_to(riota[0:1, :] * 0.0, (KS, 128))
                for a in range(NA):
                    sarr[a] = big + cf + jnp.float32(a)

                def body(sup, t):
                    base = pl.multiple_of(sup * 8, 8)
                    s = jnp.float32(0)
                    for a in range(NA):
                        blk = sarr[a, pl.ds(base, 8), :]
                        for sub in range(8):
                            r = jnp.broadcast_to(
                                blk[sub:sub + 1, :], (RS, 128))
                            s = s + r[0, 0]
                    return t + s
                return tot + jax.lax.fori_loop(0, KS // 8, body,
                                               jnp.float32(0))

            if variant in ("store", "full"):
                nblk = 4

                def body(sup, t):
                    base = pl.multiple_of(sup * 8, 8)
                    blks = [sarr[a, pl.ds(base, 8), :] for a in range(NA)]
                    a_cat = []
                    x_cat = []
                    for sub in range(8):
                        def row(a, nrows):
                            return jnp.broadcast_to(
                                blks[a][sub:sub + 1, :], (nrows, 128))
                        if variant == "store":
                            a_cat.append(jnp.broadcast_to(
                                blks[0][0:1, :], (nblk * RS, 128)))
                            x_cat.append(jnp.broadcast_to(
                                blks[1][0:1, :], (128, 128)))
                            continue
                        y_hat = jnp.maximum(
                            0.0, 1.0 - jnp.abs((row(0, RS) - riota)
                                               + row(1, RS)))
                        x_hat = jnp.maximum(
                            0.0, 1.0 - jnp.abs((row(2, 128) - ciota)
                                               + row(3, 128)))
                        ab = [y_hat * row(4 + b, RS) for b in range(nblk)]
                        a_cat.append(jnp.concatenate(ab, axis=0))
                        x_cat.append(x_hat)
                    o = jax.lax.dot_general(
                        jnp.concatenate(a_cat, axis=1),
                        jnp.concatenate(x_cat, axis=1),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
                    r8 = pl.multiple_of(
                        (jnp.remainder(c + sup, 4)) * 8, 8)
                    for b in range(nblk):
                        gwin[b, pl.ds(r8, RS), :] += o[b * RS:(b + 1) * RS]
                    return t

                tot2 = jax.lax.fori_loop(0, KS // 8, body, jnp.float32(0))
                return tot + tot2 + gwin[0, 0, 0]

            if variant == "mmonly":
                a0 = jnp.broadcast_to(
                    sarr[0, 0:1, :], (4 * RS, 128)) + ciota[0:128, :]

                def body(i, t):
                    o = jax.lax.dot_general(
                        a0 + i.astype(f32), ciota,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
                    return t + o[0, 0]
                return tot + jax.lax.fori_loop(0, KS, body, jnp.float32(0))

            raise ValueError(variant)

        tot = jax.lax.fori_loop(0, N_CHUNK, chunk, jnp.float32(0))
        out_ref[0, 0] = jnp.broadcast_to(tot, (8, 128))

    return kern


def run(variant):
    sarr_in = jnp.asarray(
        np.random.default_rng(0).uniform(0, 30, (NA, KS, 128)), f32)
    fn = pl.pallas_call(
        make_kernel(variant),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1, 8, 128), f32),
        scratch_shapes=[pltpu.VMEM((NA, KS, 128), f32),
                        pltpu.VMEM((4, 2 * 64, 128), f32)],
    )
    jit_fn = jax.jit(lambda x: fn(x))
    np.asarray(jit_fn(sarr_in))  # compile+warm
    t0 = time.perf_counter()
    out = np.asarray(jit_fn(sarr_in))
    dt = time.perf_counter() - t0
    print(f"{variant:8s}: {dt:7.3f}s for {N_CHUNK} chunks "
          f"({dt / N_CHUNK * 1e6:7.2f} us/chunk)  [{out[0,0,0,0]:.3g}]",
          flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["loop", "reads", "reads8", "hats",
                              "hatsmm", "hatsmm8", "mmonly"]:
        run(v)
