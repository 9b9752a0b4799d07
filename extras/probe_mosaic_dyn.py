#!/usr/bin/env python
"""Probe which dynamic-lane-index forms Mosaic accepts on THIS toolchain.

The band kernel failed on the real TPU compiler with "cannot statically
prove that index in dimension 2 is a multiple of 128" (round 4) even though
the AOT cross-lowering gate passed — the live backend enforces stricter
lane-dim alignment.  This probe compiles tiny kernels exercising each
candidate workaround so the band-kernel redesign targets something that
actually compiles:

  1. unaligned dynamic lane load            (expected FAIL — the bug)
  2. aligned dynamic lane load via (s//128)*128 + pl.multiple_of hint
  3. pltpu.roll with a traced (dynamic) shift
  4. read-modify-write store at an aligned dynamic lane offset
  5. dynamic SUBLANE load (dim -2) at an arbitrary offset
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_traceback_in_locations_limit", 0)

LEXT = 1536
NF = 8
CAP = 256


def compile_case(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(args) - 1),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: OK", flush=True)
        return True
    except Exception as exc:
        msg = str(exc).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "prove" in l
                    or "NotImplemented" in l or "Unsupported" in l),
                   msg[0] if msg else "?")
        print(f"{name}: FAIL {key[:160]}", flush=True)
        return False


def main():
    x = jnp.zeros((NF, LEXT), jnp.float32)
    s = jnp.asarray([137], jnp.int32)
    out = jax.ShapeDtypeStruct((NF, CAP), jnp.float32)

    def k_unaligned(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[:, pl.ds(s_ref[0], CAP)]

    compile_case("1 unaligned dyn lane load", k_unaligned, out, s, x)

    def k_aligned(s_ref, x_ref, o_ref):
        s0 = (s_ref[0] // 128) * 128
        s0 = pl.multiple_of(s0, 128)
        o_ref[...] = x_ref[:, pl.ds(s0, CAP)]

    compile_case("2 aligned dyn lane load (multiple_of)", k_aligned, out,
                 s, x)

    def k_roll(s_ref, x_ref, o_ref):
        r = pltpu.roll(x_ref[...], -s_ref[0], 1)
        o_ref[...] = r[:, :CAP]

    compile_case("3 pltpu.roll dynamic shift", k_roll, out, s, x)

    def k_store(s_ref, x_ref, o_ref):
        o_ref[...] = jnp.zeros((NF, LEXT), jnp.float32)
        s0 = pl.multiple_of((s_ref[0] // 128) * 128, 128)
        o_ref[:, pl.ds(s0, CAP)] = (o_ref[:, pl.ds(s0, CAP)]
                                    + x_ref[:, :CAP])
    out_full = jax.ShapeDtypeStruct((NF, LEXT), jnp.float32)
    compile_case("4 aligned dyn lane RMW store", k_store, out_full, s, x)

    xt = jnp.zeros((LEXT, 128), jnp.float32)
    out_t = jax.ShapeDtypeStruct((CAP, 128), jnp.float32)

    def k_sublane(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[pl.ds(s_ref[0], CAP), :]

    compile_case("5 unaligned dyn SUBLANE load", k_sublane, out_t, s, xt)

    # 6: combined aligned load + small roll (the actual band-kernel pattern)
    def k_combo(s_ref, x_ref, o_ref):
        s0 = pl.multiple_of((s_ref[0] // 128) * 128, 128)
        w = x_ref[:, pl.ds(s0, CAP + 128)]
        w = pltpu.roll(w, -(s_ref[0] - s0), 1)
        o_ref[...] = w[:, :CAP]

    compile_case("6 aligned load + roll residue", k_combo, out, s, x)

    # 13: EXECUTION semantics of dynamic rotate signs (compiling is not
    # enough: negative traced amounts misplace whole 128-lane tiles on the
    # live backend while the equivalent positive rotate is exact)
    lw = CAP + 2 * 128 - CAP % 128
    xs = jnp.asarray(np.arange(NF * LEXT, dtype=np.float32).reshape(NF, LEXT))
    for name, amount in (
            ("13a roll negative residue", lambda r: -r),
            ("13b roll positive equivalent",
             lambda r: jax.lax.rem(lw - r, lw))):
        def k_sem(s_ref, x_ref, o_ref, amount=amount):
            s0 = pl.multiple_of((s_ref[0] // 128) * 128, 128)
            w = x_ref[:, pl.ds(s0, lw)]
            w = pltpu.roll(w, amount(s_ref[0] - s0), 1)
            o_ref[...] = w[:, :CAP]
        try:
            fn = pl.pallas_call(
                k_sem,
                out_shape=jax.ShapeDtypeStruct((NF, CAP), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
            errs = [float(jnp.max(jnp.abs(
                fn(jnp.asarray([sv], jnp.int32), xs)
                - xs[:, sv:sv + CAP]))) for sv in (0, 1, 137, 255, 1023)]
            print(f"{name}: max|err| per start = {errs}", flush=True)
        except Exception as exc:
            print(f"{name}: FAIL {str(exc).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
