import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jnp.ones((8, 128), jnp.float32)


def run(kern, in_space, name):
    try:
        got = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=in_space)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=False)(x)
        print(name, "OK", float(np.array(got)[0, 0]))
    except Exception as e:
        print(name, "FAILED", str(e)[:90])


# a: run_scoped scratch only, VMEM input
def ka(x_ref, o_ref):
    def body(scr):
        scr[:] = x_ref[:] * 2.0
        o_ref[:] = scr[:]
    pl.run_scoped(body, pltpu.VMEM((8, 128), jnp.float32))
run(ka, pltpu.VMEM, "a run_scoped")

# b: DMA VMEM->VMEM scratch
def kb(x_ref, o_ref):
    def body(scr, sem):
        dma = pltpu.make_async_copy(x_ref, scr, sem)
        dma.start(); dma.wait()
        o_ref[:] = scr[:] * 2.0
    pl.run_scoped(body, scr=pltpu.VMEM((8, 128), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))
run(kb, pltpu.VMEM, "b dma vmem->vmem")

# c: ANY input + DMA
def kc(x_ref, o_ref):
    def body(scr, sem):
        dma = pltpu.make_async_copy(x_ref, scr, sem)
        dma.start(); dma.wait()
        o_ref[:] = scr[:] * 2.0
    pl.run_scoped(body, scr=pltpu.VMEM((8, 128), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))
run(kc, pl.ANY, "c dma any->vmem")

# d: scratch_shapes arg instead of run_scoped
def kd(x_ref, o_ref, scr, sem):
    dma = pltpu.make_async_copy(x_ref, scr, sem)
    dma.start(); dma.wait()
    o_ref[:] = scr[:] * 2.0
try:
    got = pl.pallas_call(
        kd,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=False)(x)
    print("d scratch-dma OK", float(np.array(got)[0, 0]))
except Exception as e:
    print("d scratch-dma FAILED", str(e)[:90])


# ---------------------------------------------------------------------------
# Failing cases (uncomment to reproduce the remote-AOT crash): identical
# kernels but with an INDEXED DMA source. Verified 2026-08-17 on the axon
# v5e tunnel: full-ref sources compile; .at[pl.ds(...)] and .at[i]
# (static or traced) on a 4-D/5-D pl.ANY operand crash tpu_compile_helper
# with no Mosaic diagnostic. This blocks KV-cache streaming kernels in
# this environment (see NOTES.md round-2 item 3).
#
# def k_sliced(x_ref, o_ref):   # x: (8, 4, 16, 32) ANY
#     def body(scr, sem):
#         dma = pltpu.make_async_copy(x_ref.at[pl.ds(0, 4)], scr, sem)
#         dma.start(); dma.wait()
#         o_ref[0, :] = scr[0, 0].astype(jnp.float32).sum(0)
#     pl.run_scoped(body, scr=pltpu.VMEM((4, 4, 16, 32), x.dtype),
#                   sem=pltpu.SemaphoreType.DMA(()))
