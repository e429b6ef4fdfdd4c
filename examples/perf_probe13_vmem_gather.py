"""Probe 13a: can Mosaic do a fast in-VMEM dynamic row gather?

Context (VERDICT r3 #1): every RHS eval serialises a 4.7 ms XLA x[col]
gather (issue-rate-bound, 2.15 ns/row) into the 3.6 ms fused kernel. The
only structural escape on one core is to move the gather INSIDE the kernel
against a VMEM-resident table: if Mosaic lowers `jnp.take(table, idx,
axis=0)` (tpu.dynamic_gather) at a vectorised rate (<~0.5 ns/row), a
two-level (row-stripe x col-block) plan becomes profitable; if it lowers to
a scalar row loop (~2 ns/row or worse), the in-kernel route cannot beat
XLA's gather and the serial composition is a hardware fact.

Measures, on the real chip:
  A. XLA gather baseline: x[N,128] bf16 table, [E] random idx.
  B. Mosaic dynamic_gather: VMEM table [T,128] — Mosaic's only gather
     lowering (take_along_axis with table-shaped indices).
  C. One-hot matmul expansion (MXU route) for small tables.

FINDINGS (v5e, round 4): A = 3.1-3.3 ns/row standalone (5.95 ms for the
bench-shape gather inside a carry-dependent chain, probe13b). B compiles
ONLY at T=8 (one f32 vreg — an in-register sublane shuffle); T>=64
faults the remote Mosaic compiler — there is NO in-VMEM table-gather on
this toolchain, so the two-level (row-stripe × col-block) plan that
would dodge the HBM gather cannot be built. C works but costs
chunk·T·D MXU MACs — at T=512 that is ~2 ns/row-equivalent, no better
than the XLA gather, and T is capped by VMEM. Conclusion: the per-eval
x[col] gather is irreducible on one core (see probe13b for the
no-overlap measurement)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(a):
    _ = float(jax.device_get(a.reshape(-1)[:1])[0])


def time_fn(fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps


def xla_gather_baseline(n=169_343, e=2_703_360, d=128, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(n, d)), dtype)
    idx = jnp.asarray(rng.integers(0, n, e), jnp.int32)

    @jax.jit
    def f(tab, idx):
        return jnp.take(tab, idx, axis=0)

    dt = time_fn(f, tab, idx)
    print(f"A. XLA gather    [{n},{d}] {dtype.__name__} x {e} rows: "
          f"{dt*1e3:.2f} ms = {dt/e*1e9:.2f} ns/row")
    return dt


def pallas_take_kernel(t_rows, d=128):
    """out[i] = tab[idx[i]] via tpu.dynamic_gather (jnp.take_along_axis
    with indices broadcast to the table shape — Mosaic's only gather
    lowering; constraint: out shape == table shape).

    FINDING: works for t_rows == 8 (one f32 vreg's sublanes — an
    in-register shuffle) and FAULTS the Mosaic compiler (remote_compile
    HTTP 500) for t_rows >= 64. There is no in-VMEM table-gather path on
    this hardware/toolchain; the x[col] gather must stay an XLA HBM
    gather at its ~2 ns/row issue rate."""
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.normal(size=(t_rows, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, t_rows, (8, max(1, t_rows // 8))),
                      jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        ids = idx_ref[:].reshape(t_rows)
        full = jnp.broadcast_to(ids[:, None], (t_rows, d))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], full, axis=0)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_rows, d), jnp.float32))
    out = f(tab, idx)
    want = np.asarray(tab)[np.asarray(idx).reshape(t_rows)]
    ok = np.allclose(np.asarray(out), want, atol=1e-5)
    print(f"B. dynamic_gather tab[{t_rows},{d}]: correct={ok}")


def pallas_onehot_kernel(t_rows, chunk, d=128, n_chunks=330):
    """Expansion via one-hot MXU matmul: out = onehot(idx) @ table."""
    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.normal(size=(t_rows, d)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, t_rows, (n_chunks, 8, chunk // 8)),
                      jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, t_rows), 1)
        oh = (ids == idx_ref[0].reshape(chunk)[:, None]).astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            oh, tab_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def f(tab, idx):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((t_rows, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, chunk // 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks * chunk, d),
                                           jnp.bfloat16),
        )(tab, idx)

    rows = n_chunks * chunk
    dt = time_fn(f, tab, idx)
    got = np.asarray(f(tab, idx)[:chunk], np.float32)
    want = np.asarray(tab, np.float32)[np.asarray(idx[0]).reshape(chunk)]
    ok = np.allclose(got, want, atol=3e-2, rtol=3e-2)
    print(f"C. onehot matmul tab[{t_rows},{d}], {n_chunks}x{chunk} rows: "
          f"{dt*1e3:.2f} ms = {dt/rows*1e9:.2f} ns/row  correct={ok}")
    return dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    xla_gather_baseline()
    for t_rows in (8, 64, 512):
        try:
            pallas_take_kernel(t_rows)
        except Exception as ex:
            print(f"B. dynamic_gather tab[{t_rows}] FAULTS the Mosaic "
                  f"compiler: {type(ex).__name__}: {str(ex)[:120]}")
    for t_rows in (512,):
        try:
            pallas_onehot_kernel(t_rows, chunk=1024, n_chunks=2640)
        except Exception as ex:
            print(f"C. onehot tab[{t_rows}] FAILED: "
                  f"{type(ex).__name__}: {str(ex)[:300]}")
