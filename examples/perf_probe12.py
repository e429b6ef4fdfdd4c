"""Probe 12: decompose the ~1.3 ms/eval solver tail at bench scale.

PARITY's per-eval composition (9.6 ms fwd) leaves "solver axpys + guard
~1.3" unattributed. This probe times the XLA-side tail standalone —
everything between the fused kernel's ax/den write and the next RHS
eval's input — to establish (a) what the 1.3 ms is made of and (b) the
floor a folded-kernel epilogue (emitting f or the staged state directly)
could reach, WITHOUT touching the production kernel.

Variants (each a jitted lax.scan, S iters, carry = y; ax is made
carry-dependent with one fused multiply-add so nothing hoists — the real
solver's ax depends on the stage input the same way):

  stage_tail   den guard + f = alpha*(ax-x) + axpy + barrier  (3 of 4
               rk4 evals run exactly this)
  no_guard     same minus the den-slice/any/where
  axpy_only    yi = y + c*ax_bf16  (the floor if the kernel emitted the
               guarded f in bf16 — the XLA side folded-epilogue cost)
  final_combo  y1 = y + sum_j c_j k_j over 4 f32 k's (the 4th eval's
               tail; measures the k-materialisation traffic)

Run: python examples/perf_probe12.py   (TPU; ~1 min)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N, D, H = 169_343, 128, 2
S = 32


def _sync(a):
    _ = float(jax.device_get(a.reshape(-1)[:1])[0])


def timed(name, fn, *args):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    per_eval = best / S * 1e3
    print(f"{name:>12}: {per_eval:.3f} ms/eval  ({best*1e3:.1f} ms / {S})")
    return per_eval


def main():
    rng = np.random.default_rng(0)
    ax0 = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    den = jnp.abs(jnp.asarray(rng.normal(size=(N, 8)), jnp.float32)) + 0.1
    deg = jnp.asarray(rng.integers(1, 10, size=(N,)), jnp.int32)
    y0 = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    alpha, dt, c = jnp.float32(0.7), jnp.float32(1.0), 0.5

    @jax.jit
    def stage_tail(y):
        def body(y, _):
            ax = ax0 + 1e-6 * y.astype(jnp.float32)   # carry-dependent
            den_h = den[:, :H]
            bad = jnp.any(((den_h <= 0.0) & (deg[:, None] > 0))
                          | ~jnp.isfinite(den_h))
            ax_g = jnp.where(bad, jnp.asarray(jnp.nan, ax.dtype), ax)
            f = alpha * (ax_g - x.astype(jnp.float32))
            yi = (y + (dt * c) * f).astype(y.dtype)
            return jax.lax.optimization_barrier(yi), None
        return jax.lax.scan(body, y, None, length=S)[0]

    @jax.jit
    def no_guard(y):
        def body(y, _):
            ax = ax0 + 1e-6 * y.astype(jnp.float32)
            f = alpha * (ax - x.astype(jnp.float32))
            yi = (y + (dt * c) * f).astype(y.dtype)
            return jax.lax.optimization_barrier(yi), None
        return jax.lax.scan(body, y, None, length=S)[0]

    ax_bf = ax0.astype(jnp.bfloat16)

    @jax.jit
    def axpy_only(y):
        def body(y, _):
            f = ax_bf + (1e-6 * y)        # carry-dependent, bf16 end-to-end
            yi = (y + (dt * c) * f).astype(y.dtype)
            return jax.lax.optimization_barrier(yi), None
        return jax.lax.scan(body, y, None, length=S)[0]

    ks = [jnp.asarray(rng.normal(size=(N, D)), jnp.float32) for _ in range(4)]

    @jax.jit
    def final_combo(y):
        def body(y, _):
            y1 = y
            for cj, k in zip((1 / 6, 1 / 3, 1 / 3, 1 / 6), ks):
                y1 = (y1 + (dt * cj) * (k + 1e-6 * y.astype(jnp.float32))
                      ).astype(y.dtype)
            return jax.lax.optimization_barrier(y1), None
        return jax.lax.scan(body, y, None, length=S)[0]

    print(f"device={jax.devices()[0]}  N={N} D={D} S={S}")
    t_stage = timed("stage_tail", stage_tail, y0)
    t_nog = timed("no_guard", no_guard, y0)
    t_axpy = timed("axpy_only", axpy_only, y0)
    t_combo = timed("final_combo", final_combo, y0)

    # per-rk4-eval average tail = 3 stage tails + 1 final combo over 4 evals
    avg = (3 * t_stage + t_combo) / 4
    fold_floor = (3 * t_axpy + t_combo) / 4
    print(f"\nrk4-averaged tail: {avg:.3f} ms/eval "
          f"(PARITY attributes ~1.3)")
    print(f"folded-epilogue floor (kernel emits guarded bf16 f): "
          f"{fold_floor:.3f} ms/eval -> max recoverable "
          f"{avg - fold_floor:.3f} ms/eval")


if __name__ == "__main__":
    main()
