"""Shared chained-K device-time harness for the perf tools.

THE methodology for relay-free device timing in this environment (PERF.md):
the computation is applied K times inside ONE jit, each iteration's inputs
data-dependent on the previous output via a numerically-null factor, and two
K values are differenced so the relay's ~30 ms RPC floor, the input upload,
and the program prologue all cancel.

Two invariants every copy of this pattern must uphold (both were violated
once and silently corrupted a measurement — PERF.md r2/r3 harness notes):

* the perturbation must be DATA-DEPENDENT (a runtime scalar derived from the
  previous iteration's output) — a constant-per-call scalar multiply commutes
  through leading linear layers and lets XLA factor the first conv across
  iterations;
* EVERY input array must be perturbed — perturbing only one lets XLA hoist
  the other inputs' entire subgraphs out of the fori_loop as loop-invariant
  (observed: an attention stream vanished from the measurement).

bench.py keeps a self-contained copy by design (the driver runs it alone);
any change to the methodology here must be mirrored there.
"""
from __future__ import annotations

import time


def chained_device_time(apply_fn, arrays, *, ka: int = 2, kb: int = 8, iters: int = 6,
                        compiler_options=None, arg_offset: int = 0):
    """Relay-free device seconds of one ``apply_fn(*arrays)`` application.

    ``apply_fn`` maps the (device-placed) arrays to a SCALAR (e.g.
    ``jnp.sum(out)``); ``arrays`` is a tuple of jax/numpy arrays. Each timing
    call is best-of-``iters`` wall time with a host readback barrier;
    returns ``(T(kb) - T(ka)) / (kb - ka)``.

    ``compiler_options``: per-executable XLA options dict, shipped inside the
    compile RPC via ``jit(...).lower(...).compile(compiler_options=...)`` —
    the only way to reach the remote TPU compiler through the relay.

    ``arg_offset``: added to every perturbation index. When SWEEPING variants
    (e.g. compiler-option candidates), give each variant a distinct offset —
    a candidate that changes nothing compiles to an executable identical to
    baseline, and the relay memoizes identical (executable, args) executions,
    so colliding indices would replay cached results and report a spurious
    speedup (ADVICE r3).
    """
    import jax
    import jax.numpy as jnp

    arrays = tuple(jax.device_put(a) for a in arrays)

    def make(K):
        def chain(ars, i):
            f0 = 1.0 + i.astype(jnp.float32) * 1e-6
            ars = tuple(a * f0.astype(a.dtype) for a in ars)

            def body(_, carry):
                xs, acc = carry
                s = apply_fn(*xs)
                f = 1.0 + s * 1e-38  # data-dependent, numerically null
                xs = tuple((a.astype(jnp.float32) * f).astype(a.dtype) for a in xs)
                return xs, acc + s

            _, acc = jax.lax.fori_loop(0, K, body, (ars, jnp.float32(0.0)))
            return acc

        if compiler_options:
            compiled = (
                jax.jit(chain)
                .lower(arrays, jnp.int32(0))
                .compile(compiler_options=dict(compiler_options))
            )
        else:
            compiled = jax.jit(chain)
        return lambda i: compiled(arrays, jnp.int32(arg_offset + i))

    ta = timed_best(make(ka), iters)
    tb = timed_best(make(kb), iters)
    return (tb - ta) / (kb - ka)


def timed_best(fn, iters: int = 6) -> float:
    """Best-of-``iters`` wall seconds of ``fn(i)`` with a warmup call and a
    host-readback completion barrier (for custom chains, e.g. ones that also
    carry optimizer state — aubench --train)."""
    float(fn(999_999))  # compile + warm
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(i))  # host readback = completion barrier
        best = min(best, time.perf_counter() - t0)
    return best
