"""Shared on-device timing harness for the profiling scripts.

The tunneled TPU backend has ~30 ms of fixed per-call overhead (dispatch +
tunnel RTT + the single device_get); at iters=10 that inflates every
"per-iteration" number by ~3 ms. Chain MANY iterations (default 100) so the
fixed cost amortizes below measurement noise, and always report both.

block_until_ready does not synchronize on this backend, so each iteration
feeds a token derived from the previous output back into the input (true
data dependence) and ONE device_get ends the chain.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

FIXED_OVERHEAD_MS = 40.0   # indicative; measured 2026-08-17 (noop chain)


def enable_compilation_cache():
    """Persistent XLA compile cache for the profiling scripts (repeat runs
    skip multi-minute compiles)."""
    import os

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def chain_ms(fn, x, iters: int = 100) -> float:
    """Per-iteration milliseconds of fn(x)->array, fixed cost amortized."""
    @jax.jit
    def chain(x):
        def body(i, carry):
            tok, acc = carry
            out = fn(x + tok)
            return (jnp.float32(jnp.sum(out)) * 1e-12,
                    acc + jnp.float32(jnp.sum(out)))
        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0), jnp.float32(0)))[1]

    _ = jax.device_get(chain(x))            # compile
    t0 = time.perf_counter()
    _ = jax.device_get(chain(x))
    return (time.perf_counter() - t0) / iters * 1e3


def chain_tok_ms(fn, iters: int = 100) -> float:
    """Like chain_ms for fn(token_scalar)->array (no array input)."""
    @jax.jit
    def chain(tok0):
        def body(i, tok):
            out = fn(tok)
            return jnp.float32(jnp.sum(out)) * 1e-12
        return jax.lax.fori_loop(0, iters, body, tok0)

    _ = jax.device_get(chain(jnp.float32(0.0)))
    t0 = time.perf_counter()
    _ = jax.device_get(chain(jnp.float32(0.0)))
    return (time.perf_counter() - t0) / iters * 1e3


def chain_ms_args(fn, args, iters: int = 100) -> float:
    """Like chain_ms for fn(*args)->array where args[0] is a float array
    the chain token is folded into. Extra args are real jit ARGUMENTS, not
    closure constants — multi-hundred-MB operands (e.g. the stage-0 dense
    map) otherwise ship inside the tunnel compile request and trip its
    body-size limit (HTTP 413)."""
    @jax.jit
    def chain(*args):
        def body(i, carry):
            tok, acc = carry
            out = fn(args[0] + tok, *args[1:])
            return (jnp.float32(jnp.sum(out)) * 1e-12,
                    acc + jnp.float32(jnp.sum(out)))
        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0), jnp.float32(0)))[1]

    _ = jax.device_get(chain(*args))        # compile
    t0 = time.perf_counter()
    _ = jax.device_get(chain(*args))
    return (time.perf_counter() - t0) / iters * 1e3
