"""jit with the env's large world arrays as arguments, not constants.

The Pallas window path (physics/windows.py) pre-builds banded world stacks
of up to ~200 MB.  A plain `jax.jit(alg.train_iteration)` captures them as
closure constants, which embeds them into the lowered HLO — the remote
TPU compile tunnel rejects payloads that large (HTTP 413), and constant
upload per executable is wasted traffic anyway.  `jit_with_world` lifts
the band stacks into ordinary jit arguments while keeping the wrapped
callable's signature unchanged: the same device arrays are passed on
every call (zero transfer), and the env's grid is temporarily rebound to
the traced band arguments for the duration of the trace.

When no bands are attached (CPU test runs, flat worlds) this is exactly
`jax.jit(fn)`.

INVARIANT — single-threaded tracing only: the wrapper temporarily mutates
`env.grid` for the duration of the trace (restored in a finally block).
Tracing two jit_with_world-wrapped functions of the same env concurrently
(e.g. an async eval jit on a worker thread) would race on `env.grid` and
can bake the band-argument tracers of one trace into the other.  All
runners/CLIs trace sequentially on the main thread; keep it that way, or
pass a copied env to the second tracer.
"""
import jax


def jit_with_world(fn, env):
    """`jax.jit(fn)` where `fn` closes over `env`, with env.grid's band
    stacks passed as jit arguments.  Returns a callable with `fn`'s own
    signature.  NOT thread-safe during trace (see module docstring)."""
    g = env.grid
    bands = (g.band_contact, g.band_scan)
    if all(b is None for b in bands):
        return jax.jit(fn)

    def inner(args, bands):
        old = env.grid
        env.grid = old._replace(band_contact=bands[0], band_scan=bands[1])
        try:
            return fn(*args)
        finally:
            env.grid = old

    jitted = jax.jit(inner)
    return lambda *args: jitted(args, bands)
