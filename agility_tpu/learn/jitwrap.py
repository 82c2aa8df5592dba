"""jit with the env's large world arrays as arguments, not constants.

The Pallas window path (physics/windows.py) pre-builds banded world stacks
of up to ~200 MB.  A plain `jax.jit(alg.train_iteration)` captures them as
closure constants, which embeds them into the lowered HLO — the remote
TPU compile tunnel rejects payloads that large (HTTP 413), and constant
upload per executable is wasted traffic anyway.  `jit_with_world` lifts
the band stacks into ordinary jit arguments while keeping the wrapped
callable's *call* signature unchanged: the same device arrays are passed
on every call (zero transfer).

The wrapped callable must accept a trailing `grid=None` keyword (every
env step/init, train_iteration, and bench closure does): the wrapper
passes the env's grid with its band stacks swapped for the traced band
arguments, and the callee threads it down to the band consumers
(engine.step_batch, the scandot window measurement).  Callees fall back
to `self.grid` / `env.grid` when `grid` is None — the plain-jit path for
bandless worlds (CPU tests, flat terrain).  Nothing is mutated at trace
time, so concurrent traces are safe.
"""
import jax


def jit_with_world(fn, env):
    """`jax.jit(fn)` where `fn` closes over `env`, with env.grid's band
    stacks passed as jit arguments via fn's `grid=` keyword.  Returns a
    callable with `fn`'s own positional signature."""
    g = env.grid
    bands = (g.band_contact, g.band_scan)
    if all(b is None for b in bands):
        return jax.jit(fn)
    base = g._replace(band_contact=None, band_scan=None)

    def inner(args, bands):
        return fn(*args, grid=base._replace(band_contact=bands[0],
                                            band_scan=bands[1]))

    jitted = jax.jit(inner)
    return lambda *args: jitted(args, bands)
