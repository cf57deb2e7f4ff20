"""Default-PRNG selection: threefry (JAX default) vs the TPU-native rbg.

JAX's default threefry2x32 generator is computed with scalar integer ops;
on TPU every dropout mask is a large elementwise program and the four-
objective pretrain step (~10 encoder passes, 3 dropout sites per layer)
spends a measured 36% of its on-device time in RNG + mask fusions at
batch 32 (207.5 ms -> 131.8 ms with dropout off, v5e, r5 trace).  The
``rbg`` implementation lowers to the hardware ``RngBitGenerator`` and
recovers most of that: 207.5 ms -> 151.6 ms (-27% step time) in the same
A/B.

Parity: the reference trains with cuDNN dropout (torch), so there is no
bitwise RNG stream to preserve — any uniform generator yields the same
training distribution.  Loss-parity tests run ``deterministic=True`` and
are unaffected.  The switch changes which sequence of dropout/masking
draws a given seed produces, so resuming a threefry run under rbg (or
vice versa) changes the draw stream mid-run — harmless for training, but
noted by the CLIs' ``--prng`` help.

Scope: ``jax.config.update`` is process-global.  CLIs call
:func:`set_default_prng` before creating any key; the test suite never
calls it, so golden tests keep the threefry default.
"""

from __future__ import annotations

import jax

# user-facing name -> jax_default_prng_impl value
_IMPLS = {
    "threefry": "threefry2x32",
    "rbg": "rbg",
}

PRNG_CHOICES = tuple(sorted(_IMPLS))
PRNG_HELP = (
    "dropout/masking random generator: 'rbg' is the TPU-native hardware "
    "generator (measured -27%% pretrain step time vs threefry on v5e); "
    "'threefry' is the JAX default. Same training distribution either way "
    "(the reference's cuDNN dropout stream is a third stream again); "
    "resuming a run under a different --prng changes the draw stream "
    "mid-run."
)


def set_default_prng(impl: str) -> None:
    """Set the process-global default PRNG implementation.

    Must run before any ``jax.random.PRNGKey`` whose draws should use
    ``impl`` (keys are raw uint32 arrays interpreted under the default
    impl at trace time, so late calls also re-interpret existing keys —
    call this once, first).
    """
    if impl not in _IMPLS:
        raise ValueError(f"unknown prng impl {impl!r}; choices: "
                         f"{PRNG_CHOICES}")
    jax.config.update("jax_default_prng_impl", _IMPLS[impl])


def add_prng_arg(parser, default: str = "rbg") -> None:
    """Add the shared ``--prng`` CLI argument."""
    parser.add_argument("--prng", default=default, choices=PRNG_CHOICES,
                        help=PRNG_HELP)
