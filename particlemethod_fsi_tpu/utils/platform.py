"""Backend bring-up guard for the flaky axon-tunnel platform name.

The profile environment pins ``JAX_PLATFORMS=axon`` (the tunneled TPU
plugin).  After a tunnel restart the plugin sometimes re-registers its
platform under the name ``tpu`` instead, and every process then dies at
first backend touch with ``Unable to initialize backend 'axon': Backend
'axon' is not in the list of known backends: ['cpu', 'tpu']`` — observed
live during round 3 (both names resolve to the same single chip).  A
pinned-but-stale platform name must degrade to auto-selection, not kill
the run (this is the same failure class as round 2's null bench artifact).

Round-4 hardening (ADVICE r3): the fallback is no longer silent — it
warns on stderr, reports the platform it actually resolved, and callers
who explicitly asked for an accelerator can check the resolution with
:func:`require_accelerator`.
"""

from __future__ import annotations

import sys

#: Platform names that mean "the tunneled TPU chip" regardless of which
#: name the plugin registered under this boot.
ACCELERATOR_NAMES = ("tpu", "axon")


def ensure_backend() -> str:
    """Initialize the JAX backend, falling back to auto-selection when the
    environment pins a platform name that no longer resolves.

    Call once at process entry, before any other backend touch.  No-op when
    the pinned platform (or auto-selection) already works; raises only if
    no backend at all can initialize.

    Returns the platform name of the resolved default device (e.g.
    ``"tpu"``, ``"axon"``, ``"cpu"``) so callers can record it in
    artifacts or reject an unwanted CPU fallback.
    """
    import jax

    try:
        devs = jax.devices()
    except RuntimeError as e:
        # The pinned name did not resolve (e.g. the axon plugin registered
        # as 'tpu' after a tunnel restart).  Auto-select among whatever
        # actually registered; this raises if genuinely nothing works.
        jax.config.update("jax_platforms", "")
        devs = jax.devices()
        print(
            "[platform] pinned JAX platform failed to initialize "
            f"({str(e).splitlines()[0][:120]}); auto-selected "
            f"'{devs[0].platform}'",
            file=sys.stderr, flush=True,
        )
    return devs[0].platform


def require_accelerator(resolved: str, requested: str) -> None:
    """Warn loudly when an explicitly requested accelerator resolved to CPU.

    ``requested`` is the user's --platform string; ``resolved`` is what
    :func:`ensure_backend` returned.  The run proceeds (a CPU run is still
    a correct run, and hard-failing would break the virtual-mesh test
    paths), but the degradation is surfaced prominently instead of the
    pre-round-4 silent proceed (ADVICE r3 item 2).
    """
    if requested in ACCELERATOR_NAMES and resolved not in ACCELERATOR_NAMES:
        print(
            f"[platform] WARNING: --platform {requested} was requested but "
            f"the run resolved to '{resolved}' — the TPU plugin did not "
            "initialize (tunnel down?). Proceeding on the resolved "
            "backend; performance numbers from this run are NOT chip "
            "numbers.",
            file=sys.stderr, flush=True,
        )
