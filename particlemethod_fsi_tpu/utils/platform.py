"""Backend bring-up guard for the flaky axon-tunnel platform name.

The profile environment pins ``JAX_PLATFORMS=axon`` (the tunneled TPU
plugin).  After a tunnel restart the plugin sometimes re-registers its
platform under the name ``tpu`` instead, and every process then dies at
first backend touch with ``Unable to initialize backend 'axon': Backend
'axon' is not in the list of known backends: ['cpu', 'tpu']`` — observed
live during round 3 (both names resolve to the same single chip).  A
pinned-but-stale platform name must degrade to auto-selection, not kill
the run (this is the same failure class as round 2's null bench artifact).
"""

from __future__ import annotations


def ensure_backend() -> None:
    """Initialize the JAX backend, falling back to auto-selection when the
    environment pins a platform name that no longer resolves.

    Call once at process entry, before any other backend touch.  No-op when
    the pinned platform (or auto-selection) already works; raises only if
    no backend at all can initialize.
    """
    import jax

    try:
        jax.devices()
    except RuntimeError:
        # The pinned name did not resolve (e.g. the axon plugin registered
        # as 'tpu' after a tunnel restart).  Auto-select among whatever
        # actually registered; this raises if genuinely nothing works.
        jax.config.update("jax_platforms", "")
        jax.devices()
