"""Case-model library: parameterized builders for every scenario family the
reference supports via compile-time modules (``/root/reference/src/main.cpp:54-59``)
plus the scaled benchmark configurations.

Each builder returns ``(CaseConfig, GridData)`` ready for
:class:`~particlemethod_fsi_tpu.solver.Simulation`.
"""

from particlemethod_fsi_tpu.models.cases import (
    cantilever_bar,
    dam_break,
    dam_break_3d,
    dam_break_on_elastic_gate,
    hydroelastic_slab,
    reference_dam,
    rolling_tank,
    turek_hron_channel,
)

__all__ = [
    "cantilever_bar",
    "dam_break",
    "dam_break_3d",
    "dam_break_on_elastic_gate",
    "hydroelastic_slab",
    "reference_dam",
    "rolling_tank",
    "turek_hron_channel",
]
