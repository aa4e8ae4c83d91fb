"""Reader/writer for the reference's key-value ``.data`` physics config.

Format contract follows ``readDataFile`` (``/root/reference/src/main.cpp:729-786``):
whitespace-separated key-value lines; ``#`` comments; 6-wide per-type property
rows; ``SurfaceTension`` maps its 4 values to type slots [0],[1],[4],[5] and
``YoungModulus``/``PoissonRatio`` to [2],[3],[4],[5] (quirk Q8,
src/main.cpp:756-758); ``Wall6``/``Wall7`` rows carry rigid-wall kinematics for
wall types 4/5 (src/main.cpp:766-767).  Unknown keys are accepted with a
warning, matching the reference's "Invalid line" log-and-skip behavior
(src/main.cpp:768-770) -- the shipped ``dam.data`` contains several such dead
keys (Cohesion, Wall2, ...).
"""

from __future__ import annotations

import logging
from typing import Union

from particlemethod_fsi_tpu.config import TYPE_COUNT, CaseConfig, WallMotion

logger = logging.getLogger(__name__)

# keys mapped to scalar CaseConfig fields
_SCALAR_KEYS = {
    "Dt": "dt",
    "ElasticDt": "elastic_dt",
    "OutputInterval": "output_interval",
    "VtkOutputInterval": "vtk_output_interval",
    "EndTime": "end_time",
    "RadiusRatioA": "radius_ratio_a",
    "RadiusRatioP": "radius_ratio_p",
    "RadiusRatioV": "radius_ratio_v",
}

# keys mapped to 6-wide per-type rows
_TABLE6_KEYS = {
    "Density": "density",
    "BulkModulus": "bulk_modulus",
    "BulkViscosity": "bulk_viscosity",
    "ShearViscosity": "shear_viscosity",
}

# 4-wide rows with type-slot mapping (quirk Q8)
_TABLE4_KEYS = {
    "SurfaceTension": ("surface_tension", (0, 1, 4, 5)),
    "YoungModulus": ("young_modulus", (2, 3, 4, 5)),
    "PoissonRatio": ("poisson_ratio", (2, 3, 4, 5)),
}

# Wall rows: the reference parses only Wall6/Wall7 -> wall types 4/5
# (src/main.cpp:766-767).  We accept Wall1..Wall8 -> types 0..5 clamped, but
# warn on the ones the reference would drop, for interop transparency.
_WALL_KEYS = {f"Wall{i}": i - 2 for i in range(1, 9)}
_REFERENCE_WALL_KEYS = {"Wall6", "Wall7"}


def parse_data_file(path_or_text: Union[str, "os.PathLike"], *, is_text: bool = False) -> CaseConfig:
    """Parse a ``.data`` file (or raw text with ``is_text=True``) into a
    :class:`CaseConfig` with default scene/numerics (set those separately)."""
    if is_text:
        text = str(path_or_text)
    else:
        with open(path_or_text) as f:
            text = f.read()

    updates: dict = {}
    interaction = [[1.0] * TYPE_COUNT for _ in range(TYPE_COUNT)]
    walls = [WallMotion() for _ in range(TYPE_COUNT)]
    table_updates: dict = {}

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        tokens = line.split()
        key = tokens[0]
        try:
            if key in _SCALAR_KEYS:
                updates[_SCALAR_KEYS[key]] = float(tokens[1])
            elif key in _TABLE6_KEYS:
                vals = [float(t) for t in tokens[1 : 1 + TYPE_COUNT]]
                if len(vals) != TYPE_COUNT:
                    raise ValueError(f"expected {TYPE_COUNT} values")
                table_updates[_TABLE6_KEYS[key]] = tuple(vals)
            elif key in _TABLE4_KEYS:
                field_name, slots = _TABLE4_KEYS[key]
                vals = [float(t) for t in tokens[1:5]]
                if len(vals) != 4:
                    raise ValueError("expected 4 values")
                row = list(table_updates.get(field_name, (0.0,) * TYPE_COUNT))
                for slot, v in zip(slots, vals):
                    row[slot] = v
                table_updates[field_name] = tuple(row)
            elif key.startswith("InteractionRatio(Type") and key.endswith(")"):
                t = int(key[len("InteractionRatio(Type") : -1])
                vals = [float(x) for x in tokens[1 : 1 + TYPE_COUNT]]
                if len(vals) != TYPE_COUNT:
                    raise ValueError(f"expected {TYPE_COUNT} values")
                interaction[t] = vals
            elif key == "Gravity":
                updates["gravity"] = tuple(float(t) for t in tokens[1:4])
            elif key in _WALL_KEYS:
                # "WallN Center x y z Velocity x y z Omega x y z"
                wall_type = _WALL_KEYS[key]
                vals = _parse_wall_row(tokens)
                if 0 <= wall_type < TYPE_COUNT:
                    walls[wall_type] = vals
                if key not in _REFERENCE_WALL_KEYS:
                    logger.warning(
                        "data key %r is ignored by the reference solver "
                        "(only Wall6/Wall7 are parsed); honoring it here", key
                    )
            else:
                logger.warning("Invalid line in data file %r", line)
        except (ValueError, IndexError) as e:
            logger.warning("Invalid line in data file %r (%s)", line, e)

    updates["interaction_ratio"] = tuple(tuple(r) for r in interaction)
    updates["walls"] = tuple(walls)
    updates.update(table_updates)
    return CaseConfig(**updates)


def _parse_wall_row(tokens: list[str]) -> WallMotion:
    def grab(label: str) -> tuple[float, float, float]:
        i = tokens.index(label)
        return tuple(float(t) for t in tokens[i + 1 : i + 4])

    return WallMotion(center=grab("Center"), velocity=grab("Velocity"), omega=grab("Omega"))


def write_data_file(cfg: CaseConfig, path) -> None:
    """Emit a ``.data`` file readable by both this framework and the reference."""
    lines = ["#######"]
    lines.append(f"Dt\t{cfg.dt:g}")
    lines.append(f"ElasticDt\t{cfg.elastic_dt:g}")
    lines.append(f"OutputInterval\t{cfg.output_interval:g}")
    lines.append(f"VtkOutputInterval\t{cfg.vtk_output_interval:g}")
    lines.append(f"EndTime\t{cfg.end_time:g}")
    lines.append(f"RadiusRatioA\t{cfg.radius_ratio_a:g}")
    lines.append(f"RadiusRatioP\t{cfg.radius_ratio_p:g}")
    lines.append(f"RadiusRatioV\t{cfg.radius_ratio_v:g}")

    def row6(name, vals):
        lines.append(name + "\t" + "\t".join(f"{v:g}" for v in vals))

    row6("Density", cfg.density)
    row6("BulkModulus", cfg.bulk_modulus)
    row6("BulkViscosity", cfg.bulk_viscosity)
    row6("ShearViscosity", cfg.shear_viscosity)
    st = cfg.surface_tension
    lines.append(f"SurfaceTension\t{st[0]:g}\t{st[1]:g}\t{st[4]:g}\t{st[5]:g}")
    ym, pr = cfg.young_modulus, cfg.poisson_ratio
    lines.append(f"YoungModulus\t{ym[2]:g}\t{ym[3]:g}\t{ym[4]:g}\t{ym[5]:g}")
    lines.append(f"PoissonRatio\t{pr[2]:g}\t{pr[3]:g}\t{pr[4]:g}\t{pr[5]:g}")
    for t in range(TYPE_COUNT):
        row6(f"InteractionRatio(Type{t})", cfg.interaction_ratio[t])
    g = cfg.gravity
    lines.append(f"Gravity\t{g[0]:g} {g[1]:g} {g[2]:g}")
    for t in (4, 5):
        w = cfg.walls[t]
        lines.append(
            f"Wall{t + 2}  Center {w.center[0]:g} {w.center[1]:g} {w.center[2]:g}"
            f"    Velocity {w.velocity[0]:g} {w.velocity[1]:g} {w.velocity[2]:g}"
            f"    Omega {w.omega[0]:g} {w.omega[1]:g} {w.omega[2]:g}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
