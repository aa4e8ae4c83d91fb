"""Tests for .data/.grid/.boid file interop and the scene generator."""

import numpy as np
import pytest

from particlemethod_fsi_tpu.config import WallMotion
from particlemethod_fsi_tpu.generator import generate_grid, parse_boid_file
from particlemethod_fsi_tpu.io.data_file import parse_data_file, write_data_file
from particlemethod_fsi_tpu.io.grid_file import (
    read_grid_file,
    segment_counts,
    write_grid_file,
)

REF_DAM = "/root/reference/results/Dam"


class TestDataFile:
    def test_parse_shipped_dam_data(self):
        cfg = parse_data_file(f"{REF_DAM}/dam.data")
        assert cfg.dt == 1.0e-4
        assert cfg.elastic_dt == 1.0e-4
        assert cfg.output_interval == 1.0
        assert cfg.vtk_output_interval == 1.0e-2
        assert cfg.end_time == 1.0
        assert cfg.radius_ratio_a == 2.5
        assert cfg.density == (1e3, 1e3, 1.1e3, 1e3, 1e3, 6e3)
        assert cfg.bulk_modulus == (1e4, 1e4, 1e4, 1e6, 1e4, 1e5)
        # quirk Q8 slot mapping
        assert cfg.young_modulus[2] == 1e5 and cfg.young_modulus[5] == 1e4
        assert cfg.poisson_ratio[2] == 0.2 and cfg.poisson_ratio[3] == 0.4
        assert cfg.surface_tension == (0.0,) * 6
        assert cfg.gravity == (0.0, -1.0, 0.0)
        assert cfg.interaction_ratio[0] == (1.0,) * 6

    def test_roundtrip(self, tmp_path):
        cfg = parse_data_file(f"{REF_DAM}/dam.data")
        cfg = cfg.replace(walls=tuple(
            WallMotion(center=(1, 2, 3), velocity=(0.1, 0, 0), omega=(0, 0, 2.0))
            if t == 4 else WallMotion() for t in range(6)
        ))
        path = tmp_path / "out.data"
        write_data_file(cfg, path)
        cfg2 = parse_data_file(path)
        assert cfg2.density == cfg.density
        assert cfg2.walls[4].omega == (0.0, 0.0, 2.0)
        assert cfg2.dt == cfg.dt


class TestGridFile:
    def test_read_shipped_dam_grid(self):
        g = read_grid_file(f"{REF_DAM}/dam.grid")
        assert g.n == 6650
        assert g.spacing == 1.0e-3
        assert g.time == 0.0
        np.testing.assert_allclose(g.domain_min, [-0.01, 0.0, 0.0])
        np.testing.assert_allclose(g.domain_max, [0.21, 0.40, 0.001])
        counts = segment_counts(g.prop)
        assert counts["fluid"] + counts["wall"] == 6650
        assert counts["structure"] == 0
        # generator duplicates position as initial position
        np.testing.assert_array_equal(g.position, g.initial_position)

    def test_prof_roundtrip(self, tmp_path):
        g = read_grid_file(f"{REF_DAM}/dam.grid")
        g.time = 0.125
        path = tmp_path / "snap.prof"
        write_grid_file(g, path)
        g2 = read_grid_file(path)
        assert g2.time == pytest.approx(0.125)
        np.testing.assert_allclose(g2.position, g.position, rtol=1e-6)
        np.testing.assert_array_equal(g2.prop, g.prop)


class TestGenerator:
    def test_dam_boid_reproduces_shipped_grid(self):
        """The ported generator must reproduce the shipped dam.grid exactly
        (byte-level float formatting aside)."""
        scene = parse_boid_file(f"{REF_DAM}/dam.boid")
        assert scene.particle_distance == 1.0e-3
        assert len(scene.primitives) == 4
        g = generate_grid(scene)
        ref = read_grid_file(f"{REF_DAM}/dam.grid")
        assert g.n == ref.n == 6650
        np.testing.assert_array_equal(g.prop, ref.prop)
        np.testing.assert_allclose(g.position, ref.position, atol=1e-15)
        np.testing.assert_allclose(g.velocity, ref.velocity)

    def test_generator_file_contract(self, tmp_path):
        """CLI contract: <case>.boid in, <case>.grid out, re-readable."""
        import shutil

        from particlemethod_fsi_tpu.generator import generate_case

        shutil.copy(f"{REF_DAM}/dam.boid", tmp_path / "dam.boid")
        g = generate_case(str(tmp_path / "dam.boid")[: -len(".boid")])
        g2 = read_grid_file(tmp_path / "dam.grid")
        assert g2.n == g.n
        np.testing.assert_allclose(g2.position, g.position, rtol=1e-6, atol=1e-12)

    def test_cyboid_shell(self):
        from particlemethod_fsi_tpu.generator import BoidScene, Primitive, generate_particles

        scene = BoidScene(
            particle_distance=0.1,
            lower_domain=(0, 0, 0),
            upper_domain=(10, 10, 10),
            primitives=[
                Primitive("Cyboid", spacing=0.1, type=2, lower=(0, 0, 0),
                          upper=(2, 2, 2), ratio=0.5),
            ],
        )
        prop, pos, vel, _, _ = generate_particles(scene)
        center = np.array([1.0, 1.0, 1.0])
        r = np.linalg.norm(pos - center, axis=1)
        assert prop.shape[0] > 0
        assert np.all(r <= 1.0 + 1e-12)
        assert np.all(r > 0.5 - 1e-12)

    def test_nonrectangular_primitives_match_reference_binary(self, tmp_path):
        """Byte-level diff against the actual GeneratorForMph binary for every
        non-Cuboid primitive (generator/generator.cpp:683-830): Cuboid2,
        Cyboid (Ratio shell), Cyboid2 (ratio^4 annulus), Recboid (3.1415
        wedge), Recboid2 (rotated, unconditional-append quirk Q6).
        tests/fixtures/prims_ref.grid.gz is the committed output of the
        reference generator (g++ build) on tests/fixtures/prims.boid."""
        import gzip
        import shutil

        from particlemethod_fsi_tpu.generator import generate_case

        fix = "/root/repo/tests/fixtures"
        shutil.copy(f"{fix}/prims.boid", tmp_path / "prims.boid")
        generate_case(str(tmp_path / "prims"))
        ours = (tmp_path / "prims.grid").read_bytes()
        with gzip.open(f"{fix}/prims_ref.grid.gz", "rb") as f:
            ref = f.read()
        assert ours == ref  # byte-identical, all 2,861 particles

    def test_recboid2_appends_unconditionally(self):
        """Quirk Q6: Recboid2's membership test is missing in the reference;
        every lattice point is appended (rotated)."""
        from particlemethod_fsi_tpu.generator import BoidScene, Primitive, generate_particles

        scene = BoidScene(
            particle_distance=0.1,
            lower_domain=(0, 0, 0),
            upper_domain=(10, 10, 10),
            primitives=[
                Primitive("Recboid2", spacing=0.1, type=1, lower=(0, 0, 0),
                          upper=(1, 1, 0.1), angle=30.0),
            ],
        )
        prop, pos, _, _, _ = generate_particles(scene)
        assert prop.shape[0] == 100  # full 10x10x1 lattice
