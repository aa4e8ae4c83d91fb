"""Unit tests of the kernel-function library against the reference formulas."""

import math

import numpy as np
import pytest

from particlemethod_fsi_tpu.ops.smoothing import build_kernels


@pytest.fixture(scope="module", params=[True, False], ids=["2d", "3d"])
def ks(request):
    return build_kernels(
        spacing=1e-3,
        radius_ratio_a=2.5,
        radius_ratio_p=2.5,
        radius_ratio_v=2.5,
        surface_tension=(0.07, 0.0, 0.0, 0.0, 0.07, 0.0),
        two_dimensional=request.param,
    )


class TestNormalizers:
    def test_sw_values_2d(self):
        k = build_kernels(spacing=1e-3, radius_ratio_a=2.5, radius_ratio_p=2.5,
                          radius_ratio_v=2.5, surface_tension=(0.0,) * 6,
                          two_dimensional=True)
        l0 = 1e-3
        # src/main.cpp:1202-1206
        assert k.swa == pytest.approx(0.5 * 2 / 15 * math.pi / l0**2)
        assert k.swp == pytest.approx(0.5 * 1 / 3 * math.pi / l0**2)
        assert k.r2g == pytest.approx(
            0.5 * 1 / 30 * math.pi * (2.5e-3) ** 2 / l0**2 / k.swg
        )
        assert k.cof_k == pytest.approx(0.350778153)

    def test_sw_values_3d(self):
        k = build_kernels(spacing=1e-3, radius_ratio_a=2.5, radius_ratio_p=2.5,
                          radius_ratio_v=2.5, surface_tension=(0.0,) * 6,
                          two_dimensional=False)
        l0 = 1e-3
        # src/main.cpp:1208-1212
        assert k.swa == pytest.approx(1 / 3 * 1 / 5 * math.pi / l0**3)
        assert k.swp == pytest.approx(1 / 3 * 2 / 5 * math.pi / l0**3)
        assert k.cof_k == pytest.approx(0.326976006)

    def test_radius_g_aliases_radius_a(self, ks):
        # src/main.cpp:1193
        assert ks.radius_g == ks.radius_a


class TestLatticeSums:
    def test_n0p_2d_brute_force(self):
        k = build_kernels(spacing=1e-3, radius_ratio_a=2.5, radius_ratio_p=2.5,
                          radius_ratio_v=2.5, surface_tension=(0.0,) * 6,
                          two_dimensional=True)
        l0, h = 1e-3, 2.5e-3
        s = 0.0
        for ix in range(-6, 7):
            for iy in range(-6, 7):
                if ix == iy == 0:
                    continue
                r2 = (ix * l0) ** 2 + (iy * l0) ** 2
                if r2 <= h * h:
                    q = math.sqrt(r2) / h
                    s += 1 / k.swp / h**2 * (1 - q) ** 2
        assert k.n0p == pytest.approx(s, rel=1e-12)

    def test_n0a_positive_and_below_n0p_times_ratio(self, ks):
        assert ks.n0a > 0 and ks.n0p > 0


class TestKernelShapes:
    def test_wp_matches_formula(self, ks):
        r = np.array([0.5e-3, 1.2e-3, 2.0e-3])
        h = ks.radius_p
        d = 2 if ks.two_dimensional else 3
        expect = 1 / ks.swp / h**d * (1 - r / h) ** 2
        np.testing.assert_allclose(np.asarray(ks.wp(r)), expect, rtol=1e-12)

    def test_wa_spike_shape(self, ks):
        r = np.array([0.5e-3, 1.2e-3])
        h = ks.radius_a
        d = 2 if ks.two_dimensional else 3
        expect = 1 / ks.swa / h**d * (r / h) * (1 - r / h) ** 2
        np.testing.assert_allclose(np.asarray(ks.wa(r)), expect, rtol=1e-12)

    def test_derivatives_match_finite_difference(self, ks):
        r = np.linspace(0.3e-3, 2.2e-3, 7)
        eps = 1e-9
        for w, dw in [(ks.wa, ks.dwadr), (ks.wg, ks.dwgdr), (ks.wp, ks.dwpdr),
                      (ks.wv, ks.dwvdr)]:
            fd = (np.asarray(w(r + eps)) - np.asarray(w(r - eps))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(dw(r)), fd, rtol=1e-5)

    def test_wa_vanishes_at_support(self, ks):
        assert float(ks.wa(np.array(ks.radius_a))) == pytest.approx(0.0, abs=1e-12)
        assert float(ks.wp(np.array(ks.radius_p))) == pytest.approx(0.0, abs=1e-12)


class TestCofA:
    def test_cof_a_calibration(self, ks):
        # CofA = sigma / ((Rg/l0)(integN + CofK^2 integX)) (src/main.cpp:1339-1341)
        if ks.two_dimensional:
            integ_n, integ_x = 0.024679383, 0.226126699
        else:
            integ_n, integ_x = 0.021425779, 0.233977488
        expect = 0.07 / ((ks.radius_g / ks.spacing) * (integ_n + ks.cof_k**2 * integ_x))
        assert ks.cof_a[0] == pytest.approx(expect, rel=1e-12)
        assert ks.cof_a[1] == 0.0
