"""Engine facade + native bridge tests.

Validates the C++ seqlock engine against its Python twin and the jnp
physics layer (the reference's cross-language mirror-test pattern,
SURVEY.md §4 'shader-math mirror tests').
"""

import math
import time

import numpy as np
import pytest

from blackhole_simulation_tpu.engine import NativeBridge, PhysicsEngine, PyBridge
from blackhole_simulation_tpu.geodesic import TERM_ESCAPE, TERM_HORIZON


def native_available():
    try:
        b = NativeBridge(1.0, 0.9)
        b.close()
        return True
    except RuntimeError:
        return False


NATIVE = native_available()


@pytest.fixture(params=["native", "python"] if NATIVE else ["python"])
def bridge(request):
    b = NativeBridge(1.0, 0.9) if request.param == "native" else PyBridge(1.0, 0.9)
    yield b
    b.close()


class TestBridge:
    def test_auto_spin_advances_phi(self, bridge):
        phi0 = bridge.camera()["phi"]
        for _ in range(10):
            bridge.tick(0.02)
        phi1 = bridge.camera()["phi"]
        np.testing.assert_allclose(phi1 - phi0, 0.15 * 0.2, rtol=1e-5)

    def test_friction_decays_velocity(self, bridge):
        bridge.input(dx=100.0)
        bridge.tick(0.02)
        v1 = abs(bridge.camera()["yaw_vel"])
        for _ in range(50):
            bridge.tick(0.02)
        v2 = abs(bridge.camera()["yaw_vel"])
        assert v1 > 0
        assert v2 < v1 * 0.05  # e^{-5*1.0} decay over 1 s

    def test_zoom_multiplicative_and_clamped(self, bridge):
        r0 = bridge.camera()["r"]
        bridge.input(zoom=1.0)
        bridge.tick(0.01)
        assert bridge.camera()["r"] < r0
        for _ in range(200):
            bridge.input(zoom=5.0)
            bridge.tick(0.01)
        assert bridge.camera()["r"] >= 4.0  # min-distance clamp

    def test_nan_input_rolls_back(self, bridge):
        good_phi = bridge.camera()["phi"]
        bridge.input(dx=math.nan)
        bridge.tick(0.02)
        cam = bridge.camera()
        assert math.isfinite(cam["phi"])
        assert abs(cam["phi"] - good_phi) < 0.1

    def test_physics_block_matches_jnp(self, bridge):
        from blackhole_simulation_tpu.geometry.radii import event_horizon, isco, photon_sphere

        p = bridge.physics()
        np.testing.assert_allclose(p["horizon"], float(event_horizon(1.0, 0.9)), rtol=1e-6)
        np.testing.assert_allclose(p["isco"], float(isco(1.0, 0.9)), rtol=1e-6)
        np.testing.assert_allclose(
            p["photon_sphere"], float(photon_sphere(1.0, 0.9)), rtol=1e-6
        )

    def test_heartbeat_ticks_in_background(self, bridge):
        bridge.start(hz=200.0)
        time.sleep(0.15)
        bridge.stop()
        ticks = bridge.ticks if isinstance(bridge.ticks, int) else bridge.ticks
        assert ticks > 5


@pytest.mark.skipif(not NATIVE, reason="g++ unavailable")
class TestNativeShadowCurve:
    def test_matches_python_bardeen(self):
        b = NativeBridge(1.0, 0.9)
        try:
            b.tick(0.01)
            pts, extents = b.shadow_curve()
            from blackhole_simulation_tpu.physics import bardeen_shadow

            theta = b.camera()["theta"]
            alpha, beta, valid = bardeen_shadow(1.0, 0.9, theta, n=32)
            alpha, beta = np.asarray(alpha), np.asarray(beta)
            v = np.asarray(valid)
            # Same sweep parameterization: compare valid points directly.
            np.testing.assert_allclose(pts[v, 0], alpha[v], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(pts[v, 1], beta[v], rtol=1e-4, atol=1e-4)
        finally:
            b.close()

    def test_seqlock_reads_consistent_under_heartbeat(self):
        """Hammer reads while the native thread writes at high rate: every
        snapshot must be finite and internally consistent (the race-detection
        test the reference's seqlock design implies)."""
        b = NativeBridge(1.0, 0.9)
        try:
            b.start(hz=2000.0)
            for _ in range(300):
                cam = b.camera()
                p = b.physics()
                assert all(math.isfinite(v) for v in cam.values())
                assert all(math.isfinite(v) for v in p.values())
                assert abs(p["mass"] - 1.0) < 1e-6
            b.stop()
        finally:
            b.close()


class TestPhysicsEngineFacade:
    def setup_method(self):
        self.eng = PhysicsEngine(1.0, 0.9, prefer_native=False)

    def teardown_method(self):
        self.eng.close()

    def test_scalar_api(self):
        assert 1.0 < self.eng.compute_horizon() < 2.0
        assert self.eng.compute_isco() < 6.0  # prograde, a=0.9
        assert 0.0 < self.eng.compute_dilation(10.0) < 1.0

    def test_luts_and_meshes(self):
        lut, r_in, r_out = self.eng.generate_disk_lut(width=64)
        assert lut.shape == (64,) and r_in < r_out
        spec = self.eng.generate_spectrum_lut(width=32, height=8)
        assert spec.shape == (8, 32, 4)
        assert self.eng.generate_ergosphere_mesh(8, 8).shape == (64, 3)

    def test_shadow_api(self):
        a, bta, v = self.eng.compute_shadow_curve(np.pi / 2)
        assert a.shape == (64,)
        assert self.eng.compute_shadow_shift() > 0.3  # prograde displacement

    def test_update_parameters_rebuilds(self):
        h1 = self.eng.compute_horizon()
        self.eng.update_parameters(spin=0.0)
        h2 = self.eng.compute_horizon()
        np.testing.assert_allclose(h2, 2.0, rtol=1e-12)
        assert h2 > h1

    def test_tick_snapshot(self):
        snap = self.eng.tick(0.02)
        assert {"camera", "physics", "shadow_curve", "shadow_extents"} <= set(snap)
        assert snap["shadow_curve"].shape[1] == 2

    def test_integrate_ray_api(self):
        # Radial infall -> horizon; tangential far ray -> escape.
        fall = self.eng.integrate_ray_relativistic(
            [0.0, 20.0, np.pi / 2, 0.0, -1.0, -0.5, 0.0, 0.0], max_steps=20_000
        )
        assert fall["termination"] == TERM_HORIZON
        assert fall["max_hamiltonian_drift"] < 1e-6
        out = self.eng.integrate_ray_relativistic(
            [0.0, 50.0, np.pi / 2, 0.0, -1.0, 0.5, 0.0, 20.0], max_steps=20_000
        )
        assert out["termination"] == TERM_ESCAPE
