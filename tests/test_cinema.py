"""Camera rig kinematics + cinematic directors (useCamera.ts twins)."""

import math

import numpy as np

from blackhole_simulation_tpu.engine.cinema import (
    CameraRig,
    RigState,
    descent,
    director_track,
    grand_survey,
    initial_zoom,
)


class TestCameraRig:
    def test_friction_decay(self):
        rig = CameraRig()
        rig.drag(100.0, 0.0)
        v0 = rig.state.v_phi
        rig.step(0.1)
        # e^{-5*0.1} velocity decay (camera.rs friction)
        np.testing.assert_allclose(rig.state.v_phi / v0, math.exp(-0.5), rtol=1e-6)

    def test_drag_moves_phi(self):
        rig = CameraRig()
        rig.drag(100.0, 0.0)
        phi0 = rig.state.phi
        rig.step(1 / 60)
        assert rig.state.phi != phi0

    def test_theta_clamped(self):
        rig = CameraRig(RigState(theta=0.06))
        rig.drag(0.0, -1e5)
        rig.step(1.0)
        assert rig.state.theta >= rig.THETA_MIN

    def test_zoom_clamped(self):
        rig = CameraRig()
        rig.zoom(1e-9)
        assert rig.state.r == rig.R_MIN
        rig.zoom(1e9)
        assert rig.state.r == rig.R_MAX

    def test_nan_rollback(self):
        rig = CameraRig()
        rig.step(1 / 60)
        good_phi = rig.state.phi
        rig.state.v_phi = float("nan")
        rig.step(1 / 60)
        assert math.isfinite(rig.state.phi)
        assert rig.state.phi == good_phi

    def test_auto_spin(self):
        rig = CameraRig(auto_spin=True)
        rig.step(1.0)
        np.testing.assert_allclose(rig.state.phi, 0.15, rtol=1e-6)


class TestInitialZoom:
    def test_coverage_scaling(self):
        # Doubling the target coverage halves the radius.
        r1 = initial_zoom(1.0, 0.9, 0.5, coverage=0.2)
        r2 = initial_zoom(1.0, 0.9, 0.5, coverage=0.4)
        np.testing.assert_allclose(r1 / r2, 2.0, rtol=1e-9)

    def test_shadow_apparent_size(self):
        # At the solved radius the shadow's apparent half-angle equals
        # coverage * fov/2 (small-angle).
        r = initial_zoom(1.0, 0.0, 0.5, coverage=0.35)
        apparent = 3.0 * math.sqrt(3.0) / r
        assert abs(apparent - 0.35 * math.tan(0.25)) < 1e-9


class TestDirectors:
    def test_grand_survey_acts(self):
        r0, _, _ = grand_survey(0.0)
        r_mid, _, _ = grand_survey(70.0)   # act 3: low orbit
        r_end, _, _ = grand_survey(120.0)
        assert r0 == 60.0
        assert r_mid == 8.0
        assert r_end == 60.0

    def test_grand_survey_phi_monotone(self):
        phis = [grand_survey(t)[2] for t in np.linspace(0, 119, 60)]
        assert all(b >= a for a, b in zip(phis, phis[1:]))

    def test_grand_survey_keplerian_speedup(self):
        # Angular speed in the low orbit (act 3) beats the wide orbit (act 1).
        w_far = grand_survey(10.0)[2] - grand_survey(9.0)[2]
        w_near = grand_survey(70.0)[2] - grand_survey(69.0)[2]
        assert w_near > 3.0 * w_far

    def test_descent_reaches_trigger_and_recovers(self):
        # Early: falling.
        r_early = descent(1.0)[0]
        assert r_early < 30.0
        # Find the fall time by probing: by t=600 the recovery has finished.
        r_final = descent(600.0)[0]
        np.testing.assert_allclose(r_final, 30.0, rtol=1e-6)

    def test_descent_conserves_l(self):
        # Angular speed rises as the camera falls (L = r^2 dphi/dt const).
        dphi_early = descent(1.0)[2] - descent(0.9)[2]
        # find a later moment still in the fall
        t = 2.0
        while descent(t + 0.2)[0] > 2.5 and t < 500:
            t += 0.2
        dphi_late = descent(t)[2] - descent(t - 0.1)[2]
        assert dphi_late > dphi_early

    def test_track_shape(self):
        track = director_track("grand_survey", 10, fps=1.0)
        assert track.shape == (10, 3)
        assert np.isfinite(track).all()
