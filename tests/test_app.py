"""App layer: state codec, settings storage, PNG export, animation driver, CLI.

Mirrors the reference's hook/storage tests (__tests__/hooks/useUrlState,
__tests__/storage/settings.test.ts corruption handling, useScreenshot).
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from blackhole_simulation_tpu.app.animate import AnimationDriver
from blackhole_simulation_tpu.app.cli import main
from blackhole_simulation_tpu.app.screenshot import encode_png, load_png_rgb, save_png
from blackhole_simulation_tpu.app.state import (
    SettingsStorage,
    decode_state,
    encode_state,
)
from blackhole_simulation_tpu.configs.simulation import SimulationParams, apply_preset


class TestStateCodec:
    def test_round_trip_minimal(self):
        p = dataclasses.replace(SimulationParams(), mass=2.0, spin=0.5,
                                enable_jets=True)
        frag = encode_state(p)
        assert frag.startswith("#")
        assert "mass=2" in frag and "spin=0.5" in frag
        # defaults are omitted from the minimal hash
        assert "fov=" not in frag
        assert decode_state(frag) == p

    def test_full_round_trip(self):
        p = apply_preset(SimulationParams(), "balanced")
        assert decode_state(encode_state(p, full=True)) == p

    def test_tolerant_parser(self):
        # junk keys, malformed values, NaN are all ignored (useUrlState).
        p = decode_state("#mass=3&bogus=1&spin=abc&fov=nan&quality=ultra")
        assert p.mass == 3.0
        assert p.spin == SimulationParams().spin
        assert p.fov == SimulationParams().fov

    def test_clamped(self):
        assert decode_state("#mass=99999").mass == 10.0  # schema max


class TestSettingsStorage:
    def test_round_trip(self, tmp_path):
        store = SettingsStorage(str(tmp_path / "settings.json"))
        p = dataclasses.replace(SimulationParams(), spin=0.7, quality="low")
        store.save(p, preset="balanced")
        loaded, preset = store.load()
        assert loaded == p
        assert preset == "balanced"

    def test_missing_file_defaults(self, tmp_path):
        store = SettingsStorage(str(tmp_path / "nope.json"))
        assert store.load() == (SimulationParams(), None)

    def test_corrupt_json_defaults(self, tmp_path):
        path = tmp_path / "settings.json"
        path.write_text("{not json at all")
        assert SettingsStorage(str(path)).load() == (SimulationParams(), None)

    def test_partially_valid(self, tmp_path):
        path = tmp_path / "settings.json"
        path.write_text(json.dumps({
            "version": 1,
            "params": {"mass": 4.0, "spin": "bad", "quality": 7},
            "preset": "nonexistent",
        }))
        p, preset = SettingsStorage(str(path)).load()
        assert p.mass == 4.0
        assert p.spin == SimulationParams().spin
        assert preset is None


class TestScreenshot:
    def test_png_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.random((13, 17, 3)).astype(np.float32)
        path = save_png(img, str(tmp_path / "x.png"))
        back = load_png_rgb(path)
        assert back.shape == (13, 17, 3)
        np.testing.assert_allclose(
            back / 255.0, img, atol=1.0 / 255.0 + 1e-7
        )

    def test_uint8_and_rgba(self, tmp_path):
        img = np.zeros((4, 4, 4), np.uint8)
        img[..., 3] = 255
        data = encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"

    def test_bad_shape(self):
        with pytest.raises(ValueError):
            encode_png(np.zeros((4, 4, 2)))


class TestAnimationDriver:
    def _driver(self, **kw):
        t = {"now": 0.0}

        def clock():
            return t["now"]

        frames = []

        def render(cam, scale):
            frames.append((cam, scale))
            return np.full((8, 8, 3), 0.5, np.float32)

        drv = AnimationDriver(render, clock=clock, **kw)
        return drv, t, frames

    def test_ema_and_frames(self):
        drv, t, frames = self._driver()
        for _ in range(5):
            t["now"] += 1.0 / 60.0
            rep = drv.tick()
        assert len(frames) == 5
        assert rep.index == 5
        assert 0.01 < rep.dt_smoothed < 0.02

    def test_idle_detection(self):
        drv, t, _ = self._driver()
        t["now"] += 10.0
        rep = drv.tick()
        assert rep.idle
        drv.input(dx=5.0)
        rep = drv.tick()
        assert not rep.idle

    def test_director_camera_moves(self):
        drv, t, _ = self._driver(director="grand_survey")
        cams = []
        for _ in range(3):
            t["now"] += 1.0
            cams.append(drv.tick().camera)
        assert cams[0] != cams[-1]

    def test_frame_gate_clamps_spike(self):
        drv, t, _ = self._driver()
        t["now"] += 50.0  # huge stall
        rep = drv.tick()
        assert rep.dt_smoothed < 0.05  # gated at MAX_RAW_DT through the EMA


class TestCLI:
    def test_info(self, capsys):
        assert main(["info", "--set", "spin=0.9"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["event_horizon"] == pytest.approx(1.0 + np.sqrt(1 - 0.81))
        assert out["isco_prograde"] < 6.0

    def test_state_cmd(self, capsys):
        assert main(["state", "--set", "mass=2"]) == 0
        assert "mass=2" in capsys.readouterr().out

    def test_render_tiny(self, tmp_path, capsys):
        out = str(tmp_path / "r.png")
        code = main([
            "render", "--width", "32", "--height", "24",
            "--preset", "minimal", "--out", out,
        ])
        assert code == 0
        img = load_png_rgb(out)
        # the minimal preset renders at 0.5x scale (render_scale schema)
        assert img.shape == (12, 16, 3)

    def test_inverse_tiny(self, capsys):
        """The inverse subcommand drives the production inverse path
        (train.py default: the AD pooled-gradient curriculum) end-to-end:
        two steps on a tiny odd-sized frame must run and report JSON."""
        code = main([
            "inverse", "--width", "16", "--height", "12", "--steps", "2",
            "--init-spin", "0.6", "--set", "quality=low",
        ])
        assert code == 0
        out = capsys.readouterr().out
        assert "recovered_spin" in out

    def test_fields_cmd(self, tmp_path):
        out = str(tmp_path / "f.npz")
        assert main(["fields", "--n-r", "8", "--n-theta", "5", "--out", out]) == 0
        data = np.load(out)
        assert data["kretschmann"].shape == (8, 5) or data["kretschmann"].size > 0


class TestSweepCmd:
    def test_sweep_tiny(self, tmp_path, capsys):
        """Mesh-sharded camera sweep (configs[4] driver) over the 8-device
        virtual mesh: frames render via render_sharded and stack to npz."""
        out = str(tmp_path / "sweep.npz")
        code = main([
            "sweep", "--frames", "2", "--width", "24", "--height", "16",
            "--set", "quality=low", "--out", out,
        ])
        assert code == 0
        data = np.load(out)
        assert data["frames"].shape == (2, 16, 24, 3)
        assert np.isfinite(data["frames"]).all()
        assert "mrays_per_s" in capsys.readouterr().out
