"""Physics-LUT shading chain (Features.spectral_lut) vs the analytic path.

The LUT chain swaps the analytic NT temperature shape for the exact
Page-Thorne profile and the Tanner-Helland ramp for Planck/CIE colors
(disk.rs:175-201, spectrum.rs:76-102). The two paths share ALL geometry,
so their images must agree structurally (same crossings lit, correlated
intensities) while differing in spectral detail; and the LUT lookups must
be differentiable end-to-end (BASELINE configs[3] needs d/d(disk), d/d(a)).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render import (
    Camera,
    Features,
    MarchConfig,
    Scene,
    render_radiance,
)
from blackhole_simulation_tpu.render.shading import (
    DiskParams,
    build_disk_luts,
    disk_emission_lut,
)


def _scene(spectral, spin=0.9, w=40, h=28):
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.3, fov=0.5, width=w, height=h)
    return Scene.create(
        mass=1.0,
        spin=spin,
        camera=cam,
        features=Features(starfield=False, photon_ring_glow=False,
                          spectral_lut=spectral),
        march_cfg=MarchConfig(max_steps=128),
    )


class TestLuts:
    def test_page_thorne_lut_shape(self):
        """The LUT T(r): zero at the ISCO (no-torque BC), single interior
        peak, decaying tail (disk.rs tests' flux properties)."""
        bh = Kerr(mass=jnp.float64(1.0), spin=jnp.float64(0.9), chart=KS)
        r_grid, t_shape, t_axis, rgb_table = build_disk_luts(bh, DiskParams())
        t = np.asarray(t_shape)
        assert t[0] < 0.05                        # ~0 at the ISCO
        peak = t.argmax()
        assert 0 < peak < len(t) - 1
        assert t.max() == 1.0
        assert t[-1] < t[peak]                    # decaying tail
        assert np.all(np.isfinite(np.asarray(rgb_table)))
        # Planck chromaticity: hot end is bluer than the cool end.
        rgb = np.asarray(rgb_table)
        cool, hot = rgb[1], rgb[-1]
        assert cool[0] / max(cool[2], 1e-6) > hot[0] / max(hot[2], 1e-6)

    def test_redshift_dims_and_reddens(self):
        """g < 1 must dim (g^4) and redden the LUT emission; g > 1 the
        opposite — the Liouville + Planck physics end-to-end."""
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.5), chart=KS)
        disk = DiskParams(turbulence=0.0)
        luts = build_disk_luts(bh, disk)
        r_c = jnp.full((2,), 8.0)
        phi_c = jnp.zeros(2)
        t_c = jnp.zeros(2)
        # lam chosen to produce a red/blue pair: the g-factor is monotone in
        # lam at fixed r (Doppler), so probe both signs.
        lam = jnp.array([-6.0, 6.0])
        rgb, alpha, valid = disk_emission_lut(
            disk, bh, luts, r_c, phi_c, t_c, lam
        )
        rgb = np.asarray(rgb)
        lum = rgb.sum(axis=1)
        assert valid.all()
        # The receding side (negative lam for prograde disk) is dimmer.
        assert lum[0] < lum[1]

    def test_lut_image_structurally_matches_analytic(self):
        img_a = np.asarray(render_radiance(_scene(False)))
        img_l = np.asarray(render_radiance(_scene(True)))
        assert np.all(np.isfinite(img_l))
        lit_a = img_a.sum(axis=2) > 1e-4
        lit_l = img_l.sum(axis=2) > 1e-4
        # Same pixels lit (identical crossings/opacity), up to a tiny rim
        # where the profiles' inner-edge temperatures differ.
        assert (lit_a == lit_l).mean() > 0.97
        la, ll = img_a.sum(axis=2)[lit_a & lit_l], img_l.sum(axis=2)[lit_a & lit_l]
        corr = np.corrcoef(np.log1p(la), np.log1p(ll))[0, 1]
        assert corr > 0.8, f"intensity correlation {corr:.3f}"

    def test_lut_gradients_flow(self):
        """d(image)/d(spin) and d/d(t_peak analogue) through the LUT chain
        must be finite and nonzero — the differentiable-lookup requirement
        (SURVEY §7.3-6)."""
        scene = _scene(True, w=24, h=16)

        def loss_spin(a):
            s = dataclasses.replace(
                scene, bh=Kerr(mass=scene.bh.mass, spin=a, chart=KS)
            )
            return jnp.sum(render_radiance(s))

        g = float(jax.grad(loss_spin)(jnp.float32(0.9)))
        assert np.isfinite(g) and g != 0.0
