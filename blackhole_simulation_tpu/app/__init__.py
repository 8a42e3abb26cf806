"""App shell: CLI, animation driver, shareable state, settings, screenshots.

The TPU-framework replacement for the reference's L6/L7 layers (Next.js app
shell + hooks): a command-line front-end over the same capabilities —
render stills, run cinematic animations, benchmark, validate, export
spacetime-analytics fields, run inverse optimization — plus the persistence
pieces (useUrlState's shareable hash, SettingsStorage's localStorage, and
useScreenshot's PNG export) re-homed to files and strings.
"""

from blackhole_simulation_tpu.app.animate import AnimationDriver
from blackhole_simulation_tpu.app.screenshot import save_png
from blackhole_simulation_tpu.app.state import (
    SettingsStorage,
    decode_state,
    encode_state,
)

__all__ = [
    "AnimationDriver",
    "save_png",
    "SettingsStorage",
    "decode_state",
    "encode_state",
]
