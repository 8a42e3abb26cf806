"""March telemetry: step histograms, Hamiltonian drift, hit fractions.

The TPU build's invariants-audit observability (SURVEY.md §5.2/§5.5): the
reference tracks max |H| drift per trajectory and surfaces FPS/quality in a
HUD; here every march can be audited post-hoc from its MarchResult.
"""

from __future__ import annotations

import numpy as np

from blackhole_simulation_tpu.ops.ks_kernel import ks_hamiltonian
from blackhole_simulation_tpu.render.march import HIT_ESCAPE, HIT_HORIZON, MarchResult


def march_telemetry(result: MarchResult, bh) -> dict:
    """Summarize a MarchResult into a JSON-friendly dict."""
    hit = np.asarray(result.hit)
    steps = np.asarray(result.steps)
    # |H| of final states: escaped/captured rays should still sit near the
    # null surface (the fp32-regression canary).
    h_final = np.abs(np.asarray(ks_hamiltonian(bh.mass, bh.spin, result.state)))
    hist, edges = np.histogram(steps, bins=8)
    return {
        "n_rays": int(hit.size),
        "frac_escape": float((hit == HIT_ESCAPE).mean()),
        "frac_horizon": float((hit == HIT_HORIZON).mean()),
        "steps_p50": float(np.median(steps)),
        "steps_p99": float(np.percentile(steps, 99)),
        "steps_hist": {"counts": hist.tolist(), "edges": edges.tolist()},
        "h_drift_median": float(np.median(h_final)),
        "h_drift_p99": float(np.percentile(h_final, 99)),
        "disk_crossings_mean": float(np.asarray(result.n_crossings).mean()),
    }
