"""Windowed-posterior error study (VERDICT r4 item 3).

Quantifies the halo-window approximation at the PRODUCTION config
(K=60, N=2 pairwise overlaps, S=3600 — the TPU_PARITY fixture) and
splits the error into its two sources:

  * MIXING error — the windowed mode's cold-start boundary effect,
    measured in f64 on CPU (windowed_f64 vs exact_f64) as a function of
    the halo H;
  * F32 round-off — the in-window log-score drift at f32, measured as
    chained_f32 vs exact_f64 (the chained mode has NO mixing error, so
    the difference is pure dtype noise; the windowed mode carries BOTH).

Two phases so each runs on its natural backend:

  python scripts/posterior_error_study.py --phase cpu   # f64 references
  python scripts/posterior_error_study.py --phase tpu   # f32 on device
  python scripts/posterior_error_study.py --report      # print table

Writes/reads scripts/.posterior_study/*.npz; the committed summary lives
in BENCHMARKS.md (round 5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   ".posterior_study")
HS = [60, 120, 240, 480]
L = 4096
T = 1 << 15


def _fixture():
    from hmmspikesorter_tpu.data.synthetic import (create_signal_fast,
                                                   create_spike_template)
    from hmmspikesorter_tpu.models.api import HMMTemplateModel

    K, sigma = 60, 0.3
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y, _ = create_signal_fast(1 << 21, sigma, pp, temps,
                              rng=np.random.default_rng(1234))
    tm = HMMTemplateModel(temps, sigma, np.log(pp), allow_overlaps=True)
    return y[:T], tm


def phase_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from hmmspikesorter_tpu.core.posterior import (
        onset_posteriors, onset_posteriors_chained,
        onset_posteriors_windowed)

    y, tm = _fixture()
    os.makedirs(OUT, exist_ok=True)
    p_ex = onset_posteriors(tm, y)
    rec = {"exact_f64": p_ex}
    p_ch = onset_posteriors_chained(tm, y, L=L)
    rec["chained_f64"] = p_ch
    for H in HS:
        rec[f"windowed_f64_H{H}"] = onset_posteriors_windowed(
            tm, y, L=L, H=H)
        print(f"f64 windowed H={H} done", flush=True)
    np.savez_compressed(os.path.join(OUT, "cpu_f64.npz"), **rec)
    print("cpu phase written")


def phase_tpu():
    from hmmspikesorter_tpu.core.posterior import (
        onset_posteriors_chained, onset_posteriors_windowed)

    y, tm = _fixture()
    os.makedirs(OUT, exist_ok=True)
    rec = {}
    rec["chained_f32"] = onset_posteriors_chained(tm, np.float32(y), L=L)
    for H in HS:
        rec[f"windowed_f32_H{H}"] = onset_posteriors_windowed(
            tm, np.float32(y), L=L, H=H)
        print(f"f32 windowed H={H} done", flush=True)
    np.savez_compressed(os.path.join(OUT, "tpu_f32.npz"), **rec)
    print("tpu phase written")


def report():
    cpu = np.load(os.path.join(OUT, "cpu_f64.npz"))
    tpu = np.load(os.path.join(OUT, "tpu_f32.npz"))
    ex = cpu["exact_f64"]

    def mx(a, b):
        return float(np.abs(a - b).max())

    out = {
        "config": f"K=60 N=2 overlaps S=3600 T=2^15 L={L}",
        "chained_f64_vs_exact": mx(cpu["chained_f64"], ex),
        "f32_noise_floor_chained": mx(tpu["chained_f32"], ex),
        "mixing_f64_by_H": {str(H): mx(cpu[f"windowed_f64_H{H}"], ex)
                            for H in HS},
        "windowed_f32_total_by_H": {str(H): mx(tpu[f"windowed_f32_H{H}"],
                                               ex) for H in HS},
    }
    print(json.dumps(out, indent=1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["cpu", "tpu"])
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.phase == "cpu":
        phase_cpu()
    elif args.phase == "tpu":
        phase_tpu()
    if args.report:
        report()


if __name__ == "__main__":
    main()
