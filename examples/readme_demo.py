"""README walkthrough (reference src/example.jl / README.md:11-40 analog):
synthesize a 2-cell recording, train templates from scratch, decode, and
report reconstruction quality + extracted spike counts. Saves a plot when
matplotlib is available.

Run from the repo root:  python examples/readme_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmmspikesorter_tpu.data.synthetic import (  # noqa: E402
    create_signal, create_spike_template)
from hmmspikesorter_tpu.io import extraction  # noqa: E402
from hmmspikesorter_tpu.models import api  # noqa: E402


def main():
    K, T, sigma = 60, 20_000, 0.3
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    rng = np.random.default_rng(1234)
    y, truth = create_signal(T, sigma, pp, temps, rng=rng)

    print("Training templates from scratch (Baum-Welch + merge/prune)...")
    model = api.fit(y, n_neurons=7, K=K, nsteps=10,
                    rng=np.random.default_rng(1))
    tm = model.template_model
    print(f"  -> {tm.n_neurons} templates, sigma={tm.sigma:.4f}")

    recon = api.predict(model)
    q = 1 - np.std(recon - y) / np.std(y)
    print(f"Reconstruction quality 1 - std(Y-S)/std(S): {q:.4f}")
    print(f"BIC: {api.bic(model):.1f}")

    spikes = extraction.extract_spiketimes(model)
    for i, ts in enumerate(spikes):
        print(f"  neuron {i}: {len(ts)} spikes")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
        sl = slice(0, 4000)
        ax1.plot(y[sl], lw=0.4, label="signal")
        ax1.plot(recon[sl], lw=0.8, label="reconstruction")
        ax1.legend(); ax1.set_title("decoded reconstruction")
        ax2.plot(tm.mu)
        ax2.set_title("learned templates")
        out = os.path.join(os.path.dirname(__file__), "readme_demo.png")
        fig.savefig(out, dpi=110, bbox_inches="tight")
        print(f"Plot saved to {out}")
    except ImportError:
        print("(matplotlib not available — skipping plot)")


if __name__ == "__main__":
    main()
