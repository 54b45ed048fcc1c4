"""Per-spike confidence walkthrough (beyond-reference capability):
decode a recording, then score every decoded spike by the posterior
onset mass actually supporting it (core/posterior.py), and show how the
score separates clean spikes from marginal ones as the noise grows.

Run from the repo root:  python examples/confidence_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmmspikesorter_tpu.core import posterior  # noqa: E402
from hmmspikesorter_tpu.data.synthetic import (  # noqa: E402
    create_signal, create_spike_template)
from hmmspikesorter_tpu.models import api  # noqa: E402


def main():
    K, T = 60, 20_000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])

    for sigma in (0.3, 0.9):
        rng = np.random.default_rng(7)
        y, truth = create_signal(T, sigma, pp, temps, rng=rng)
        tm = api.HMMTemplateModel(temps, sigma, np.log(pp),
                                  allow_overlaps=True)
        model = api.fit_spiking_model_fast(tm, y, transfer="events")
        # the default is EXACT at any length: long recordings route to
        # the chained parallel two-pass (fused Pallas kernels on the
        # non-overlap topologies); windowed=True remains as the cheaper
        # halo-window approximation
        confs = posterior.spike_confidence(model)
        print(f"sigma={sigma}:")
        for n in range(2):
            c = np.asarray(confs[n])
            t_count = int((truth[n] == 1).sum())
            if len(c):
                print(f"  neuron {n}: {len(c)} decoded (truth {t_count}); "
                      f"confidence median {np.median(c):.3f}, "
                      f"min {c.min():.3f}, "
                      f"{int((c < 0.5).sum())} spikes below 0.5")
            else:
                print(f"  neuron {n}: none decoded (truth {t_count})")

        # marginal onset curves are also available directly:
        p = posterior.onset_posteriors(tm, y)
        print(f"  posterior expected spike counts: "
              f"{p.sum(axis=0).round(1)} "
              f"(truth {[int((truth[n] == 1).sum()) for n in range(2)]})")


if __name__ == "__main__":
    main()
