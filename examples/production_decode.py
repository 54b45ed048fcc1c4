"""Production decode walkthrough: the unified Config, the fast
overlap-save engine (auto-selected Pallas kernels on TPU), seam repair,
and the always-finite reference ll.

Run:  python examples/production_decode.py        (CPU or TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmmspikesorter_tpu import Config, DecodeConfig
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.io.extraction import extract_spiketimes
from hmmspikesorter_tpu.models import api

# -- synthetic recording: 2 known templates + Gaussian noise ---------------
K, sigma = 60, 0.3
temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                  create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
pp = np.array([0.003, 0.001])
rng = np.random.default_rng(42)
y, _ = create_signal(100_000, sigma, pp, temps, rng=rng)

# -- decode with known templates (the CLI scenario), fast engine -----------
cfg = Config(decode=DecodeConfig(engine="fast", L=8192, streaming=False))
tm = api.HMMTemplateModel(mu=temps, sigma=sigma, lp=np.log(pp),
                          allow_overlaps=True)
model = api.fit_spiking_model_fast(tm, y, config=cfg)

print(f"decoded {len(model.ml_seq)} samples")
print(f"ll = {model.ll:.2f} (reference cumulative-score contract, "
      f"finite on every topology)")
print(f"seams: {int(np.asarray(model.seam_ok).sum())}/"
      f"{len(np.asarray(model.seam_ok))} silence-certified, "
      f"{model.seams_repaired} repaired")
print(f"bic = {api.bic(model):.1f}")

# -- spike times per neuron ------------------------------------------------
for n, times in enumerate(extract_spiketimes(model)):
    print(f"neuron {n}: {len(times)} spikes"
          + (f", first at sample {times[0]}" if len(times) else ""))

# -- sparse event transfer (the production D2H path) ------------------------
# transfer="events" ships a packed onset grid instead of the dense labels
# (~16x smaller at K=60 — the label copy dominates e2e wall time on
# remote-attached hosts) and reconstructs the labels exactly; the decoded
# onsets come along for free and map straight to extraction timestamps.
from hmmspikesorter_tpu.io.extraction import extract_spiketimes_from_onsets

m_ev = api.fit_spiking_model_fast(tm, y, config=cfg, transfer="events")
assert (m_ev.ml_seq == model.ml_seq).all() and m_ev.ll == model.ll
t_ev = extract_spiketimes_from_onsets(m_ev.spike_onsets, temps,
                                      x0=int(m_ev.ml_seq[0]), T=len(y))
assert all(np.array_equal(a, b)
           for a, b in zip(t_ev, extract_spiketimes(model)))
print("events transfer: labels, ll, and spike times identical "
      f"({sum(len(o) for o in m_ev.spike_onsets)} onsets shipped instead "
      f"of {len(y)} labels)")

# integer recordings (int16 ADC data) can be passed raw — the cast to
# float happens in-graph (exact), halving the host->device transfer:
#   api.fit_spiking_model_fast(tm_scaled, y_int16, config=cfg)

# -- per-spike posterior confidence + quality-scored unit files ------------
# (beyond reference): forward-backward onset mass behind each MAP spike;
# windowed=True runs halo windows in parallel (~16x the exact two-pass)
from hmmspikesorter_tpu.core.posterior import spike_confidence
from hmmspikesorter_tpu.io.extraction import extract_units

confs = spike_confidence(m_ev, windowed=True)
for n, c in enumerate(confs):
    if len(c):
        print(f"neuron {n}: confidence median {np.median(c):.3f}, "
              f"min {np.min(c):.3f}")
units = extract_units(m_ev, 1, with_confidence=True,
                      confidence_kwargs={"windowed": True})
print(f"unit files ready: {sorted(units)} (each with timestamps, "
      "waveform, and per-spike confidence)")

# -- reconstruction quality ------------------------------------------------
recon = api.predict(model)
q = 1 - np.std(recon - y) / np.std(y)
print(f"reconstruction quality 1 - std(err)/std(y) = {q:.4f}")
