"""Multi-channel walkthrough (beyond-reference capability — the reference
pipeline keeps electrode channel 1 only, src/hmmsort.jl:56):

  1. synthesize a 4-electrode recording where two cells are nearly
     identical on channel 1 but separable jointly;
  2. learn per-channel templates + per-channel noise with MC Baum-Welch
     (fb_mode auto: fused Pallas kernels on TPU, halo-window XLA engine
     elsewhere, gather for short signals);
  3. decode ONE spike train jointly from all channels with the fast
     overlap-save path (auto MC Pallas kernel on TPU);
  4. report per-neuron spike counts vs truth.

Run from the repo root:  python examples/multichannel_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.io.extraction import extract_spiketimes
from hmmspikesorter_tpu.models.multichannel import (
    HMMTemplateModelMC, fit_spiking_model_mc_fast)
from hmmspikesorter_tpu.train.em_mc import train_model_mc

K, N, C, T = 60, 2, 4, 60_000
rng = np.random.default_rng(0)
temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                  create_spike_template(K, 3.05, 0.8, 0.2)], axis=1)
# channel 1 sees the two cells almost identically; the other electrodes
# pick them up with distinct gains — only the JOINT decode separates them
gains = np.array([[1.00, 0.15, 0.90, 0.30],
                  [0.98, 0.95, 0.10, 0.75]])              # (N, C)
mu_true = temps[:, :, None] * gains[None]
sig_true = np.array([0.30, 0.25, 0.28, 0.32])
pp = np.array([0.004, 0.003])

_, truth = create_signal(T, 0.0, pp, temps, rng=rng)
yc = sig_true * rng.standard_normal((T, C))
for n in range(N):
    k = truth[n]
    m = k > 0
    yc[m] += mu_true[k[m] - 1, n]

# --- 2. learn the model from scratch (train -> surgery -> train)
model, pi, lls = train_model_mc(yc, n_neurons=4, K=K, nsteps=10,
                                rng=np.random.default_rng(1))
print(f"training: {model.mu.shape[1]} templates survive, "
      f"ll {lls[0]:.0f} -> {lls[-1]:.0f}")
print(f"learned sigmas {np.round(np.asarray(model.sigmas), 3)} "
      f"(true {sig_true})")

# --- 3. joint decode with the TRUE templates (production fast path)
tmc = HMMTemplateModelMC(mu=mu_true, sigmas=sig_true, lp=np.log(pp),
                         allow_overlaps=True)
decoded = fit_spiking_model_mc_fast(tmc, yc, L=8192, H=256)
print(f"decode ll = {float(decoded.ll):.1f} (always finite)")

# --- 4. spike counts vs truth
st = extract_spiketimes(decoded)
for n in range(N):
    tc = int((np.diff((truth[n] > 0).astype(int)) == 1).sum()
             + (truth[n][0] > 0))
    print(f"neuron {n}: decoded {len(st[n])} spikes (truth {tc})")
