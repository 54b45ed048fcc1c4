"""Drift-adaptive sorting walkthrough (beyond-reference capability):
spike waveforms grow 2x over the recording (electrode drift); a
stationary decode mis-detects the drifted spikes while the online-EM
tracker (train/adaptive.py) follows the drift and recovers the exact
spike train — then decodes every chunk with its own templates in ONE
parallel device program.

Run from the repo root:  python examples/drift_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmmspikesorter_tpu.data.synthetic import (  # noqa: E402
    create_drifting_signal, create_spike_template)
from hmmspikesorter_tpu.models import api  # noqa: E402
from hmmspikesorter_tpu.train.adaptive import (  # noqa: E402
    decode_tracked, track_drift)


def onset_errors(model, truth, tol=2):
    """False + missed detections under a one-to-one greedy matching of
    decoded to true onsets within +-tol samples (two-pointer over the
    sorted lists, so a double-detection can never cancel a miss)."""
    total = 0
    for n in range(truth.shape[0]):
        to = np.sort(np.nonzero(truth[n] == 1)[0])
        dec = np.sort(np.asarray(model.spike_onsets[n], np.int64))
        i = j = hit = 0
        while i < len(dec) and j < len(to):
            if abs(int(dec[i]) - int(to[j])) <= tol:
                hit += 1
                i += 1
                j += 1
            elif dec[i] < to[j] - tol:
                i += 1
            else:
                j += 1
        total += (len(dec) - hit) + (len(to) - hit)
    return total


def main():
    K, T, sigma = 60, 1 << 18, 0.3
    rng = np.random.default_rng(11)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.0015, 0.0008])
    y, truth, scale_at = create_drifting_signal(
        T, sigma, pp, temps, scale_start=1.0, scale_end=2.0, rng=rng)
    tm = api.HMMTemplateModel(temps, sigma, np.log(pp),
                              allow_overlaps=True)
    counts = [int((truth[n] == 1).sum()) for n in range(2)]
    print(f"T={T}, amplitude drift 1.0 -> 2.0, truth counts {counts}")

    # stationary production decode: the start-of-recording templates
    m_static = api.fit_spiking_model_fast(tm, y, transfer="events")
    print(f"static decode:  {[len(o) for o in m_static.spike_onsets]} "
          f"onsets, {onset_errors(m_static, truth)} onset errors")

    # online tracking (one EM pass worth of work) + tracked decode
    tr = track_drift(tm, y, chunk=32768, forget=0.4)
    m = decode_tracked(tr, y)
    print(f"tracked decode: {[len(o) for o in m.spike_onsets]} "
          f"onsets, {onset_errors(m, truth)} onset errors, "
          f"ll finite: {bool(np.isfinite(m.ll))}")

    amp0 = np.abs(temps[:, 0]).max()
    print("\nchunk  tracked-amp  true-amp  chunk-ll")
    for c, (s, e) in enumerate(tr.bounds):
        a = np.abs(tr.mu[c, :, 0]).max() / amp0
        t = scale_at((s + e) / 2)[0]
        print(f"{c:>5}  {a:>10.3f}  {t:>8.3f}  {tr.lls[c]:>9.0f}")

    # the one-call convenience wrapper does both steps
    m2 = api.fit_spiking_model_adaptive(tm, y, chunk=32768, forget=0.4)
    assert (np.asarray(m2.ml_seq) == np.asarray(m.ml_seq)).all()
    print("\nfit_spiking_model_adaptive labels identical: True")

    # reconstruction uses each chunk's own templates; confidence scores
    # each spike under the chunk parameters that decoded it
    from hmmspikesorter_tpu.core.posterior import spike_confidence

    q_tr = 1.0 - np.std(y - api.predict(m2)) / np.std(y)
    q_st = 1.0 - np.std(y - api.predict(m_static)) / np.std(y)
    print(f"reconstruction quality: tracked {q_tr:.3f} vs "
          f"stationary {q_st:.3f}")
    conf = spike_confidence(m2)
    print("confidence medians:",
          [round(float(np.median(c)), 3) for c in conf])


if __name__ == "__main__":
    main()
