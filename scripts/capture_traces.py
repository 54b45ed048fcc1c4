"""Capture Perfetto/XPlane traces of the production decode + fused EM
(SURVEY §5.1 deliverable). Run from the repo root on a TPU backend:

    python scripts/capture_traces.py

Then: python benchmarks/trace_report.py traces/decode  (device-time
breakdown), or load traces/*/plugins/profile/*/vm.trace.json.gz at
ui.perfetto.dev."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from hmmspikesorter_tpu.core.events import _ring_overlap_save_events_impl
from hmmspikesorter_tpu.parallel.overlap_save import resolve_block_engine
from hmmspikesorter_tpu.train.em import EMTables, em_chain
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.data.synthetic import (create_signal_fast,
                                               create_spike_template)

N, K, sigma = 2, 60, 0.3
T, L, H = 1 << 21, 8192, 256
rng = np.random.default_rng(1234)
temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                  create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
pp = np.array([0.003, 0.001])
y, _ = create_signal_fast(T, sigma, pp, temps, rng=rng)
lp = np.log(pp)
dev = jax.devices()[0]
y_d = jax.device_put(jnp.asarray(y, jnp.float32), dev)
lp_d = jnp.asarray(lp, jnp.float32)
mu_d = jnp.asarray(temps, jnp.float32)
sg_d = jnp.asarray(sigma, jnp.float32)
be = resolve_block_engine("auto", True, K, N, L + 2 * H)

def decode():
    blob, _ = _ring_overlap_save_events_impl(y_d, lp_d, mu_d, sg_d, L=L,
                                             H=H, overlaps=True,
                                             block_engine=be)
    return np.asarray(blob)

decode()  # warm
out = "traces/decode"
with jax.profiler.trace(out):
    for _ in range(3):
        decode()
print("decode trace files:", [os.path.relpath(p, out) for p in
      glob.glob(out + "/**/*", recursive=True) if os.path.isfile(p)])

# fused EM chain
ss_tr = build_state_space(N, K, False)
tables = EMTables.build(ss_tr)
y_tr = jax.device_put(jnp.asarray(y[: 1 << 19], jnp.float32), dev)
o = em_chain(y_tr, lp_d, mu_d, sg_d, tables, K=K, n_iters=10,
             fb_mode="overlap_pallas", block=2048)
np.asarray(o[0])  # warm
out2 = "traces/em"
with jax.profiler.trace(out2):
    o = em_chain(y_tr, lp_d, mu_d, sg_d, tables, K=K, n_iters=10,
                 fb_mode="overlap_pallas", block=2048)
    np.asarray(o[0])
print("em trace files:", [os.path.relpath(p, out2) for p in
      glob.glob(out2 + "/**/*", recursive=True) if os.path.isfile(p)])
