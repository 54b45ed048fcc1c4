"""Hardware probe: dense-label transfer vs packed-event (single-blob)
transfer on the production bench decode (N=2 K=60 overlaps T=2^21)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hmmspikesorter_tpu.core.events import (
    _parse_event_blob, _ring_overlap_save_events_impl, labels_from_onsets,
    onsets_from_packed)
from hmmspikesorter_tpu.parallel.overlap_save import (
    ring_overlap_save, resolve_block_engine)
from hmmspikesorter_tpu.data.synthetic import (create_signal_fast,
                                               create_spike_template)

N, K, sigma = 2, 60, 0.3
T = 1 << 21
L, H = 8192, 256
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

def run_dense():
    x, ok = ring_overlap_save(y_d, lp_d, mu_d, sigma, L=L, H=H, overlaps=True)
    return np.asarray(x), np.asarray(ok)

x_dense, ok = run_dense()
td = []
for _ in range(5):
    t0 = time.perf_counter(); run_dense(); td.append(time.perf_counter() - t0)
print("dense  best:", round(min(td)*1e3,1), "ms ->", round(T/min(td)/1e6,1), "M samples/s")

be = resolve_block_engine("auto", True, K, N, L + 2 * H)
def run_ev():
    blob, _x = _ring_overlap_save_events_impl(
        y_d, lp_d, mu_d, jnp.asarray(sigma, jnp.float32), L=L, H=H,
        overlaps=True, block_engine=be)
    return np.asarray(blob)

blob = run_ev()
te = []
for _ in range(5):
    t0 = time.perf_counter(); run_ev(); te.append(time.perf_counter() - t0)
print("events best:", round(min(te)*1e3,1), "ms ->", round(T/min(te)/1e6,1), "M samples/s")

pk, cn, x0, okk = _parse_event_blob(blob, T=T, N=N, K=K, B=T//L)
print("counts:", cn, "seam_ok all:", okk.all(), "blob bytes:", blob.nbytes)
onsets = onsets_from_packed(pk, cn, K=K)
t0 = time.perf_counter()
xr = labels_from_onsets(onsets, x0, T=T, N=N, K=K, overlaps=True)
print("host reconstruction s:", round(time.perf_counter() - t0, 3))
print("reconstruction bit-equal:", bool((xr == x_dense.astype(np.int32)).all()))
