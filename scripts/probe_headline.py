"""Dissect the bench.py headline wall time: device compute vs blob
transfer vs host label reconstruction, at pipeline depths 1 and 2.

Run on the TPU backend. Prints one JSON line per probe.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hmmspikesorter_tpu.core.events import (
        _parse_event_blob, _ring_overlap_save_events_impl,
        labels_from_onsets, onsets_from_packed)
    from hmmspikesorter_tpu.parallel.overlap_save import resolve_block_engine
    from hmmspikesorter_tpu.data.synthetic import (
        create_signal_fast, create_spike_template)

    N, K, sigma = 2, 60, 0.3
    T = 1 << 21
    L, H = 8192, 256

    rng = np.random.default_rng(1234)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y, _ = create_signal_fast(T, sigma, pp, temps, rng=rng)

    dev = jax.devices()[0]
    dtype = jnp.float32
    lp = np.log(pp)
    lp_d = jnp.asarray(lp, dtype)
    mu_d = jnp.asarray(temps, dtype)
    y_d = jax.device_put(jnp.asarray(y, dtype), dev)
    sg_d = jnp.asarray(sigma, dtype)
    be = resolve_block_engine("auto", True, K, N, L + 2 * H)
    Bn = T // L

    def run_ev():
        return _ring_overlap_save_events_impl(y_d, lp_d, mu_d, sg_d, L=L,
                                              H=H, overlaps=True,
                                              block_engine=be)[0]

    def fetch(blob):
        return np.asarray(blob)

    def reconstruct(raw):
        pk, cn, x0, ok = _parse_event_blob(raw, T=T, N=N, K=K, B=Bn)
        return labels_from_onsets(onsets_from_packed(pk, cn, K=K), x0,
                                  T=T, N=N, K=K, overlaps=True)

    raw = fetch(run_ev())                        # warmup/compile
    print(json.dumps({"probe": "blob_bytes", "value": int(raw.nbytes)}))

    R = 6

    # (a) device-only floor: R dispatches, one final tiny fetch
    t0 = time.perf_counter()
    for _ in range(R - 1):
        run_ev()
    fetch(run_ev())
    dt = (time.perf_counter() - t0) / R
    print(json.dumps({"probe": "device_chain_ms", "value": round(dt * 1e3, 2),
                      "sps": round(T / dt / 1e6, 1)}))

    # (b) + per-iter blob fetch, depth-1 pipeline
    t0 = time.perf_counter()
    prev = run_ev()
    for _ in range(R - 1):
        nxt = run_ev()
        fetch(prev)
        prev = nxt
    fetch(prev)
    dt = (time.perf_counter() - t0) / R
    print(json.dumps({"probe": "fetch_d1_ms", "value": round(dt * 1e3, 2),
                      "sps": round(T / dt / 1e6, 1)}))

    # (c) + host reconstruction, depth-1 (bench.py as-is)
    t0 = time.perf_counter()
    prev = run_ev()
    for _ in range(R - 1):
        nxt = run_ev()
        reconstruct(fetch(prev))
        prev = nxt
    reconstruct(fetch(prev))
    dt = (time.perf_counter() - t0) / R
    print(json.dumps({"probe": "full_d1_ms", "value": round(dt * 1e3, 2),
                      "sps": round(T / dt / 1e6, 1)}))

    # (d) + host reconstruction, depth-2
    t0 = time.perf_counter()
    q = [run_ev(), run_ev()]
    for _ in range(R - 2):
        q.append(run_ev())
        reconstruct(fetch(q.pop(0)))
    for b in q:
        reconstruct(fetch(b))
    dt = (time.perf_counter() - t0) / R
    print(json.dumps({"probe": "full_d2_ms", "value": round(dt * 1e3, 2),
                      "sps": round(T / dt / 1e6, 1)}))

    # (e) host reconstruction alone (blob already on host)
    t0 = time.perf_counter()
    for _ in range(R):
        reconstruct(raw)
    dt = (time.perf_counter() - t0) / R
    print(json.dumps({"probe": "reconstruct_ms", "value": round(dt * 1e3, 2)}))

    # (f) blob fetch alone, device idle
    blob = run_ev()
    fetch(blob)
    t0 = time.perf_counter()
    for _ in range(R):
        fetch(blob)
    dt = (time.perf_counter() - t0) / R
    print(json.dumps({"probe": "fetch_idle_ms", "value": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    main()
