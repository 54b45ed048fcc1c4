"""Virtual-mesh scaling curves (VERDICT round-1 item 7; r4 item 6).

Real multi-host TPU is unavailable in this environment, so this measures
the thing that *can* be measured honestly, on a virtual D-device CPU mesh
(XLA CPU backs each virtual device with host threads, so collective
overhead and serialization are real, FLOPs are real, only the
interconnect is loopback):

  --mode strong  (default)  fixed TOTAL work: wall time per D, speedup
    vs D=1, efficiency speedup/D. On an oversubscribable host this
    mostly measures the host, not the collectives.
  --mode weak    fixed PER-DEVICE work (T = D * T0): perfect scaling
    keeps wall time flat, so efficiency = wall(D=1)/wall(D) isolates
    the boundary-exchange/collective overhead — the quantity the >=80%
    BASELINE two-host target is actually about.

Run:  python benchmarks/scaling.py [--mode weak]   (forces CPU + 8 dev)
Prints one JSON line per (phase, D).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _bench(fn, reps=3):
    fn()                                    # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def weak_scaling():
    """Fixed per-device work: T = D * T0. Perfect scaling keeps wall
    flat; the droop is the collective + serialization overhead."""
    from jax.sharding import Mesh

    from hmmspikesorter_tpu.core.emission import state_means
    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu.data.synthetic import (create_signal_fast,
                                                   create_spike_template)
    from hmmspikesorter_tpu.parallel.sharded import sharded_blocked_viterbi
    from hmmspikesorter_tpu.parallel.sharded_em import sharded_em_step
    from hmmspikesorter_tpu.train.em import EMTables

    N, K, sigma = 2, 60, 0.3
    T0 = 1 << 15                       # per-device samples
    L = 256
    rng = np.random.default_rng(1234)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y_full, _ = create_signal_fast(8 * T0, sigma, pp, temps, rng=rng)
    lp = np.log(pp)
    ss = build_state_space(N, K, False)
    in_idx, in_w = ss.in_table(lp)
    dtype = jnp.float32
    in_idx = jnp.asarray(in_idx)
    in_w = jnp.asarray(in_w, dtype)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps, dtype))
    tables = EMTables.build(ss)

    devs = np.array(jax.devices())
    ncores = os.cpu_count() or 1
    print(json.dumps({"mode": "weak", "host_cores": ncores,
                      "per_device_T": T0,
                      "note": "efficiency = wall(D=1)/wall(D); virtual "
                              "devices beyond the physical core count "
                              "oversubscribe"}), flush=True)
    results = []
    base = {}
    for D in (1, 2, 4, 8):
        if D > ncores:
            break
        mesh = Mesh(devs[:D].reshape(1, D), ("channel", "time"))
        T = D * T0
        y_d = jnp.asarray(y_full[:T], dtype)

        def dec():
            x, ll = sharded_blocked_viterbi(y_d, in_idx, in_w, smu,
                                            sigma, mesh, L=L)
            return np.asarray(x)

        t_dec = _bench(dec)
        base.setdefault("dec", t_dec)
        r = {"phase": "weak_sharded_decode", "D": D, "T": T, "L": L,
             "wall_s": round(t_dec, 4),
             "efficiency": round(base["dec"] / t_dec, 3)}
        print(json.dumps(r), flush=True)
        results.append(r)

        ys = y_full[None, :T].astype(np.float32)
        lps = lp[None, :]
        mus = temps[None]
        sgs = np.array([sigma])

        def em_ov():
            out = sharded_em_step(ys, lps, mus, sgs, tables, mesh, K=K,
                                  L=512, fb_mode="overlap", H=240)
            return np.asarray(out[0])

        t_ov = _bench(em_ov)
        base.setdefault("em", t_ov)
        r = {"phase": "weak_sharded_em_overlap", "D": D, "T": T, "L": 512,
             "H": 240, "wall_s": round(t_ov, 4),
             "efficiency": round(base["em"] / t_ov, 3)}
        print(json.dumps(r), flush=True)
        results.append(r)
    return results


def main():
    from jax.sharding import Mesh

    from hmmspikesorter_tpu.core.emission import state_means
    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu.data.synthetic import (create_signal_fast,
                                                   create_spike_template)
    from hmmspikesorter_tpu.parallel.sharded import sharded_blocked_viterbi
    from hmmspikesorter_tpu.parallel.sharded_em import sharded_em_step
    from hmmspikesorter_tpu.train.em import EMTables

    N, K, sigma = 2, 60, 0.3
    T = 1 << 17
    L = 256
    rng = np.random.default_rng(1234)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y, _ = create_signal_fast(T, sigma, pp, temps, rng=rng)
    lp = np.log(pp)
    ss = build_state_space(N, K, False)
    in_idx, in_w = ss.in_table(lp)
    dtype = jnp.float32
    in_idx = jnp.asarray(in_idx)
    in_w = jnp.asarray(in_w, dtype)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps, dtype))
    y_d = jnp.asarray(y, dtype)
    tables = EMTables.build(ss)

    devs = np.array(jax.devices())
    ncores = os.cpu_count() or 1
    print(json.dumps({"host_cores": ncores,
                      "note": "virtual devices beyond the physical core "
                              "count oversubscribe and do not measure "
                              "scaling; XLA-CPU intra-op threading also "
                              "lets D=1 use several cores, so these "
                              "efficiencies are lower bounds"}), flush=True)
    results = []
    base_dec = base_em = None
    for D in (1, 2, 4, 8):
        if D > ncores:
            break
        mesh = Mesh(devs[:D].reshape(1, D), ("channel", "time"))

        def dec():
            x, ll = sharded_blocked_viterbi(y_d, in_idx, in_w, smu, sigma,
                                            mesh, L=L)
            return np.asarray(x)

        t_dec = _bench(dec)
        if D == 1:
            base_dec = t_dec
        r = {"phase": "sharded_decode", "D": D, "T": T, "L": L,
             "wall_s": round(t_dec, 4),
             "speedup": round(base_dec / t_dec, 3),
             "efficiency": round(base_dec / t_dec / D, 3)}
        print(json.dumps(r), flush=True)
        results.append(r)

        ys = y[None, :].astype(np.float32)
        lps = lp[None, :]
        mus = temps[None]
        sgs = np.array([sigma])

        def em():
            out = sharded_em_step(ys, lps, mus, sgs, tables, mesh, K=K, L=L)
            return np.asarray(out[0])

        t_em = _bench(em)
        if D == 1:
            base_em = t_em
        r = {"phase": "sharded_em", "D": D, "T": T, "L": L,
             "wall_s": round(t_em, 4),
             "speedup": round(base_em / t_em, 3),
             "efficiency": round(base_em / t_em / D, 3)}
        print(json.dumps(r), flush=True)
        results.append(r)

        def em_ov():
            out = sharded_em_step(ys, lps, mus, sgs, tables, mesh, K=K,
                                  L=512, fb_mode="overlap", H=240)
            return np.asarray(out[0])

        t_ov = _bench(em_ov)
        if D == 1:
            base_ov = t_ov
        r = {"phase": "sharded_em_overlap", "D": D, "T": T, "L": 512,
             "H": 240, "wall_s": round(t_ov, 4),
             "speedup": round(base_ov / t_ov, 3),
             "efficiency": round(base_ov / t_ov / D, 3)}
        print(json.dumps(r), flush=True)
        results.append(r)

        # joint multi-channel EM, time-sharded (one model over C channels)
        from hmmspikesorter_tpu.parallel.sharded_em import sharded_em_step_mc

        C = 4
        rng_mc = np.random.default_rng(7)
        yc = (y[:, None] * (0.3 + rng_mc.random(C))[None, :]
              + 0.1 * rng_mc.standard_normal((T, C))).astype(np.float32)
        mu_mc = np.repeat(temps[:, :, None], C, axis=2).astype(np.float32)
        sg_mc = np.full(C, sigma, np.float32)

        def em_mc():
            out = sharded_em_step_mc(yc, lp, mu_mc, sg_mc, tables, mesh,
                                     K=K, L=512, H=240, time_axis="time")
            return np.asarray(out[0])

        t_mc = _bench(em_mc)
        if D == 1:
            base_mc = t_mc
        r = {"phase": "sharded_em_mc", "D": D, "T": T, "C": C, "L": 512,
             "H": 240, "wall_s": round(t_mc, 4),
             "speedup": round(base_mc / t_mc, 3),
             "efficiency": round(base_mc / t_mc / D, 3)}
        print(json.dumps(r), flush=True)
        results.append(r)
    return results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["strong", "weak"],
                    default="strong")
    args = ap.parse_args()
    weak_scaling() if args.mode == "weak" else main()
