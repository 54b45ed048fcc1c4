"""Multi-host entry point: initialize the distributed runtime, build the
(channel, time) mesh, and run sharded decode / EM across a TPU pod slice.

The reference has no distributed story (SURVEY.md §5.8); this is the
framework's production launcher for BASELINE config 5 (64 channels x 10M
samples, time-block sharded with boundary collectives over ICI).

Usage (one invocation per host, standard TPU pod launch):

    python -m hmmspikesorter_tpu.parallel.runner --channels 64 \
        --samples 10000000 --time-shards 4 [--coordinator host:port]

On a single process with multiple local devices it runs without
jax.distributed (the mesh spans local devices). Emits one JSON line of
results per phase.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_mesh(time_shards: int | None = None,
              channel_shards: int | None = None, *, config=None):
    """Build a (channel, time) mesh over all visible devices.

    A config.Config's mesh section supplies shard counts not passed
    explicitly (SURVEY.md §5.6)."""
    import jax
    from jax.sharding import Mesh

    from ..config import UNSET, _section

    mc = _section(config, "mesh")
    if time_shards is None and mc("time_shards") not in (UNSET, None):
        time_shards = mc("time_shards")
    if channel_shards is None and mc("channel_shards") not in (UNSET, None):
        channel_shards = mc("channel_shards")

    devs = np.array(jax.devices())
    n = len(devs)
    if time_shards is None:
        time_shards = n if channel_shards is None else n // channel_shards
    if channel_shards is None:
        channel_shards = n // time_shards
    if time_shards * channel_shards != n:
        raise ValueError(
            f"{time_shards} x {channel_shards} != {n} devices")
    return Mesh(devs.reshape(channel_shards, time_shards),
                ("channel", "time"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--samples", type=int, default=1 << 20)
    ap.add_argument("--time-shards", type=int, default=None)
    ap.add_argument("--channel-shards", type=int, default=None)
    ap.add_argument("--coordinator", default=None,
                    help="host:port for jax.distributed.initialize "
                         "(multi-host runs)")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--em-iters", type=int, default=2)
    ap.add_argument("--K", type=int, default=60)
    ap.add_argument("--block", type=int, default=4096)
    args = ap.parse_args(argv)

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)

    from ..core.state_space import build_state_space
    from ..data.synthetic import create_signal, create_spike_template
    from ..train.em import EMTables
    from .sharded_em import sharded_em_step

    mesh = make_mesh(args.time_shards, args.channel_shards)
    K = args.K
    N = 2
    sigma = 0.3
    tdev = mesh.shape["time"]
    L = args.block
    T = -(-args.samples // (tdev * L)) * (tdev * L)
    C = max(args.channels, mesh.shape["channel"])

    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    rng = np.random.default_rng(0)
    ys = np.stack([create_signal(T, sigma, pp, temps, rng=rng)[0]
                   for _ in range(C)]).astype(np.float32)

    ss = build_state_space(N, K, False)
    tables = EMTables.build(ss)
    lp = np.log(pp)

    lps = np.stack([lp] * C)
    mus = np.stack([temps] * C)
    sigmas = np.full(C, sigma)

    # warm + timed EM steps (dp x sp sharded)
    out = sharded_em_step(ys, lps, mus, sigmas, tables, mesh, K=K, L=L)
    jax.block_until_ready(out[0])
    t0 = time.time()
    for _ in range(args.em_iters):
        out = sharded_em_step(ys, np.asarray(out[0]), np.asarray(out[2]),
                              np.asarray(out[3]), tables, mesh, K=K, L=L)
        jax.block_until_ready(out[0])
    elapsed = time.time() - t0
    print(json.dumps({
        "phase": "sharded_em",
        "mesh": dict(mesh.shape),
        "channels": C, "samples": T,
        "em_iter_per_s": round(args.em_iters / elapsed, 4),
        "samples_per_s": round(args.em_iters * C * T / elapsed, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
