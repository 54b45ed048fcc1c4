"""Device-time breakdown from a jax.profiler xplane capture.

SURVEY §5.1 deliverable: Perfetto-compatible traces
(`vm.trace.json.gz` — load at ui.perfetto.dev) plus this report, which
parses the raw `vm.xplane.pb` device plane and prints where the TPU time
goes, per XLA op group with framework source attribution.

Capture (see scripts/capture_traces.py):
    with jax.profiler.trace("traces/decode"):
        decode()

Report:
    python benchmarks/trace_report.py traces/decode
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, pbs[-1]


def device_op_breakdown(xs):
    """Aggregate device-plane op events: name -> (total_ps, count, source).
    Also returns the module-level totals (one entry per executed program).
    """
    ops = collections.defaultdict(lambda: [0, 0, ""])
    modules = []
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        stats_meta = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    modules.append(
                        (ev_meta[ev.metadata_id].name, ev.duration_ps))
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                src = ""
                for st in ev.stats:
                    nm = stats_meta.get(st.metadata_id, "")
                    if nm in ("source_info", "tf_op"):
                        # XPlane interns strings: a ref_value indexes into
                        # stat_metadata (str_value is only used inline)
                        src = (st.str_value
                               or stats_meta.get(st.ref_value, ""))
                # group by op kind: strip trailing .N indices
                name = md.name
                base = name.rstrip("0123456789.")
                rec = ops[base]
                rec[0] += ev.duration_ps
                rec[1] += 1
                if src and not rec[2]:
                    rec[2] = src
    return ops, modules


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args(argv)
    xs, pb = load_xspace(args.trace_dir)
    ops, modules = device_op_breakdown(xs)
    total = sum(v[0] for v in ops.values())
    print(f"# {pb}")
    for name, dur in modules:
        print(f"module execution: {name[:60]:60s} {dur / 1e9:9.3f} ms")
    print(f"\ndevice op total: {total / 1e9:.3f} ms")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])[: args.top]
    for name, (ps, n, src) in rows:
        print(f"{ps / 1e9:9.3f} ms {100.0 * ps / total:5.1f}%  x{n:<4d} "
              f"{name[:40]:40s} {src[:60]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
