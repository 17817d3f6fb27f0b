"""Capture a jax.profiler trace of the production cellpad run and print the
top device ops by total time (tensorboard_plugin_profile xplane parsing)."""
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec


def main():
    sc = scenes.obmd_dpd_scene(scale=float(os.environ.get("BENCH_SCALE", "8")),
                               seed=7)
    cfg = sc.cfg.finalize()
    state = setup(cfg, sc.state)
    state = equilibrate(cfg, state, int(os.environ.get("PROF_EQUIL", "300")))
    np.asarray(state.x)

    # mirror bench.py's production repack (occupancy-tight cell capacity)
    cap = int(os.environ.get("PROF_CAP", "16"))
    if cap != cfg.capacity.cell_capacity:
        import dataclasses
        from obmd_tpu.cellpad import layout_build
        cfg = dataclasses.replace(
            cfg, capacity=dataclasses.replace(
                cfg.capacity, cell_capacity=cap)).finalize()
        geom = ec.make_geometry(cfg)
        state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)

    nsteps = int(os.environ.get("PROF_STEPS", "39"))
    run = ec.make_run_cellpad(cfg, nsteps)
    state = run(state)
    np.asarray(state.x)

    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        state = run(state)
        np.asarray(state.x)

    # parse the xplane and aggregate device-op durations
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    print("xplanes:", paths)
    agg = {}
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            print("plane:", plane.name, len(plane.lines))
            if ("TPU" not in plane.name and "tpu" not in plane.name.lower()
                    and "axon" not in plane.name.lower()):
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    d = ev.duration_ps / 1e9  # ms
                    a = agg.setdefault(name, [0.0, 0])
                    a[0] += d
                    a[1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"total device op-time {total:.1f} ms over {nsteps} steps")
    for name, (t, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{t:9.2f} ms  x{c:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
