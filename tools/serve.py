#!/usr/bin/env python
"""Serve renders from a trained checkpoint over HTTP.

Usage:
  python tools/serve.py --saved_dir exp1 --jsonfile srncar.json --port 8000

Then:
  curl localhost:8000/healthz
  curl -X POST localhost:8000/render \
      -d '{"obj": 0, "azimuth": 1.0, "elevation": 0.3, "radius": 1.3}' \
      -o frame.png
  curl localhost:8000/stats
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--saved_dir", type=str, required=True)
    ap.add_argument("--jsonfile", type=str, default="srncar.json")
    ap.add_argument("--exps_root", type=str, default="exps")
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--warmup", type=str, default="128x128",
                    help="comma-separated HxW sizes to pre-compile at boot "
                         "('' to skip); first request is then compile-free")
    ap.add_argument("--occupancy", action="store_true",
                    help="serve with per-object occupancy-grid empty-space "
                         "skipping (needs bound_sphere_radius in the config "
                         "or --occ_radius)")
    ap.add_argument("--occ_radius", type=float, default=None)
    args = ap.parse_args()

    from codenerf_tpu.config import load_hparams
    from codenerf_tpu.serving import RenderServer
    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    hp = load_hparams(args.jsonfile)
    server = RenderServer.from_checkpoint(
        os.path.join(args.exps_root, args.saved_dir), hp,
        host=args.host, port=args.port,
        use_occupancy=args.occupancy, occ_radius=args.occ_radius,
    )
    for size in filter(None, args.warmup.split(",")):
        h, w = (int(x) for x in size.lower().split("x"))
        print(f"warmup: compiling {h}x{w} renderer ...", flush=True)
        server.render({"obj": 0, "H": h, "W": w})
    print(f"serving {server.n_objects} objects on "
          f"http://{server.host}:{server.port}  (POST /render, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
