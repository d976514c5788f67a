#!/usr/bin/env python
"""Serve trained zoo models over HTTP (production deployment surface).

  python scripts/serve.py --port 8000
  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/generate \
      -d '{"seconds": 8, "seed": 3}' -o out.wav

All configured (batch, patches) shape buckets compile and warm at startup;
steady-state requests never recompile (serve.py module docstring).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--composer", default="specgan_flux")
    ap.add_argument("--vocoder", default="vocoder_istft")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-buckets", default="1,4")
    ap.add_argument("--patch-buckets", default="1,2,4,8")
    ap.add_argument("--crossfade-frames", type=int, default=8)
    ap.add_argument("--target-rms", type=float, default=0.1,
                    help="default loudness calibration; 0 = raw model level")
    ap.add_argument("--mesh", type=int, default=1,
                    help="shard each batch bucket over N devices (DP)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (half the HBM traffic on TPU)")
    ap.add_argument("--coalesce-ms", type=float, default=0.0,
                    help="merge concurrent requests into one device call "
                         "within this window (0 = off)")
    ap.add_argument("--gl-refine", type=int, default=0,
                    help="warm-started Griffin-Lim consistency projections "
                         "per served clip (refined-quality deployment: "
                         "--vocoder vocoder_istft_phase --gl-refine 8, "
                         "DESIGN.md §19); 0 = fastest, off")
    ap.add_argument("--device", choices=["cpu", "default"], default="default")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_synthesis_tpu.serve import (
        ServeConfig, SynthService, make_server)

    sc = ServeConfig(
        composer=args.composer,
        vocoder=args.vocoder,
        batch_buckets=tuple(int(x) for x in args.batch_buckets.split(",")),
        patch_buckets=tuple(int(x) for x in args.patch_buckets.split(",")),
        crossfade_frames=args.crossfade_frames,
        target_rms=args.target_rms,
        mesh_devices=args.mesh,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        coalesce_window_ms=args.coalesce_ms,
        gl_refine=args.gl_refine,
    )
    print(f"loading {args.composer} + {args.vocoder}; "
          f"warming {len(sc.batch_buckets) * len(sc.patch_buckets)} "
          "shape buckets...", flush=True)
    svc = SynthService(sc)
    print(f"warm: {svc.health()}", flush=True)
    httpd = make_server(svc, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{args.port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()


if __name__ == "__main__":
    main()
