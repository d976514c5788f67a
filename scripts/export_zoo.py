#!/usr/bin/env python
"""Export trained generator weights from a run checkpoint into the model zoo.

  python scripts/export_zoo.py --run runs/stage2_50k_fp32 --stage 2 \
      --name vocoder_rich50k --ema 0.999 --notes "50k steps, rich corpus"

Serves the EMA generator when the run trained one (the weights a deployment
serves); picks up runs/<run>/mel_stats.json and eval/eval.json automatically.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--stage", type=int, choices=[1, 2], required=True)
    ap.add_argument("--name", required=True, help="zoo entry name")
    ap.add_argument("--preset", choices=["default", "tiny"], default="default")
    ap.add_argument("--head", choices=["waveform", "istft"], default="waveform")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="must match training (controls checkpoint structure)")
    ap.add_argument("--init-scheme", choices=["dcgan", "he"], default="dcgan",
                    help="recorded in the model card (stage 2 provenance)")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--notes", default="")
    ap.add_argument("--root", default=None, help="zoo root (default: repo/zoo)")
    args = ap.parse_args()

    from music_synthesis_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()

    from music_synthesis_tpu import zoo
    from music_synthesis_tpu.config import (
        MelScaler, TINY, PipelineConfig, config_from_dict,
    )
    from music_synthesis_tpu.train.checkpoint import (
        CheckpointManager, abstract_state,
    )

    run = Path(args.run)
    cfg_file = run / "config.json"
    if cfg_file.exists():
        # Exact provenance: the config the run actually trained with —
        # includes init gains, out_temperature, lr-decay/grad-clip (which
        # shape the optimizer-state pytree orbax restores into), the
        # corpus-derived MelScaler, everything. CLI config flags are ignored.
        cfg = config_from_dict(json.loads(cfg_file.read_text()))
        print(f"config from {cfg_file} (CLI --preset/--head/--init-scheme/"
              f"--ema ignored)")
    else:
        # Legacy runs (pre config.json): reconstruct from flags.
        base = TINY if args.preset == "tiny" else PipelineConfig()
        vocoder = base.vocoder
        if args.head == "istft":
            vocoder = dataclasses.replace(
                vocoder, head="istft", upsample_factors=(8, 8),
                istft_n_fft=16, istft_hop=4,
            )
        if args.init_scheme != "dcgan":
            # Mirror train_stage2.py's calibrated overrides so the exported
            # config reproduces the trained forward pass (round-2 advisor).
            vocoder = dataclasses.replace(
                vocoder, init_scheme=args.init_scheme,
                res_init_gain=0.1, out_init_gain=0.003,
            )
        cfg = dataclasses.replace(
            base, vocoder=vocoder,
            train=dataclasses.replace(base.train, ema_decay=args.ema),
        )
    mel_scaler = cfg.mel_scaler if cfg_file.exists() else None
    stats_file = run / "mel_stats.json"
    if stats_file.exists():
        s = json.loads(stats_file.read_text())
        mel_scaler = MelScaler(shift=s["shift"], scale=s["scale"])

    ckpt = CheckpointManager(run / "ckpt")
    state = ckpt.restore(abstract_state(cfg, stage=args.stage), step=args.step)
    step = int(state.step)
    params = state.g_ema if state.g_ema is not None else state.g_params
    which = "ema" if state.g_ema is not None else "raw"

    metrics = {"checkpoint_step": step}
    eval_file = run / "eval" / "eval.json"
    if eval_file.exists():
        metrics.update(json.loads(eval_file.read_text()))

    kind = "vocoder" if args.stage == 2 else "specgan"
    model_cfg = cfg.vocoder if args.stage == 2 else cfg.specgan
    out = zoo.save_pretrained(
        args.name, kind, params, model_cfg,
        frontend=cfg.frontend, mel_scaler=mel_scaler, metrics=metrics,
        notes=args.notes or f"{which} generator from {run} @ step {step}",
        **({"root": args.root} if args.root else {}),
    )
    print(f"exported {kind} ({which} weights, step {step}) -> {out}")


if __name__ == "__main__":
    main()
