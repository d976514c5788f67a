#!/usr/bin/env python
"""Reproduce the committed synthetic corpora (runs/corpus_rich*).

  python scripts/make_corpus.py --out runs/corpus_rich            # 2.1 h
  python scripts/make_corpus.py --out runs/corpus_rich16h \
      --clips 1920                                                # 16 h

Both use the same generator distribution and seed stream (seed=0): the
16 h corpus is the round-4 corpus-scale experiment (VERDICT r3 item 3)
— the distribution is held fixed and ONLY size varies, so a fidelity
change between the two isolates the data-quantity hypothesis. Corpora
are .gitignored (regenerable, ~170 KB/clip); this script is their
provenance.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--clips", type=int, default=256,
                    help="256 x 30 s = 2.1 h (round-3 corpus); "
                         "1920 = 16 h (round-4 scale experiment)")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from music_synthesis_tpu.data.dataset import make_rich_corpus

    t0 = time.time()
    paths = make_rich_corpus(args.out, n_clips=args.clips,
                             seconds=args.seconds, seed=args.seed)
    print(f"done: {len(paths)} clips "
          f"({len(paths) * args.seconds / 3600:.1f} h) "
          f"in {time.time() - t0:.0f}s -> {args.out}")


if __name__ == "__main__":
    main()
