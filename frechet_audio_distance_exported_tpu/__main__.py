"""Command-line interface: compute FAD between two directories.

The reference package has no CLI (no [project.scripts], SURVEY.md §1); this
is additive capability:

    python -m frechet_audio_distance_exported_tpu BG_DIR EVAL_DIR \
        --model vggish [--ckpt-dir DIR] [--device-stats] [--verbose]
"""

from __future__ import annotations

import argparse
import json
import sys

from . import FrechetAudioDistance, registry


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="frechet_audio_distance_exported_tpu", description=__doc__
    )
    ap.add_argument("background_dir", help="directory of background audio files")
    ap.add_argument("eval_dir", help="directory of evaluation audio files")
    ap.add_argument("--model", default="vggish", choices=sorted(registry.VALID_MODELS))
    ap.add_argument("--ckpt-dir", default=None, help="weight bundle directory")
    ap.add_argument("--weights", default="auto", choices=["auto", "random"])
    ap.add_argument("--background-embds-path", default=None)
    ap.add_argument("--eval-embds-path", default=None)
    ap.add_argument("--device-stats", action="store_true",
                    help="stream statistics on device (no host embedding matrix)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard batches over ALL local devices (1-D data mesh); "
                         "combine with --device-stats for psum-reduced statistics")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--json", action="store_true", help="print a JSON record")
    args = ap.parse_args(argv)

    mesh = None
    if args.mesh:
        from .parallel.mesh import data_mesh

        mesh = data_mesh()

    fad = FrechetAudioDistance(
        ckpt_dir=args.ckpt_dir,
        model_name=args.model,
        verbose=args.verbose,
        weights=args.weights,
        mesh=mesh,
    )
    score = fad.score(
        args.background_dir,
        args.eval_dir,
        background_embds_path=args.background_embds_path,
        eval_embds_path=args.eval_embds_path,
        device_stats=args.device_stats,
    )
    if args.json:
        print(json.dumps({"model": args.model, "fad": score}))
    else:
        print(f"FAD ({args.model}): {score}")
    return 0 if score != -1 else 1


if __name__ == "__main__":
    sys.exit(main())
