#!/usr/bin/env python
"""Build + fingerprint the torch-free .npz weight bundles for hosting.

The torch-free install path (registry.WEIGHT_BUNDLE_URLS) needs hosted
pre-converted bundles. This tool makes publishing push-button (VERDICT r2
#8): given a ckpt_dir that contains the reference torch artifacts (fetch
them with ``scripts/verify_parity.py --all --fetch``), it converts every
model to its .npz bundle, computes sha256 pins, and prints a ready-to-paste
``WEIGHT_BUNDLE_URLS`` / ``WEIGHT_BUNDLE_SHA256`` snippet for registry.py —
upload the bundles to the URL base and paste the snippet.

Usage:
  python tools/publish_bundles.py --ckpt-dir DIR \
      [--url-base https://example.com/fad-tpu-bundles]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    from frechet_audio_distance_exported_tpu import registry
    from frechet_audio_distance_exported_tpu.utils import weights as weight_store

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--url-base", default="https://UPLOAD-BASE-URL")
    ap.add_argument("--models", nargs="*", default=sorted(registry.VALID_MODELS))
    args = ap.parse_args()

    built, blocked = {}, {}
    for name in args.models:
        cfg = registry.get_model_config(name)
        bundle = os.path.join(args.ckpt_dir, cfg.weight_filename)
        if not os.path.exists(bundle):
            try:
                # Triggers the artifact->npz conversion chain (requires the
                # torch artifact in ckpt_dir, or network to download it).
                weight_store.get_params(name, args.ckpt_dir, weights="auto")
            except Exception as e:
                blocked[name] = f"{type(e).__name__}: {e}"
                continue
        built[name] = (cfg.weight_filename, sha256_file(bundle),
                       os.path.getsize(bundle) >> 20)

    for name, (fn, digest, mb) in built.items():
        print(f"[built] {name}: {fn} ({mb} MiB) sha256={digest}")
    for name, why in blocked.items():
        print(f"[blocked] {name}: {why}")

    if built:
        print("\n# --- paste into frechet_audio_distance_exported_tpu/registry.py ---")
        print("WEIGHT_BUNDLE_URLS = {")
        for name, (fn, _, _) in built.items():
            print(f'    "{name}": "{args.url_base}/{fn}",')
        print("}")
        print("WEIGHT_BUNDLE_SHA256 = {")
        for name, (_, digest, _) in built.items():
            print(f'    "{name}": "{digest}",')
        print("}")
    sys.exit(1 if blocked else 0)


if __name__ == "__main__":
    main()
