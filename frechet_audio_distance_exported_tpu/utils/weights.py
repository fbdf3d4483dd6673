"""Weight store: .npz param bundles <-> JAX pytrees, plus random init.

The reference ships weights inside opaque torch .pt2/.pt artifacts downloaded
at runtime (reference: fad.py:249-300). Here weights live in flat .npz bundles
(key paths like "blocks/3/conv1/w") produced once by tools/extract_weights.py
from those artifacts / upstream checkpoints; loading is torch-free.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import registry


def flatten_params(params, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        items = params.items()
    elif isinstance(params, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(params))
    else:
        return {prefix.rstrip("/"): np.asarray(params)}
    for k, v in items:
        out.update(flatten_params(v, f"{prefix}{k}/"))
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return _lists_from_int_keys(root)


def _lists_from_int_keys(node):
    if not isinstance(node, dict):
        return node
    node = {k: _lists_from_int_keys(v) for k, v in node.items()}
    # Convert to a list only for exactly the contiguous keys '0'..'n-1':
    # gapped ('0','2') or zero-padded ('01') digit keys stay dicts instead
    # of raising KeyError mid-comprehension.
    if node and set(node) == {str(i) for i in range(len(node))}:
        return [node[str(i)] for i in range(len(node))]
    return node


def save_weights(path: str, params) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in flatten_params(params).items()})


def load_weights(path: str):
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})


def init_random_params(model_name: str, seed: int = 0):
    """Randomly initialized params for a model family (tests/benches only)."""
    rng = jax.random.PRNGKey(seed)
    cfg = registry.get_model_config(model_name)
    if cfg.family == "vggish":
        from ..models.vggish import init_vggish_params

        return init_vggish_params(rng)
    if cfg.family == "pann":
        from ..models.pann import init_pann_params

        return init_pann_params(rng)
    if cfg.family == "encodec":
        from ..models.encodec import init_encodec_params

        return init_encodec_params(rng, causal=(cfg.sample_rate == 24000),
                                   channels=cfg.channels)
    if cfg.family == "clap":
        from ..models.clap import init_clap_params

        return init_clap_params(rng)
    raise ValueError(f"Unknown model family for {model_name}")


def get_params(model_name: str, ckpt_dir: str, weights: str = "auto", seed: int = 0):
    """Resolve params for a model.

    weights='auto': load <ckpt_dir>/<bundle>.npz; on a miss, try in order —
    a hosted .npz bundle URL (registry.WEIGHT_BUNDLE_URLS), a reference
    torch artifact already in ckpt_dir, downloading the reference artifact
    (registry.EXPORTED_MODEL_URLS, the reference's download-on-miss
    semantics, reference: fad.py:275-286) — converting artifacts in-process
    (requires torch, one-time); otherwise raise with instructions.
    weights='random': torch-default-like random init (tests/benches).
    """
    if weights == "random":
        return init_random_params(model_name, seed)

    cfg = registry.get_model_config(model_name)
    bundle_path = os.path.join(ckpt_dir, cfg.weight_filename)
    if os.path.exists(bundle_path):
        try:
            return load_weights(bundle_path)
        except Exception as e:
            # A corrupt bundle must not be permanently fatal with a cryptic
            # np.load error — name the file and the fix.
            raise RuntimeError(
                f"Weight bundle {bundle_path} exists but failed to load "
                f"({type(e).__name__}: {e}). Delete it to re-download or "
                f"re-convert."
            ) from e

    from . import download as dl

    download_errors = []
    bundle_url = registry.WEIGHT_BUNDLE_URLS.get(model_name)
    if bundle_url and not dl.offline():
        try:
            print(f"[FAD-TPU] Downloading {model_name} weight bundle to {ckpt_dir}...")
            dl.download_url_to_file(
                bundle_url,
                bundle_path,
                sha256=registry.WEIGHT_BUNDLE_SHA256.get(model_name),
            )
            return load_weights(bundle_path)
        except Exception as e:  # fall through to the artifact path
            download_errors.append(f"bundle {bundle_url}: {e}")
            if os.path.exists(bundle_path):
                os.remove(bundle_path)  # don't poison future runs

    def _import_extract_tool():
        from importlib import import_module

        return import_module("tools.extract_weights")

    artifact_path = os.path.join(ckpt_dir, cfg.reference_artifact)
    if not os.path.exists(artifact_path):
        artifact_url = registry.EXPORTED_MODEL_URLS.get(model_name)
        if artifact_url and not dl.offline():
            # Check the conversion tool is importable BEFORE streaming a
            # multi-hundred-MB torch artifact we could not convert anyway.
            try:
                _import_extract_tool()
            except ImportError as e:
                download_errors.append(
                    f"artifact {artifact_url}: skipped — conversion tool "
                    f"(tools/extract_weights.py, requires torch) not importable: {e}"
                )
            else:
                try:
                    print(
                        f"[FAD-TPU] Downloading {model_name} reference artifact to {ckpt_dir}..."
                    )
                    dl.download_url_to_file(
                        artifact_url,
                        artifact_path,
                        sha256=registry.EXPORTED_MODEL_SHA256.get(model_name),
                    )
                    print("[FAD-TPU] Download complete.")
                except Exception as e:
                    download_errors.append(f"artifact {artifact_url}: {e}")
    if os.path.exists(artifact_path):
        try:
            extract = _import_extract_tool()
        except ImportError as e:
            raise FileNotFoundError(
                f"Found reference artifact {artifact_path} but the conversion "
                f"tool (tools/extract_weights.py, requires torch) is not "
                f"importable: {e}. Convert offline and place "
                f"{cfg.weight_filename} in {ckpt_dir}."
            ) from e
        params = extract.extract(model_name, artifact_path)
        save_weights(bundle_path, params)
        return params

    detail = ""
    if dl.offline():
        detail = " Downloads are disabled (FAD_TPU_OFFLINE is set)."
    elif download_errors:
        detail = " Download attempts failed: " + "; ".join(download_errors) + "."
    raise FileNotFoundError(
        f"Weight bundle not found at {bundle_path} and no reference artifact "
        f"({cfg.reference_artifact}) to convert in {ckpt_dir}.{detail} Run "
        f"tools/extract_weights.py --model {model_name} --ckpt-dir {ckpt_dir} "
        f"(requires the reference artifact and torch), or pass weights='random' "
        f"for testing."
    )
