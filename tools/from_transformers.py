"""Convert HuggingFace transformers CLAP / EnCodec weights to FAD-TPU bundles.

Why this exists (two jobs):

1. **Real weights without the reference artifacts.** The reference's CLAP and
   Encodec models came from laion_clap's `630k-audioset-best.pt` and Meta's
   `encodec` package (reference: scripts/export_clap.py:153-195,
   scripts/export_encodec.py:146-168). The same upstream checkpoints are
   published on the HF hub (`laion/clap-htsat-unfused`,
   `facebook/encodec_24khz`, `facebook/encodec_48khz`), so with network access

       python tools/from_transformers.py --model clap --ckpt-dir ~/.cache/fad_tpu

   produces a ready .npz bundle with the genuine weights, torch-free at
   runtime. (Note: `laion/clap-htsat-unfused` is LAION's 630k+audioset
   HTSAT-tiny checkpoint; verify FAD parity against the reference artifact
   when both are reachable.)

2. **Third-party architecture parity.** transformers' ClapAudioModel and
   EncodecModel are independent re-implementations of HTSAT-tiny Swin and the
   SEANet encoder. tests/test_transformers_parity.py transfers random weights
   through these converters and asserts our JAX forwards match — a check
   against third-party code rather than replicas written alongside the JAX
   models (which could share a misconception).

Dev-time tool: requires torch + transformers. Runtime package stays free of
both.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HF_MODEL_IDS = {
    "clap": "laion/clap-htsat-unfused",
    "encodec-24k": "facebook/encodec_24khz",
    "encodec-48k": "facebook/encodec_48khz",
}


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


# ---------------------------------------------------------------------------
# EnCodec: transformers.EncodecModel.encoder -> models/encodec.py pytree
# ---------------------------------------------------------------------------


def convert_encodec(model) -> dict:
    """transformers.EncodecModel -> params for models/encodec.py.

    Encoder layer list layout (transformers modeling_encodec.EncodecEncoder):
    [conv_in, (resblock, ELU, downconv) x 4, lstm, ELU, conv_out]. Accessing
    ``.conv.weight`` resolves the weight_norm parametrization to the
    effective kernel, which we store directly (weight_norm folded — same as
    tools/extract_weights.py does for the reference artifact).
    """

    def conv(m) -> dict:
        # torch Conv1d weight [C_out, C_in, K] -> WIO [K, C_in, C_out].
        p = {"w": _np(m.conv.weight).transpose(2, 1, 0).copy(), "b": _np(m.conv.bias)}
        if hasattr(m, "norm"):  # time_group_norm (48 kHz variant)
            p["gn"] = {"gamma": _np(m.norm.weight), "beta": _np(m.norm.bias)}
        return p

    layers = model.encoder.layers
    params = {"conv_in": conv(layers[0]), "stages": []}
    idx = 1
    for _ in range(4):
        res, down = layers[idx], layers[idx + 2]
        params["stages"].append(
            {
                "res": {
                    "conv1": conv(res.block[1]),
                    "conv2": conv(res.block[3]),
                    "shortcut": conv(res.shortcut),
                },
                "down": conv(down),
            }
        )
        idx += 3
    lstm = layers[idx].lstm
    params["lstm"] = {
        f"l{k}": {
            # torch LSTM weight_ih [4H, H] -> [H, 4H]; gate order i,f,g,o
            # matches models/encodec.py's split.
            "w_ih": _np(getattr(lstm, f"weight_ih_l{k}")).T.copy(),
            "w_hh": _np(getattr(lstm, f"weight_hh_l{k}")).T.copy(),
            "b_ih": _np(getattr(lstm, f"bias_ih_l{k}")),
            "b_hh": _np(getattr(lstm, f"bias_hh_l{k}")),
        }
        for k in range(2)
    }
    params["conv_out"] = conv(layers[idx + 2])
    return params


# ---------------------------------------------------------------------------
# CLAP: transformers ClapAudioModel(+projection) -> models/clap.py pytree
# ---------------------------------------------------------------------------


def convert_clap(model) -> dict:
    """ClapAudioModelWithProjection (or ClapModel) -> params for models/clap.py."""
    audio_model = getattr(model, "audio_model", model)
    encoder = audio_model.audio_encoder
    projection = model.audio_projection

    def lin(m) -> dict:
        return {"w": _np(m.weight).T.copy(), "b": _np(m.bias)}

    def ln(m) -> dict:
        return {"gamma": _np(m.weight), "beta": _np(m.bias)}

    bn = encoder.batch_norm
    params = {
        "bn0": {
            "gamma": _np(bn.weight),
            "beta": _np(bn.bias),
            "mean": _np(bn.running_mean),
            "var": _np(bn.running_var),
        },
        "patch_embed": {
            # torch Conv2d [C_out, C_in, kH, kW] -> HWIO.
            "conv": {
                "w": _np(encoder.patch_embed.proj.weight).transpose(2, 3, 1, 0).copy(),
                "b": _np(encoder.patch_embed.proj.bias),
            },
            "norm": ln(encoder.patch_embed.norm),
        },
        "stages": [],
        "norm": ln(encoder.norm),
        "projection": {"fc1": lin(projection.linear1), "fc2": lin(projection.linear2)},
    }
    for stage in encoder.layers:
        blocks = []
        for blk in stage.blocks:
            att = blk.attention
            qkv_w = np.concatenate(
                [_np(att.self.query.weight).T, _np(att.self.key.weight).T,
                 _np(att.self.value.weight).T],
                axis=1,
            )
            qkv_b = np.concatenate(
                [_np(att.self.query.bias), _np(att.self.key.bias), _np(att.self.value.bias)]
            )
            blocks.append(
                {
                    "norm1": ln(blk.layernorm_before),
                    "qkv": {"w": qkv_w, "b": qkv_b},
                    "rel_bias": _np(att.self.relative_position_bias_table),
                    "proj": lin(att.output.dense),
                    "norm2": ln(blk.layernorm_after),
                    "mlp": {
                        "fc1": lin(blk.intermediate.dense),
                        "fc2": lin(blk.output.dense),
                    },
                }
            )
        st = {"blocks": blocks}
        if stage.downsample is not None:
            st["downsample"] = {
                "norm": ln(stage.downsample.norm),
                "reduction": {"w": _np(stage.downsample.reduction.weight).T.copy()},
            }
        params["stages"].append(st)
    return params


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def fetch_and_convert(model_name: str, ckpt_dir: str, hf_id: str | None = None) -> str:
    """Download the HF checkpoint for ``model_name`` and save the .npz bundle."""
    from frechet_audio_distance_exported_tpu import registry
    from frechet_audio_distance_exported_tpu.utils import weights as weight_store

    hf_id = hf_id or HF_MODEL_IDS[model_name]
    if model_name == "clap":
        from transformers import ClapModel

        model = ClapModel.from_pretrained(hf_id).eval()
        params = convert_clap(model)
    elif model_name in ("encodec-24k", "encodec-48k"):
        from transformers import EncodecModel

        model = EncodecModel.from_pretrained(hf_id).eval()
        params = convert_encodec(model)
    else:
        raise ValueError(
            f"No HF source for {model_name} (available: {sorted(HF_MODEL_IDS)}); "
            f"use tools/extract_weights.py with the reference artifact instead."
        )
    out = os.path.join(ckpt_dir, registry.WEIGHT_FILENAMES[model_name])
    weight_store.save_weights(out, params)
    print(f"[from_transformers] {model_name}: {hf_id} -> {out}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, choices=sorted(HF_MODEL_IDS) + ["all"])
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--hf-id", default=None, help="override the HF checkpoint id")
    args = ap.parse_args()
    names = sorted(HF_MODEL_IDS) if args.model == "all" else [args.model]
    for name in names:
        fetch_and_convert(name, args.ckpt_dir, args.hf_id if args.model != "all" else None)


if __name__ == "__main__":
    main()
