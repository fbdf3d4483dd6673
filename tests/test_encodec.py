"""Encodec tests: preprocessing semantics (mirrors reference
tests/test_encodec.py behaviors), encoder shapes, and a full torch-parity
check of the SEANet architecture (identical weights -> identical outputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.models.encodec import (
    RATIOS,
    encodec_forward,
    init_encodec_params,
)
from frechet_audio_distance_exported_tpu.ops import frontends as fe


class TestPreprocessing:
    def test_mono_24k_shape(self, sine_audio):
        audio = sine_audio(1.0, 440.0, 24000)
        out = fe.preprocess_for_encodec(audio, 24000, 24000, 1, return_tensor=False)
        assert out.shape == (1, 24000)

    def test_stereo_48k_shape(self, sine_audio):
        audio = sine_audio(1.0, 440.0, 48000)
        out = fe.preprocess_for_encodec(audio, 48000, 48000, 2, return_tensor=False)
        assert out.shape == (2, 48000)
        np.testing.assert_array_equal(out[0], out[1])  # mono duplicated

    def test_stereo_to_mono_mean(self):
        audio = np.stack([np.ones(100, np.float32), np.zeros(100, np.float32)], axis=1)
        out = fe.preprocess_for_encodec(audio, 24000, 24000, 1, return_tensor=False)
        np.testing.assert_allclose(out[0], 0.5)

    def test_resampling(self, sine_audio):
        audio = sine_audio(1.0, 440.0, 44100)
        out = fe.preprocess_for_encodec(audio, 44100, 24000, 1, return_tensor=False)
        assert out.shape == (1, 24000)

    def test_invalid_sr_raises(self, sine_audio):
        with pytest.raises(ValueError, match="Unsupported target sample rate"):
            fe.preprocess_for_encodec(sine_audio(0.1, 440.0), 16000, 16000, 1)

    def test_pad_to_fixed_length_exact(self):
        x = np.zeros((1, 1, 240000), np.float32)
        out = fe.pad_to_fixed_length(x, 24000)
        assert out.shape[-1] == 240000

    def test_pad_to_fixed_length_pads(self):
        x = np.zeros((1, 1, 1000), np.float32)
        out = fe.pad_to_fixed_length(x, 24000)
        assert out.shape[-1] == 240000

    def test_pad_too_long_raises(self):
        x = np.zeros((1, 1, 240001), np.float32)
        with pytest.raises(ValueError, match="Audio too long"):
            fe.pad_to_fixed_length(x, 24000)

    def test_pad_to_valid_divisible(self):
        x = np.zeros((1, 1, 999), np.float32)
        out = fe.pad_to_valid_encodec_length(x)
        assert out.shape[-1] % 320 == 0

    def test_configs(self):
        assert fe.ENCODEC_CONFIGS[24000]["channels"] == 1
        assert fe.ENCODEC_CONFIGS[48000]["channels"] == 2
        assert fe.ENCODEC_CONFIGS[24000]["hop_length"] == 320
        assert fe.ENCODEC_CONFIGS[24000]["max_samples"] == 240000
        assert fe.ENCODEC_CONFIGS[48000]["max_samples"] == 480000
        assert int(np.prod(RATIOS)) == 320


class TestEncoder:
    @pytest.mark.parametrize("causal,channels", [(True, 1), (False, 2)])
    def test_forward_shape(self, causal, channels):
        params = init_encodec_params(jax.random.PRNGKey(0), causal=causal, channels=channels)
        s = 3200  # 10 frames
        x = jax.random.normal(jax.random.PRNGKey(1), (2, channels, s))
        out = encodec_forward(params, x, causal=causal)
        assert out.shape == (2, s // 320, 128)

    def test_deterministic(self):
        params = init_encodec_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 3200))
        a = np.asarray(encodec_forward(params, x, causal=True))
        b = np.asarray(encodec_forward(params, x, causal=True))
        np.testing.assert_array_equal(a, b)

    def test_env_flip_retraces(self, monkeypatch):
        """FAD_TPU_LSTM_MATMUL / FAD_TPU_PRECISION resolve at call time and
        sit in the jit key as statics — flipping them mid-process must add a
        trace-cache entry instead of silently reusing the stale branch (the
        frontend wrappers' contract, extended here by code-review r5; on CPU
        outputs can be bitwise-equal, so assert the mechanism)."""
        from frechet_audio_distance_exported_tpu.models import encodec as E

        monkeypatch.delenv("FAD_TPU_LSTM_MATMUL", raising=False)
        monkeypatch.delenv("FAD_TPU_PRECISION", raising=False)
        params = init_encodec_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 3200))
        base = np.asarray(encodec_forward(params, x, causal=True))

        size0 = E._encodec_forward_jit._cache_size()
        monkeypatch.setenv("FAD_TPU_LSTM_MATMUL", "bfloat16")
        bf = np.asarray(encodec_forward(params, x, causal=True))
        size1 = E._encodec_forward_jit._cache_size()
        assert size1 > size0, "LSTM operand-dtype flip reused the stale trace"
        # bf16 operands genuinely change values (also guards against the
        # static arg being resolved but ignored).
        assert np.any(bf != base)

        monkeypatch.setenv("FAD_TPU_LSTM_MATMUL", "float32")
        monkeypatch.setenv("FAD_TPU_PRECISION", "highest")
        hi = np.asarray(encodec_forward(params, x, causal=True))
        size2 = E._encodec_forward_jit._cache_size()
        assert size2 > size1, "precision flip reused the stale trace"
        np.testing.assert_allclose(hi, base, rtol=0, atol=1e-5)

    def test_lstm_bf16_operands_close_to_f32(self):
        """Mixed-precision mode runs the in-scan recurrent matmuls with bf16
        OPERANDS (f32 carry/accumulation, models/encodec.py:_slstm). The
        operand rounding must stay damped (~1e-4 relative), not compound
        over the sequential steps like the rejected full-bf16 recurrence."""
        from frechet_audio_distance_exported_tpu.models.encodec import _slstm

        params = init_encodec_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 100, 512), jnp.float32) * 0.5
        a = np.asarray(_slstm(params["lstm"], x))
        o = np.asarray(_slstm(params["lstm"], x, op_dtype=jnp.bfloat16))
        rel = np.max(np.abs(a - o)) / np.max(np.abs(a))
        assert rel < 1e-3, rel
        # f32 op_dtype is the default and must be bit-identical to it.
        np.testing.assert_array_equal(
            a, np.asarray(_slstm(params["lstm"], x, op_dtype=jnp.float32))
        )


def _torch_seanet(params, causal, channels):
    """Build a torch SEANet encoder from OUR params (independent architecture
    replica following Meta encodec's published design)."""
    torch = pytest.importorskip("torch")
    import math

    import torch.nn as nn
    import torch.nn.functional as F

    def conv_from(p, k, stride=1):
        w = torch.from_numpy(np.asarray(p["w"]).transpose(2, 1, 0).copy())
        conv = nn.Conv1d(w.shape[1], w.shape[0], k, stride=stride)
        with torch.no_grad():
            conv.weight.copy_(w)
            conv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
        gn = None
        if "gn" in p:
            gn = nn.GroupNorm(1, w.shape[0])
            with torch.no_grad():
                gn.weight.copy_(torch.from_numpy(np.asarray(p["gn"]["gamma"])))
                gn.bias.copy_(torch.from_numpy(np.asarray(p["gn"]["beta"])))
        return conv, gn

    def sconv(p, x, k, stride=1):
        conv, gn = conv_from(p, k, stride)
        L = x.shape[-1]
        p_total = k - stride
        n_frames = (L - k + p_total) / stride + 1
        ideal = (math.ceil(n_frames) - 1) * stride + (k - p_total)
        extra = ideal - L
        if causal:
            left, right = p_total, extra
        else:
            right = p_total // 2
            left, right = p_total - right, right + extra
        x = F.pad(x, (left, right), mode="reflect")
        y = conv(x)
        return gn(y) if gn is not None else y

    def forward(x_np):
        x = torch.from_numpy(x_np)
        with torch.no_grad():
            h = sconv(params["conv_in"], x, 7)
            for ratio, stage in zip(RATIOS, params["stages"]):
                res = stage["res"]
                r = F.elu(h)
                r = sconv(res["conv1"], r, 3)
                r = F.elu(r)
                r = sconv(res["conv2"], r, 1)
                h = sconv(res["shortcut"], h, 1) + r
                h = F.elu(h)
                h = sconv(stage["down"], h, 2 * ratio, stride=ratio)
            # 2-layer LSTM with skip
            lstm = nn.LSTM(512, 512, num_layers=2)
            with torch.no_grad():
                for i, layer in enumerate(("l0", "l1")):
                    q = params["lstm"][layer]
                    getattr(lstm, f"weight_ih_l{i}").copy_(torch.from_numpy(np.asarray(q["w_ih"]).T.copy()))
                    getattr(lstm, f"weight_hh_l{i}").copy_(torch.from_numpy(np.asarray(q["w_hh"]).T.copy()))
                    getattr(lstm, f"bias_ih_l{i}").copy_(torch.from_numpy(np.asarray(q["b_ih"])))
                    getattr(lstm, f"bias_hh_l{i}").copy_(torch.from_numpy(np.asarray(q["b_hh"])))
            seq = h.permute(2, 0, 1)  # [T, B, C]
            y, _ = lstm(seq)
            h = (y + seq).permute(1, 2, 0)
            h = F.elu(h)
            h = sconv(params["conv_out"], h, 7)
        return h.numpy()

    return forward


@pytest.mark.parametrize("causal,channels", [(True, 1), (False, 2)])
def test_encoder_matches_torch(causal, channels):
    params = init_encodec_params(jax.random.PRNGKey(5), causal=causal, channels=channels)
    x = np.random.default_rng(0).standard_normal((1, channels, 3200)).astype(np.float32) * 0.1
    ours = np.asarray(encodec_forward(params, x, causal=causal))  # [B, T, 128]
    torch_fwd = _torch_seanet(params, causal, channels)
    theirs = torch_fwd(x).transpose(0, 2, 1)  # [B, C, T] -> [B, T, C]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
