"""Fused Pallas SEANet conv-stage path: interpret-mode exactness vs the XLA
stage chain, store-layout invariants, and the enable gate.

The kernels fuse reflect padding + prev-GN affine + ELU into each stride-1
conv and emit the conv's own GroupNorm moments (see ops/pallas_encodec.py).
Reference behavior: Meta encodec SConv1d asymmetric math.ceil padding
(reference scripts/export_encodec.py:231-239) + nn.GroupNorm(1, C) for the
48 kHz 'time_group_norm' variant.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.models import common
from frechet_audio_distance_exported_tpu.models import encodec as enc
from frechet_audio_distance_exported_tpu.ops import pallas_encodec as pe


def _xla_stages(params, x, causal):
    h = enc._sconv(params["conv_in"], x, kernel=7, stride=1, causal=causal)
    for ratio, stage in zip(enc.RATIOS, params["stages"]):
        h = enc._res_block(stage["res"], h, causal)
        h = jax.nn.elu(h)
        h = enc._sconv(stage["down"], h, kernel=2 * ratio, stride=ratio, causal=causal)
    return h


class TestFusedEncoderExactness:
    @pytest.mark.parametrize(
        "causal,channels", [(True, 1), (False, 2)], ids=["24k-causal", "48k-gn"]
    )
    @pytest.mark.parametrize("T", [3200, 4800])
    def test_matches_xla_stage_chain(self, causal, channels, T):
        params = enc.init_encodec_params(
            jax.random.PRNGKey(0), causal=causal, channels=channels
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, T, channels), jnp.float32) * 0.3
        ref = np.asarray(_xla_stages(params, x, causal))
        got = np.asarray(enc._encoder_fused(params, x, causal, interpret=True))
        assert got.shape == ref.shape
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got, ref, atol=5e-5 * scale, rtol=0)

    def test_non_divisible_tail_tile(self, monkeypatch):
        """T that does not divide the tile exercises the masked tail cell."""
        monkeypatch.setattr(enc, "_tile_for", lambda T, channels: 64)
        params = enc.init_encodec_params(jax.random.PRNGKey(2), causal=False, channels=2)
        T = 3160  # not a multiple of 64 -> padded tail rows masked in GN sums
        x = jax.random.normal(jax.random.PRNGKey(3), (1, T, 2), jnp.float32) * 0.3
        ref = np.asarray(_xla_stages(params, x, False))
        got = np.asarray(enc._encoder_fused(params, x, False, interpret=True))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got, ref, atol=5e-5 * scale, rtol=0)

    @pytest.mark.parametrize("causal,channels", [(True, 1), (False, 2)])
    def test_one_valid_row_in_last_cell(self, monkeypatch, causal, channels):
        """T = tile*k + 1: the back reflect fix in the last cell reads its
        source rows from the halo (previous cell's data), t_loc = 1."""
        monkeypatch.setattr(enc, "_tile_for", lambda T, channels: 64)
        params = enc.init_encodec_params(
            jax.random.PRNGKey(4), causal=causal, channels=channels
        )
        T = 64 * 50 + 1  # 3201: last conv-stage cells keep odd tails throughout
        x = jax.random.normal(jax.random.PRNGKey(5), (1, T, channels), jnp.float32) * 0.3
        ref = np.asarray(_xla_stages(params, x, causal))
        got = np.asarray(enc._encoder_fused(params, x, causal, interpret=True))
        assert got.shape == ref.shape
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got, ref, atol=5e-5 * scale, rtol=0)


class TestStoreLayout:
    def test_round_trip(self):
        x = jnp.arange(2 * 100 * 3, dtype=jnp.float32).reshape(2, 100, 3)
        st = pe.to_store(x, tile=64)
        assert st.shape[1] == pe.store_width(100, 64)
        np.testing.assert_array_equal(np.asarray(pe.from_store(st, 100)), np.asarray(x))

    def test_store_width_alignment(self):
        for T in (1, 7, 64, 100, 1000):
            w = pe.store_width(T, 64)
            assert w % 8 == 0 and w >= pe.FP + T + pe._BACK


class TestGNAffine:
    def test_matches_group_norm_full(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 50, 16), jnp.float32) * 2.0
        gamma = jax.random.normal(jax.random.PRNGKey(1), (16,)) * 0.5 + 1.0
        beta = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
        ref = np.asarray(common.group_norm_full(x, gamma, beta))
        sums = pe.masked_channel_sums(x)
        scale, shift = pe.gn_affine_from_sums(sums, 50, gamma, beta)
        got = np.asarray(x * scale + shift)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


class TestEnableGate:
    def test_off_on_cpu_by_default(self, monkeypatch):
        monkeypatch.delenv("FAD_TPU_FUSED_ENCODEC", raising=False)
        params = enc.init_encodec_params(jax.random.PRNGKey(0))
        assert not enc._fused_enabled(params)

    def test_env_disable(self, monkeypatch):
        monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "0")
        params = enc.init_encodec_params(jax.random.PRNGKey(0))
        assert not enc._fused_enabled(params)

    def test_auto_off_pending_hardware_ab(self, monkeypatch):
        """'auto' stays off on TPU until the interleaved A/B is recorded."""
        monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "auto")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        params = enc.init_encodec_params(jax.random.PRNGKey(0))
        assert not enc._fused_enabled(params)

    def test_bf16_params_keep_xla_path(self, monkeypatch):
        """Mixed-precision opt-ins keep the measured XLA path."""
        monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "1")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        params = enc.init_encodec_params(jax.random.PRNGKey(0))
        assert enc._fused_enabled(params)
        params_bf16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
        )
        assert not enc._fused_enabled(params_bf16)

    def test_mixed_pytree_rejected(self, monkeypatch):
        """f32 conv_in + bf16 stage weights must NOT pass the gate — the
        fused kernels would run mixed-dtype dots instead of the measured
        XLA mixed path (advisor r4)."""
        monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "1")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        params = enc.init_encodec_params(jax.random.PRNGKey(0))
        assert enc._fused_enabled(params)
        params["stages"][1]["res"]["conv1"]["w"] = params["stages"][1]["res"][
            "conv1"
        ]["w"].astype(jnp.bfloat16)
        assert not enc._fused_enabled(params)
        params["stages"][1]["res"]["conv1"]["w"] = params["stages"][1]["res"][
            "conv1"
        ]["w"].astype(jnp.float32)
        params["stages"][3]["down"]["w"] = params["stages"][3]["down"]["w"].astype(
            jnp.bfloat16
        )
        assert not enc._fused_enabled(params)

    def test_exactness_force_reverts(self, monkeypatch):
        monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "auto")
        monkeypatch.setenv("FAD_TPU_PRECISION", "highest")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        params = enc.init_encodec_params(jax.random.PRNGKey(0))
        assert not enc._fused_enabled(params)


def test_fused_encoder_under_shard_map_matches_unsharded():
    """The pipeline shard_maps the whole frontend+model core under a mesh, so
    the fused conv-stage kernels must run per-shard. Lock pallas_call (interpret)
    + shard_map for the encodec kernels like test_pallas_frontend does for the
    frontend: 8-device CPU mesh, batch-sharded input. Not bitwise (unlike the
    pure-Pallas frontend test): the strided down convs between kernels are XLA
    convs, and CPU XLA vectorizes them differently at per-shard batch 1 vs 8
    (measured 3.6e-6 on scale 4.6) — same float-level class as the exactness
    bar above."""
    from jax.sharding import PartitionSpec as P

    from frechet_audio_distance_exported_tpu.parallel.embed import shard_map
    from frechet_audio_distance_exported_tpu.parallel.mesh import DATA_AXIS, data_mesh

    params = enc.init_encodec_params(jax.random.PRNGKey(0), causal=False, channels=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3200, 2), jnp.float32) * 0.3
    ref = np.asarray(enc._encoder_fused(params, x, causal=False, interpret=True))

    mesh = data_mesh(jax.devices("cpu")[:8])
    sharded = shard_map(
        lambda p, w: enc._encoder_fused(p, w, causal=False, interpret=True),
        mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,  # pallas_call-bearing body (see pipeline._mesh_wrap)
    )
    out = np.asarray(jax.jit(sharded)(params, x))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out, ref, atol=5e-5 * scale, rtol=0)


def test_gate_typo_rejected(monkeypatch):
    monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "yes-please")
    params = enc.init_encodec_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="FAD_TPU_FUSED_ENCODEC"):
        enc._fused_enabled(params)


def test_precision_typo_rejected(monkeypatch):
    monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC_PRECISION", "high")
    with pytest.raises(ValueError, match="FAD_TPU_FUSED_ENCODEC_PRECISION"):
        enc._fused_precision()


def test_forward_env_gate_routes_interpret(monkeypatch):
    """encodec_forward with FAD_TPU_FUSED_ENCODEC=1 off-TPU runs the fused
    path in interpret mode (full wiring: gate -> _encoder_fused -> LSTM tail)
    and matches the XLA path."""
    monkeypatch.setattr(enc, "_tile_for", lambda T, channels: 64)
    params = enc.init_encodec_params(jax.random.PRNGKey(6), causal=False, channels=2)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 3200), jnp.float32) * 0.3

    monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "0")
    ref = np.asarray(enc.encodec_forward(params, x, causal=False))
    monkeypatch.setenv("FAD_TPU_FUSED_ENCODEC", "1")
    got = np.asarray(enc.encodec_forward(params, x, causal=False))
    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=5e-5 * scale, rtol=0)
