"""Driver entry-point mechanics that the full dryrun (driver-run every
round) cannot itself witness: the fused-kernel env gates must be pinned to
the XLA path INSIDE dryrun_multichip and restored afterwards.

Why: if the real TPU backend was initialized before the call (the env
sitecustomize force-sets jax_platforms="axon,cpu", so an entry() compile
first does that), jax.default_backend() stays "tpu" while the dryrun mesh
is CPU devices — the frontends would resolve to their Pallas kernels
per-shard and jax 0.9's shard_map vma lint rejects the trace. Reproduced
and fixed in round 5; the full both-orders drive lives in the session
log, this locks the gate save/restore mechanism cheaply.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft

GATES = ("FAD_TPU_FUSED_FRONTEND", "FAD_TPU_FUSED_ATTN", "FAD_TPU_FUSED_BLOCK")


def test_dryrun_pins_fused_gates_and_restores(monkeypatch):
    seen = {}

    def fake_body(n_devices):
        assert n_devices == 4
        seen.update({k: os.environ.get(k) for k in GATES})

    monkeypatch.setattr(graft, "_dryrun_multichip_body", fake_body)
    # Pre-existing values must be restored verbatim; unset ones must stay unset.
    monkeypatch.setenv("FAD_TPU_FUSED_ATTN", "1")
    monkeypatch.delenv("FAD_TPU_FUSED_FRONTEND", raising=False)
    monkeypatch.delenv("FAD_TPU_FUSED_BLOCK", raising=False)

    graft.dryrun_multichip(4)

    assert seen == {k: "0" for k in GATES}, seen
    assert os.environ.get("FAD_TPU_FUSED_ATTN") == "1"
    assert "FAD_TPU_FUSED_FRONTEND" not in os.environ
    assert "FAD_TPU_FUSED_BLOCK" not in os.environ


def test_dryrun_restores_gates_on_body_failure(monkeypatch):
    def boom(n_devices):
        raise RuntimeError("synthetic dryrun failure")

    monkeypatch.setattr(graft, "_dryrun_multichip_body", boom)
    monkeypatch.setenv("FAD_TPU_FUSED_BLOCK", "1")
    try:
        graft.dryrun_multichip(4)
    except RuntimeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected the synthetic failure to propagate")
    assert os.environ.get("FAD_TPU_FUSED_BLOCK") == "1"
    assert "FAD_TPU_FUSED_FRONTEND" not in os.environ
