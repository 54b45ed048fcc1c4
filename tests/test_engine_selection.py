"""Engine auto-selection logic, decoupled from the actual backend by
monkeypatching utils.platform.is_tpu_backend — the CPU suite otherwise
never exercises the TPU branches of the resolvers."""

import numpy as np
import pytest

import hmmspikesorter_tpu.utils.platform as plat
from hmmspikesorter_tpu.parallel.overlap_save import (
    resolve_block_engine, resolve_block_engine_mc)


@pytest.fixture
def fake_tpu(monkeypatch):
    monkeypatch.setattr(plat, "is_tpu_backend", lambda: True)
    # v5e-class core: the raised scoped-VMEM ceiling applies
    monkeypatch.setattr(plat, "tpu_vmem_ceiling_bytes",
                        lambda: 64 * 2**20)


def test_resolver_picks_pallas_family_on_tpu(fake_tpu):
    W = 8192 + 512
    assert resolve_block_engine("auto", True, 60, 2, W) == "pallas"
    assert resolve_block_engine("auto", True, 60, 3, W) == "pallas_ovn"
    # raised scoped-VMEM ceiling admits N=4 K=60 (validated on v5e)
    assert resolve_block_engine("auto", True, 60, 4, W) == "pallas_ovn"
    # pathological pair counts stay on the XLA engine
    assert resolve_block_engine("auto", True, 60, 8, W) == "ring"
    # non-overlap topologies have no pallas kernel
    assert resolve_block_engine("auto", False, 60, 2, W) == "ring"


def test_resolver_mc_covers_all_overlap_n(fake_tpu):
    W = 8192 + 512
    for n in (2, 3, 4):
        assert resolve_block_engine_mc("auto", True, 60, n, W) == "pallas_ovn"
    assert resolve_block_engine_mc("auto", False, 60, 3, W) == "ring"
    # W must divide both chunk sizes
    assert resolve_block_engine_mc("auto", True, 60, 3, W + 8) == "ring"


def test_resolver_cpu_never_picks_pallas(monkeypatch):
    monkeypatch.setattr(plat, "is_tpu_backend", lambda: False)
    W = 8192 + 512
    assert resolve_block_engine("auto", True, 60, 2, W) == "ring"
    assert resolve_block_engine_mc("auto", True, 60, 3, W) == "ring"
    with pytest.raises(ValueError):
        resolve_block_engine_mc("pallas", True, 60, 3, W)


def test_forced_pallas_requires_feasibility(fake_tpu):
    with pytest.raises(ValueError):
        # infeasible: W not divisible by the chunk size
        resolve_block_engine_mc("pallas", True, 60, 3, 100)
    # explicit concrete engines pass through untouched; unknown names
    # raise instead of silently decoding with a different engine
    assert resolve_block_engine("ring", True, 60, 2, 100) == "ring"
    with pytest.raises(ValueError, match="unknown block_engine"):
        resolve_block_engine("gather", True, 60, 2, 100)
    with pytest.raises(ValueError, match="pallas_ovn"):
        # forced pallas_ovn off-TPU / bad window must raise, not die in
        # Mosaic lowering
        resolve_block_engine("pallas_ovn", True, 60, 3, 100)


def test_mc_em_auto_vmem_gate(monkeypatch):
    """train_model_mc auto-selection: overlap_pallas only when the
    per-channel accumulators fit VMEM; high channel counts fall back to
    the XLA overlap engine (review finding)."""
    from hmmspikesorter_tpu.ops.pallas_fb_mb import overlap_em_mc_vmem_ok

    v5e = 64 * 2**20
    assert overlap_em_mc_vmem_ok(3, 60, 4, ceiling=v5e)
    assert overlap_em_mc_vmem_ok(3, 60, 32, ceiling=v5e)
    assert not overlap_em_mc_vmem_ok(3, 60, 384, ceiling=v5e)
