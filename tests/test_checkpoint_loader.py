"""OpenAI checkpoint loader coverage: every branch of
``load_openai_checkpoint`` (reference model/openai.py:17-136) exercised on
synthetic archives in the real on-disk formats —

* a TorchScript (torch.jit) archive, the format of the published
  ViT-L-14-336px.pt (reference model/openai.py:58-65 tries jit first),
* a raw state-dict ``torch.save``,
* a ``{"state_dict": ...}``-wrapped dict,

plus the fp16-storage path (OpenAI jit archives store fp16 weights; the
converter must emit fp32, reference model/model.py:265-309 converts the
rebuilt model to fp32).
"""

import math

import numpy as np
import jax
import pytest
import torch

from aaclip_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
from aaclip_tpu.core.params import (
    convert_openai_state_dict,
    create_clip_params,
    load_openai_checkpoint,
)
from tests.test_model_parity import _make_state_dict

CFG = CLIPConfig(
    vision=VisionConfig(image_size=42, native_image_size=42, patch_size=14,
                        width=48, layers=3, heads=4, output_dim=24),
    text=TextConfig(context_length=12, vocab_size=100, width=24, heads=4,
                    layers=2, output_dim=24),
    embed_dim=24,
)


def _build_jit_archive(sd: dict, path: str, half: bool = False) -> None:
    """Assemble a scriptable torch module whose state_dict reproduces the
    OpenAI key layout exactly, then save it as a TorchScript archive."""

    class Leaf(torch.nn.Module):
        def forward(self):  # pragma: no cover - required by torch.jit.script
            return torch.zeros(1)

    root = Leaf()
    for key, value in sd.items():
        parts = key.split(".")
        mod = root
        for part in parts[:-1]:
            child = getattr(mod, part, None)
            if child is None:
                child = Leaf()
                mod.add_module(part, child)
            mod = child
        v = value.half() if half and value.is_floating_point() else value
        mod.register_parameter(parts[-1], torch.nn.Parameter(v))

    scripted = torch.jit.script(root)
    # the archive's state_dict must round-trip the exact key set
    assert set(scripted.state_dict().keys()) == set(sd.keys())
    torch.jit.save(scripted, path)


def _assert_tree_equal(got: dict, want: dict, atol=0.0):
    gl, wl = jax.tree.leaves(got), jax.tree.leaves(want)
    assert len(gl) == len(wl)
    for g, w in zip(gl, wl):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=atol)


@pytest.fixture(scope="module")
def sd():
    return _make_state_dict(CFG, seed=3)


def test_discovered_checkpoint_arch_mismatch_falls_back(sd, tmp_path_factory,
                                                        monkeypatch):
    """An implicitly DISCOVERED default checkpoint (AACLIP_CKPT / bundled)
    is used only when its architecture matches the config: e.g. the
    multichip dryrun builds tiny-test and must not crash converting real
    ViT-L weights on a rig that has them (round-3 review finding).
    Explicit checkpoint= still loads-or-fails."""
    import dataclasses

    from aaclip_tpu.core.params import checkpoint_matches_config

    assert checkpoint_matches_config(sd, CFG)
    other = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, width=32, layers=2))
    assert not checkpoint_matches_config(sd, other)

    path = str(tmp_path_factory.mktemp("ckpt") / "weights.pt")
    torch.save(sd, path)
    monkeypatch.setenv("AACLIP_CKPT", path)
    # mismatched config: silently random-inits instead of crashing
    params = create_clip_params(other, seed=0)
    assert params["visual"]["conv1"]["w"].shape[-1] == 32
    # matching config: the discovered checkpoint IS loaded
    params = create_clip_params(CFG, seed=0)
    np.testing.assert_allclose(
        np.asarray(params["visual"]["class_embedding"]),
        sd["visual.class_embedding"].numpy(), atol=1e-6)
    # explicit checkpoint with a mismatched config still fails loudly
    with pytest.raises(Exception):
        create_clip_params(other, checkpoint=path)


def test_torchscript_archive_branch(sd, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "model_jit.pt")
    _build_jit_archive(sd, path)
    got = load_openai_checkpoint(path, CFG)
    want = convert_openai_state_dict(sd, CFG)
    _assert_tree_equal(got, want)
    # and the high-level entry point consumes it
    params = create_clip_params(CFG, checkpoint=path)
    assert float(params["logit_scale"]) == pytest.approx(math.log(1 / 0.07))


def test_torchscript_fp16_archive_loads_as_fp32(sd, tmp_path_factory):
    """OpenAI's published jit archives store fp16 weights; the loader must
    hand back fp32 arrays whose values match the fp16-rounded originals."""
    path = str(tmp_path_factory.mktemp("ckpt") / "model_jit_fp16.pt")
    _build_jit_archive(sd, path, half=True)
    got = load_openai_checkpoint(path, CFG)
    for leaf in jax.tree.leaves(got):
        assert np.asarray(leaf).dtype == np.float32
    sd_halved = {k: (v.half().float() if v.is_floating_point() else v)
                 for k, v in sd.items()}
    _assert_tree_equal(got, convert_openai_state_dict(sd_halved, CFG))


def test_raw_state_dict_branch(sd, tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    raw = str(d / "raw.pt")
    wrapped = str(d / "wrapped.pt")
    torch.save(sd, raw)
    torch.save({"state_dict": sd}, wrapped)
    want = convert_openai_state_dict(sd, CFG)
    _assert_tree_equal(load_openai_checkpoint(raw, CFG), want)
    _assert_tree_equal(load_openai_checkpoint(wrapped, CFG), want)


def test_pos_embed_resized_on_load(sd, tmp_path_factory):
    """Loading at a larger img_size resizes the visual positional embedding
    to the new grid (reference clip.py:112,131 + model.py:395-426)."""
    import dataclasses

    path = str(tmp_path_factory.mktemp("ckpt") / "model_jit.pt")
    _build_jit_archive(sd, path)
    cfg_big = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, image_size=70))
    got = load_openai_checkpoint(path, cfg_big)
    grid = cfg_big.vision.grid
    assert got["visual"]["positional_embedding"].shape == (
        grid * grid + 1, CFG.vision.width)


def test_resolve_clip_checkpoint_reports_effective_path(sd, tmp_path_factory,
                                                        monkeypatch):
    """resolve_clip_checkpoint returns what create_clip_params will load —
    including an implicitly DISCOVERED checkpoint — so provenance-keyed
    caches (the serving anchor cache) cannot key 'random init' while real
    weights are silently in use (round-3 review finding)."""
    import dataclasses

    from aaclip_tpu.core.params import resolve_clip_checkpoint

    monkeypatch.delenv("AACLIP_CKPT", raising=False)
    path = str(tmp_path_factory.mktemp("ckpt") / "weights.pt")
    torch.save(sd, path)

    # explicit checkpoint: returned as-is, no arch gate
    assert resolve_clip_checkpoint(CFG, path) == path
    other = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, width=32, layers=2))
    assert resolve_clip_checkpoint(other, path) == path

    # discovery: matching arch resolves, mismatched falls back to None
    monkeypatch.setenv("AACLIP_CKPT", path)
    assert resolve_clip_checkpoint(CFG) == path
    assert resolve_clip_checkpoint(other) is None
